// From-scratch RFC 8878 zstandard streaming decoder -- makes the
// built-in frontend a STOCK-protocol client for the server's default
// waterfall stream (reference browsers use an emscripten'd libzstd,
// jsdsp/src/libzstd.js:1-84; this is ~500 lines of plain JS instead).
//
// Structural mirror of tests/zstd_mirror.py, which is empirically
// validated against libzstd in tests/test_zstd_mirror.py (this image
// has no JS runtime).  Keep the two in lockstep.
//
// Scope: decompression only, no dictionaries, xxh64 checksums skipped.
"use strict";

class ZstdError extends Error {}

// ------------------------------------------------------------ bitstreams

class BackwardBits {
  // zstd FSE/Huffman bitstream: bytes written LSB-first, read from the
  // END; the last byte's highest set bit is a padding marker.  Reads
  // past the start zero-fill and raise the overflow flag.
  constructor(d, start, end) {
    if (end <= start) throw new ZstdError("empty bitstream");
    const last = d[end - 1];
    if (last === 0) throw new ZstdError("bitstream has no padding marker");
    this.d = d;
    this.start = start;
    this.bitpos = (end - start - 1) * 8 + (32 - Math.clz32(last)) - 1;
    this.overflow = false;
  }
  read(n) {
    this.bitpos -= n;
    const p = this.bitpos;
    if (p < 0) this.overflow = true;
    let v = 0;
    for (let i = 0; i < n; i++) {
      const b = p + i;
      if (b >= 0 && (this.d[this.start + (b >> 3)] >> (b & 7)) & 1)
        v += Math.pow(2, i);  // n can reach 31 (raw offsets): stay exact
    }
    return v;
  }
  peek(n) {
    const save = this.bitpos, saveOv = this.overflow;
    const v = this.read(n);
    this.bitpos = save;
    this.overflow = saveOv;  // never ERASE a prior overflow: it is the
    return v;                // FSE termination signal
  }
}

class ForwardBits {
  // LSB-first forward bit reader (FSE table descriptions).
  constructor(d, pos) { this.d = d; this.bit = pos * 8; }
  read(n) {
    let v = 0;
    for (let i = 0; i < n; i++) {
      const b = this.bit + i;
      if ((this.d[b >> 3] >> (b & 7)) & 1) v |= 1 << i;
    }
    this.bit += n;
    return v;
  }
  rewind(n) { this.bit -= n; }
  bytepos() { return (this.bit + 7) >> 3; }
}

const bitLength = (x) => (x === 0 ? 0 : 32 - Math.clz32(x));

// ------------------------------------------------------------------- FSE

function fseBuild(counts, al) {
  // Decoding table from normalized counts (RFC 8878 4.1.1): -1
  // probabilities get one cell each at the table's end; positive
  // probabilities spread with the (size/2 + size/8 + 3) step.
  const size = 1 << al;
  const sym = new Uint8Array(size);
  let high = size - 1;
  const stateDesc = new Uint16Array(counts.length);
  for (let s = 0; s < counts.length; s++) {
    if (counts[s] === -1) { sym[high--] = s; stateDesc[s] = 1; }
    else if (counts[s] > 0) stateDesc[s] = counts[s];
  }
  const step = (size >> 1) + (size >> 3) + 3;
  const mask = size - 1;
  let pos = 0;
  for (let s = 0; s < counts.length; s++) {
    if (counts[s] <= 0) continue;
    for (let k = 0; k < counts[s]; k++) {
      sym[pos] = s;
      pos = (pos + step) & mask;
      while (pos > high) pos = (pos + step) & mask;
    }
  }
  if (pos !== 0) throw new ZstdError("corrupt FSE spread");
  const nbits = new Uint8Array(size);
  const base = new Int32Array(size);
  for (let i = 0; i < size; i++) {
    const x = stateDesc[sym[i]]++;
    const nb = al - (bitLength(x) - 1);
    nbits[i] = nb;
    base[i] = (x << nb) - size;
  }
  return { sym, nbits, base };
}

function fseReadCounts(fb, maxSymbols, maxAl) {
  // Normalized-count header (forward bits, byte-aligned at the end).
  const al = fb.read(4) + 5;
  if (al > maxAl) throw new ZstdError("FSE accuracy " + al + " > " + maxAl);
  let remaining = (1 << al) + 1;
  const counts = [];
  while (remaining > 1 && counts.length <= maxSymbols) {
    const bits = bitLength(remaining);
    let val = fb.read(bits);
    const lowMask = (1 << (bits - 1)) - 1;
    const threshold = (1 << bits) - 1 - remaining;
    if ((val & lowMask) < threshold) { fb.rewind(1); val &= lowMask; }
    else if (val > lowMask) val -= threshold;
    const proba = val - 1;
    counts.push(proba);
    remaining -= proba < 0 ? 1 : proba;
    if (proba === 0) {
      let rep = fb.read(2);
      while (rep === 3) { counts.push(0, 0, 0); rep = fb.read(2); }
      for (let k = 0; k < rep; k++) counts.push(0);
    }
  }
  if (remaining !== 1) throw new ZstdError("corrupt FSE counts");
  // The zero-repeat loop can overshoot the loop-entry bound; truncated
  // inputs would otherwise read undefined bytes -> NaN downstream
  // (the Python mirror raises here too).
  if (counts.length > maxSymbols + 1)
    throw new ZstdError("FSE counts for " + counts.length +
      " symbols > " + (maxSymbols + 1));
  fb.bit = fb.bytepos() * 8;  // descriptions end byte-aligned
  return { counts, al };
}

class FseDecoder {
  // One FSE state over a prebuilt table (or a 0-bit RLE "table").
  constructor(table, al) { this.t = table; this.al = al; this.state = 0; }
  static rle(symbol) {
    return new FseDecoder(
      { sym: [symbol], nbits: [0], base: [0] }, 0);
  }
  init(bb) { this.state = bb.read(this.al); }
  symbol() { return this.t.sym[this.state]; }
  update(bb) {
    this.state = this.t.base[this.state] + bb.read(this.t.nbits[this.state]);
  }
}

// --------------------------------------------------------------- Huffman

function hufReadWeights(d, pos, end) {
  // Huffman tree description (RFC 8878 4.2.1): direct 4-bit weights
  // (header >= 128) or FSE-compressed weights decoded by two
  // interleaved states.  Returns {weights, consumed}.
  const hb = d[pos];
  if (hb >= 128) {
    const n = hb - 127;
    if (pos + 1 + ((n + 1) >> 1) > end)  // same bound the FSE path has
      throw new ZstdError("truncated huffman description");
    const weights = [];
    for (let i = 0; i < n; i++) {
      const b = d[pos + 1 + (i >> 1)];
      weights.push((i & 1) === 0 ? b >> 4 : b & 15);
    }
    return { weights, consumed: 1 + ((n + 1) >> 1) };
  }
  if (pos + 1 + hb > end) throw new ZstdError("truncated huffman description");
  const fb = new ForwardBits(d, pos + 1);
  const { counts, al } = fseReadCounts(fb, 255, 6);
  const table = fseBuild(counts, al);
  const s1 = new FseDecoder(table, al);
  const s2 = new FseDecoder(table, al);
  const bb = new BackwardBits(d, fb.bytepos(), pos + 1 + hb);
  s1.init(bb);
  s2.init(bb);
  const weights = [];
  for (;;) {
    weights.push(s1.symbol());
    s1.update(bb);
    if (bb.overflow) { weights.push(s2.symbol()); break; }
    weights.push(s2.symbol());
    s2.update(bb);
    if (bb.overflow) { weights.push(s1.symbol()); break; }
    if (weights.length > 255) throw new ZstdError("too many huffman weights");
  }
  // the break paths can push past the in-loop guard (up to 256): with
  // 256 explicit + 1 implicit weights, hufBuild's Uint8Array would
  // WRAP symbol 256 to 0 and decode silent garbage
  if (weights.length > 255) throw new ZstdError("too many huffman weights");
  return { weights, consumed: 1 + hb };
}

function hufBuild(weights) {
  // Canonical Huffman decode table from explicit weights plus the
  // implicit last one.  Returns {sym, nb, maxBits}.
  let total = 0;
  for (const w of weights) {
    if (w > 12) throw new ZstdError("huffman weight > 12");
    if (w > 0) total += 1 << (w - 1);
  }
  if (total === 0) throw new ZstdError("empty huffman table");
  const maxBits = bitLength(total);
  const left = (1 << maxBits) - total;
  if (left & (left - 1)) throw new ZstdError("corrupt huffman weights");
  weights = weights.concat([bitLength(left)]);
  const size = 1 << maxBits;
  const bits = weights.map((w) => (w > 0 ? maxBits + 1 - w : 0));
  const rankCount = new Uint16Array(maxBits + 1);
  for (const b of bits) rankCount[b]++;
  const rankIdx = new Uint32Array(maxBits + 2);
  for (let b = maxBits; b >= 1; b--)
    rankIdx[b - 1] = rankIdx[b] + rankCount[b] * (1 << (maxBits - b));
  const sym = new Uint8Array(size);
  const nb = new Uint8Array(size);
  for (let s = 0; s < bits.length; s++) {
    if (bits[s] === 0) continue;
    const code = rankIdx[bits[s]];
    const span = 1 << (maxBits - bits[s]);
    for (let i = code; i < code + span; i++) { sym[i] = s; nb[i] = bits[s]; }
    rankIdx[bits[s]] = code + span;
  }
  return { sym, nb, maxBits };
}

function hufDecodeStream(table, d, start, end, count, out) {
  // Decode exactly `count` literals from one backward stream.
  const bb = new BackwardBits(d, start, end);
  for (let k = 0; k < count; k++) {
    const idx = bb.peek(table.maxBits);
    const n = table.nb[idx];
    if (n === 0 || n > bb.bitpos) throw new ZstdError("corrupt huffman stream");
    bb.bitpos -= n;
    out.push(table.sym[idx]);
  }
  if (bb.bitpos !== 0)
    throw new ZstdError("huffman stream not fully consumed");
}

// -------------------------------------------- sequence code tables (RFC)

const LL_BASE = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
  16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
  4096, 8192, 16384, 32768, 65536];
const LL_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16];
const ML_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
  19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
  35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
  4099, 8195, 16387, 32771, 65539];
const ML_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16];

const LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
  2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1];
const ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1];
const OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1];

const SEQ_SPEC = {
  ll: { maxSym: 35, maxAl: 9, predef: [fseBuild(LL_DEFAULT, 6), 6] },
  of: { maxSym: 31, maxAl: 8, predef: [fseBuild(OF_DEFAULT, 5), 5] },
  ml: { maxSym: 52, maxAl: 9, predef: [fseBuild(ML_DEFAULT, 6), 6] },
};

// --------------------------------------------------------------- decoder

class ZstdStream {
  // Streaming zstd decoder: push() raw wire bytes in (arbitrary
  // chunking), get decompressed bytes (Uint8Array) out.
  constructor() {
    this.buf = new Uint8Array(0);
    this.inFrame = false;
    this.needChecksum = false;
    this.checksumFlag = false;
    this.windowSize = 0;
    this.hist = [];  // recent output bytes (plain array, trimmed)
    this.rep = [1, 4, 8];
    this.hufTable = null;
    this.fsePrev = { ll: null, of: null, ml: null };
  }

  push(chunk) {
    const merged = new Uint8Array(this.buf.length + chunk.length);
    merged.set(this.buf);
    merged.set(chunk, this.buf.length);
    this.buf = merged;
    const out = [];
    for (;;) {
      if (this.needChecksum) {
        if (this.buf.length < 4) break;
        this.buf = this.buf.subarray(4);  // xxh64 low 32 bits: skipped
        this.needChecksum = false;
      }
      if (!this.inFrame) {
        if (!this._frameHeader()) break;
        continue;  // a skippable frame leaves inFrame false
      }
      if (!this._block(out)) break;
    }
    return Uint8Array.from(out);
  }

  _le(b, p, n) {
    let v = 0;
    for (let i = n - 1; i >= 0; i--) v = v * 256 + b[p + i];
    return v;
  }

  _frameHeader() {
    const b = this.buf;
    if (b.length < 4) return false;
    const magic = this._le(b, 0, 4);
    if ((magic & 0xfffffff0) === 0x184d2a50) {  // skippable frame
      if (b.length < 8) return false;
      const size = this._le(b, 4, 4);
      if (size > 1 << 20)  // corrupt header would buffer up to 4 GB
        throw new ZstdError("skippable frame too large");
      if (b.length < 8 + size) return false;
      this.buf = b.subarray(8 + size);
      return true;
    }
    if (magic !== 0xFD2FB528) throw new ZstdError("bad magic " + magic);
    if (b.length < 6) return false;
    const fhd = b[4];
    if (fhd & 8) throw new ZstdError("reserved FHD bit set");
    const singleSeg = (fhd >> 5) & 1;
    const dictBytes = [0, 1, 2, 4][fhd & 3];
    const fcsBytes = [singleSeg ? 1 : 0, 2, 4, 8][fhd >> 6];
    let p = 5;
    if (b.length < p + (singleSeg ? 0 : 1) + dictBytes + fcsBytes)
      return false;
    let window = null;
    if (!singleSeg) {
      const wd = b[p++];
      const base = 1 << (10 + (wd >> 3));
      window = base + (base >> 3) * (wd & 7);
    }
    if (dictBytes) {
      if (this._le(b, p, dictBytes))
        throw new ZstdError("dictionaries not supported");
      p += dictBytes;
    }
    if (fcsBytes) {
      let fcs = this._le(b, p, fcsBytes);
      if (fcsBytes === 2) fcs += 256;
      p += fcsBytes;
      if (window === null) window = fcs;
    }
    this.buf = b.subarray(p);
    this.inFrame = true;
    this.checksumFlag = ((fhd >> 2) & 1) !== 0;
    this.windowSize = Math.min(window === null ? 0 : window, 1 << 27);
    this.rep = [1, 4, 8];
    this.hufTable = null;
    this.fsePrev = { ll: null, of: null, ml: null };
    return true;
  }

  _block(out) {
    const b = this.buf;
    if (b.length < 3) return false;
    const h = this._le(b, 0, 3);
    const last = h & 1;
    const btype = (h >> 1) & 3;
    const bsize = h >> 3;
    if (btype !== 0 && bsize > 1 << 17)
      // Block_Maximum_Size: regenerated size <= 128 kB (raw blocks
      // are bounded by the wire bytes themselves)
      throw new ZstdError("block size exceeds 128 kB");
    const body = btype === 1 ? 1 : bsize;
    if (b.length < 3 + body) return false;
    let dec;
    if (btype === 0) dec = Array.from(b.subarray(3, 3 + bsize));
    else if (btype === 1) dec = new Array(bsize).fill(b[3]);
    else if (btype === 2) {
      try {
        dec = this._compressedBlock(b, 3, 3 + bsize);
      } catch (e) {
        // corrupt lengths walking off the block: surface every parse
        // failure as ZstdError (fuzz-pinned via the Python mirror)
        if (e instanceof ZstdError) throw e;
        throw new ZstdError("corrupt block (" + e + ")");
      }
    } else throw new ZstdError("reserved block type");
    for (const x of dec) { out.push(x); this.hist.push(x); }
    if (this.windowSize && this.hist.length > 2 * this.windowSize)
      this.hist = this.hist.slice(this.hist.length - this.windowSize);
    this.buf = b.subarray(3 + body);
    if (last) {
      this.inFrame = false;
      this.needChecksum = this.checksumFlag;
    }
    return true;
  }

  _compressedBlock(d, p, end) {
    const { lits, next } = this._literals(d, p, end);
    return this._sequences(d, next, end, lits);
  }

  _literals(d, p, end) {
    const b0 = d[p];
    const ltype = b0 & 3;
    const sf = (b0 >> 2) & 3;
    let rs, cs;
    if (ltype <= 1) {  // Raw / RLE literals
      if ((sf & 1) === 0) { rs = b0 >> 3; p += 1; }
      else if (sf === 1) { rs = (b0 >> 4) | (d[p + 1] << 4); p += 2; }
      else { rs = (b0 >> 4) | (d[p + 1] << 4) | (d[p + 2] << 12); p += 3; }
      if (rs > 1 << 17)  // > Block_Maximum_Size: corrupt (output cap)
        throw new ZstdError("literal size too large");
      if (ltype === 0) {
        if (p + rs > end)  // would consume the NEXT block's bytes
          throw new ZstdError("raw literals overrun block");
        return { lits: Array.from(d.subarray(p, p + rs)), next: p + rs };
      }
      if (p >= end) throw new ZstdError("RLE literal byte missing");
      return { lits: new Array(rs).fill(d[p]), next: p + 1 };
    }
    // Compressed (2) / Treeless (3)
    if (sf === 0 || sf === 1) {
      rs = (b0 >> 4) | ((d[p + 1] & 0x3f) << 4);
      cs = (d[p + 1] >> 6) | (d[p + 2] << 2);
      p += 3;
    } else if (sf === 2) {
      rs = (b0 >> 4) | (d[p + 1] << 4) | ((d[p + 2] & 3) << 12);
      cs = (d[p + 2] >> 2) | (d[p + 3] << 6);
      p += 4;
    } else {
      rs = (b0 >> 4) | (d[p + 1] << 4) | ((d[p + 2] & 0x3f) << 12);
      cs = (d[p + 2] >> 6) | (d[p + 3] << 2) | (d[p + 4] << 10);
      p += 5;
    }
    // RFC 8878 3.1.1.3.1.2: Size_Format 00 = ONE stream for BOTH
    // Compressed and Treeless literals (libzstd emits treeless
    // single-stream whenever it reuses a tree on a <256 B section).
    const streams = sf === 0 ? 1 : 4;
    if (rs > 1 << 17)  // > Block_Maximum_Size: corrupt (output cap)
      throw new ZstdError("literal size too large");
    const cend = p + cs;
    if (cend > end) throw new ZstdError("literals overrun block");
    if (ltype === 2) {
      const { weights, consumed } = hufReadWeights(d, p, cend);
      this.hufTable = hufBuild(weights);
      p += consumed;
    } else if (this.hufTable === null)
      throw new ZstdError("treeless literals with no previous table");
    const lits = [];
    if (streams === 1) hufDecodeStream(this.hufTable, d, p, cend, rs, lits);
    else {
      const s1 = this._le(d, p, 2), s2 = this._le(d, p + 2, 2),
        s3 = this._le(d, p + 4, 2);
      const starts = [p + 6, p + 6 + s1, p + 6 + s1 + s2,
        p + 6 + s1 + s2 + s3];
      const ends = [starts[1], starts[2], starts[3], cend];
      const n = (rs + 3) >> 2;
      const counts = [n, n, n, rs - 3 * n];
      if (counts[3] < 0 || ends[2] > cend)
        throw new ZstdError("corrupt 4-stream literals");
      for (let i = 0; i < 4; i++)
        hufDecodeStream(this.hufTable, d, starts[i], ends[i], counts[i],
          lits);
    }
    return { lits, next: cend };
  }

  _seqTable(d, p, kind, modes) {
    // One of the three sequence FSE tables; returns [decoder, p].
    const spec = SEQ_SPEC[kind];
    const mode = modes[kind];
    let dec;
    if (mode === 0) dec = new FseDecoder(spec.predef[0], spec.predef[1]);
    else if (mode === 1) {
      const sym = d[p++];
      if (sym > spec.maxSym)
        throw new ZstdError("RLE " + kind + " symbol too large");
      dec = FseDecoder.rle(sym);
    } else if (mode === 2) {
      const fb = new ForwardBits(d, p);
      const { counts, al } = fseReadCounts(fb, spec.maxSym, spec.maxAl);
      dec = new FseDecoder(fseBuild(counts, al), al);
      p = fb.bytepos();
    } else {
      const prev = this.fsePrev[kind];
      if (prev === null)
        throw new ZstdError("repeat " + kind + " table with no previous");
      dec = new FseDecoder(prev.t, prev.al);
    }
    this.fsePrev[kind] = dec;
    return [dec, p];
  }

  _sequences(d, p, end, lits) {
    const nb = d[p];
    if (nb === 0) {
      if (p + 1 !== end)
        throw new ZstdError("trailing bytes after empty sequences");
      return lits;
    }
    let nseq;
    if (nb < 128) { nseq = nb; p += 1; }
    else if (nb < 255) { nseq = ((nb - 128) << 8) + d[p + 1]; p += 2; }
    else { nseq = d[p + 1] + (d[p + 2] << 8) + 0x7f00; p += 3; }
    const m = d[p++];
    if (m & 3) throw new ZstdError("reserved sequence mode bits set");
    const modes = { ll: (m >> 6) & 3, of: (m >> 4) & 3, ml: (m >> 2) & 3 };
    let ll, of, ml;
    [ll, p] = this._seqTable(d, p, "ll", modes);
    [of, p] = this._seqTable(d, p, "of", modes);
    [ml, p] = this._seqTable(d, p, "ml", modes);
    const bb = new BackwardBits(d, p, end);
    ll.init(bb);
    of.init(bb);
    ml.init(bb);
    const out = [];
    const hist = this.hist;
    const hlen = hist.length;
    let lpos = 0;
    const rep = this.rep;
    for (let i = 0; i < nseq; i++) {
      const ofcode = of.symbol();
      if (!(ofcode <= 31)) throw new ZstdError("offset code " + ofcode);
      const ov = Math.pow(2, ofcode) + bb.read(ofcode);
      const mlcode = ml.symbol();
      if (!(mlcode < 53)) throw new ZstdError("match-length code " + mlcode);
      const mlen = ML_BASE[mlcode] + bb.read(ML_BITS[mlcode]);
      const llcode = ll.symbol();
      if (!(llcode < 36)) throw new ZstdError("literal-length code " + llcode);
      const llen = LL_BASE[llcode] + bb.read(LL_BITS[llcode]);
      if (bb.overflow) throw new ZstdError("sequence bitstream overrun");
      let off;
      if (ov > 3) {
        off = ov - 3;
        rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = off;
      } else {
        const j = ov + (llen === 0 ? 1 : 0);
        if (j === 1) off = rep[0];
        else if (j === 2) { off = rep[1]; rep[1] = rep[0]; rep[0] = off; }
        else if (j === 3) {
          off = rep[2]; rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = off;
        } else {
          off = rep[0] - 1;
          if (off === 0) throw new ZstdError("repeat offset underflow");
          rep[2] = rep[1]; rep[1] = rep[0]; rep[0] = off;
        }
      }
      if (lpos + llen > lits.length) throw new ZstdError("literals overrun");
      if (out.length + llen + mlen > 1 << 17)  // zstd block max 128 kB
        throw new ZstdError("block output exceeds 128 kB");
      for (let k = 0; k < llen; k++) out.push(lits[lpos + k]);
      lpos += llen;
      if (off > hlen + out.length)
        throw new ZstdError("match offset beyond window");
      for (let k = 0; k < mlen; k++) {  // byte-wise: overlap is the point
        const idx = out.length - off;
        out.push(idx >= 0 ? out[idx] : hist[hlen + idx]);
      }
      if (i + 1 < nseq) { ll.update(bb); ml.update(bb); of.update(bb); }
    }
    if (bb.bitpos !== 0)
      throw new ZstdError("sequence bitstream not fully consumed");
    for (let k = lpos; k < lits.length; k++) out.push(lits[k]);
    return out;
  }
}
