/* Streaming decoder for the FLAC subset csrc/flac.cpp emits: 16-bit
   constant / fixed-predictor (orders 0-4) / LPC (orders 1-8)
   subframes, rice partitions of any order, mono or stereo with
   per-frame decorrelation (independent / left-side / right-side /
   mid-side).  JS port of the from-spec decoder in tests/test_codecs.py,
   made incremental: push() consumes whole frames greedily and keeps a
   partial tail for the next packet (per-hop CBOR payloads always
   carry whole frames, but the stream header and any coalesced packets
   may straddle). */
"use strict";

class FlacOverrun extends Error {}

class FlacBitReader {
  constructor(d, byteStart) { this.d = d; this.pos = byteStart * 8; }
  bits(n) {
    let v = 0;
    for (let i = 0; i < n; i++) {
      const bi = this.pos >> 3;
      if (bi >= this.d.length) throw new FlacOverrun();
      v = v * 2 + ((this.d[bi] >> (7 - (this.pos & 7))) & 1);
      this.pos++;
    }
    return v;
  }
  unary() {
    let q = 0;
    while (this.bits(1) === 0) q++;
    return q;
  }
  align() { this.pos = (this.pos + 7) & ~7; }
}

function flacSigned(v, bits) {
  return v >= 1 << (bits - 1) ? v - (1 << bits) : v;
}

// CRC-8 (poly 0x07) and CRC-16 (poly 0x8005) per RFC 9639 9.1.1 --
// verified like the Python lockstep decoder (tests/test_codecs.py):
// a corrupted frame must trip the contained error path, not play as
// loud garbage PCM.
function flacCrcTable(poly, width) {
  const top = 1 << (width - 1), mask = (width === 16 ? 0xffff : 0xff);
  const tab = new Array(256);
  for (let b = 0; b < 256; b++) {
    let crc = b << (width - 8);
    for (let i = 0; i < 8; i++)
      crc = crc & top ? ((crc << 1) ^ poly) : (crc << 1);
    tab[b] = crc & mask;
  }
  return tab;
}
const FLAC_CRC8_TAB = flacCrcTable(0x07, 8);
const FLAC_CRC16_TAB = flacCrcTable(0x8005, 16);

function flacCrc8(d, start, end) {
  let c = 0;
  for (let i = start; i < end; i++) c = FLAC_CRC8_TAB[c ^ d[i]];
  return c;
}

function flacCrc16(d, start, end) {
  let c = 0;
  for (let i = start; i < end; i++)
    c = (FLAC_CRC16_TAB[((c >> 8) ^ d[i]) & 0xff] ^ (c << 8)) & 0xffff;
  return c;
}

const FLAC_FIXED_COEF = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]];

function flacSubframe(br, n, bps) {
  // bps = 17 for the side channel of a stereo-decorrelated frame
  if (br.bits(1) !== 0) throw new Error("flac: bad subframe pad");
  const sub = br.bits(6);
  if (br.bits(1) !== 0) throw new Error("flac: wasted bits unsupported");
  const x = new Int32Array(n);
  if (sub === 0) {                             // CONSTANT
    x.fill(flacSigned(br.bits(bps), bps));
    return x;
  }
  if (sub === 1) {                             // VERBATIM
    for (let i = 0; i < n; i++) x[i] = flacSigned(br.bits(bps), bps);
    return x;
  }
  let order, coef, shift;
  if (sub >> 3 === 1) {                        // FIXED
    order = sub & 7;
    for (let i = 0; i < order; i++) x[i] = flacSigned(br.bits(bps), bps);
    coef = FLAC_FIXED_COEF[order];
    shift = 0;
  } else if (sub & 0x20) {                     // LPC
    order = (sub & 0x1f) + 1;
    for (let i = 0; i < order; i++) x[i] = flacSigned(br.bits(bps), bps);
    const precision = br.bits(4) + 1;
    if (precision === 16) throw new Error("flac: invalid qlp precision");
    shift = br.bits(5);
    coef = new Int32Array(order);
    for (let j = 0; j < order; j++)
      coef[j] = flacSigned(br.bits(precision), precision);
  } else throw new Error("flac: unknown subframe type " + sub);
  if (br.bits(2) !== 0) throw new Error("flac: non-rice residual");
  const po = br.bits(4);
  const psize = n >> po;
  const div = Math.pow(2, shift);
  let i = order;
  for (let part = 0; part < 1 << po; part++) {
    const k = br.bits(4);
    if (k === 15) throw new Error("flac: escape code unsupported");
    const stop = (part + 1) * psize;
    for (; i < stop; i++) {
      const q = br.unary();
      const low = k ? br.bits(k) : 0;
      const u = q * (1 << k) + low;
      const r = (u >> 1) ^ -(u & 1);
      let pred = 0;
      for (let j = 0; j < coef.length; j++) pred += coef[j] * x[i - 1 - j];
      // Math.floor(p / 2^s) == arithmetic >> for negatives, without
      // the 32-bit truncation of JS bitwise ops (15-bit coefs * 16-bit
      // samples * order 8 exceeds 2^31)
      x[i] = r + Math.floor(pred / div);
    }
  }
  return x;
}

function flacUndecorrelate(chan, subs) {
  // channel assignment 8/9/10 -> [left, right] (RFC 9639 4.1)
  const [a, b] = subs;
  const n = a.length;
  const left = new Int32Array(n), right = new Int32Array(n);
  for (let i = 0; i < n; i++) {
    if (chan === 8) {        // left-side: b = left - right
      left[i] = a[i]; right[i] = a[i] - b[i];
    } else if (chan === 9) { // right-side: a = left - right
      right[i] = b[i]; left[i] = b[i] + a[i];
    } else {                 // mid-side
      let m = (a[i] << 1) | (b[i] & 1);
      left[i] = (m + b[i]) >> 1; right[i] = (m - b[i]) >> 1;
    }
  }
  return [left, right];
}

class FlacStream {
  constructor() {
    this.buf = new Uint8Array(0);
    this.gotHeader = false;
    this.sampleRate = 0;
    this.channels = 1;
  }

  _append(chunk) {
    const merged = new Uint8Array(this.buf.length + chunk.length);
    merged.set(this.buf); merged.set(chunk, this.buf.length);
    this.buf = merged;
  }

  _header() {
    const b = this.buf;
    if (b.length < 4) return false;
    if (!(b[0] === 0x66 && b[1] === 0x4c && b[2] === 0x61 && b[3] === 0x43))
      throw new Error("flac: bad stream marker");
    let p = 4;
    for (;;) {
      if (p + 4 > b.length) return false;
      const last = b[p] & 0x80;
      const size = (b[p + 1] << 16) | (b[p + 2] << 8) | b[p + 3];
      if (p + 4 + size > b.length) return false;
      p += 4 + size;
      if (last) break;
    }
    this.buf = b.slice(p);
    this.gotHeader = true;
    return true;
  }

  _frame(off) {
    const br = new FlacBitReader(this.buf, off);
    if (br.bits(14) !== 0x3ffe) throw new Error("flac: lost sync");
    br.bits(2);                       // reserved + blocking strategy
    const bsCode = br.bits(4);
    const srCode = br.bits(4);
    const chan = br.bits(4);
    if (chan > 1 && !(chan >= 8 && chan <= 10))
      throw new Error("flac: channel mode " + chan);
    const channels = chan === 0 ? 1 : 2;
    if (br.bits(3) !== 4) throw new Error("flac: not 16-bit");
    br.bits(1);
    let first = br.bits(8), extra = 0;  // UTF-8 coded frame number
    if (first >= 0xc0) {
      let x = first;
      while (x & 0x40) { extra++; x = (x << 1) & 0xff; }
    }
    for (let i = 0; i < extra; i++) br.bits(8);
    let n;
    if (bsCode === 6) n = br.bits(8) + 1;
    else if (bsCode === 7) n = br.bits(16) + 1;
    else if (bsCode === 1) n = 192;
    else if (bsCode >= 2 && bsCode <= 5) n = 576 << (bsCode - 2);
    else n = 256 << (bsCode - 8);
    if (srCode === 13) this.sampleRate = br.bits(16);
    else if (srCode === 14) this.sampleRate = br.bits(16) * 10;
    else if (srCode === 12) this.sampleRate = br.bits(8) * 1000;
    const gotCrc8 = br.bits(8);
    const hdrEnd = br.pos >> 3;       // header is byte-aligned here
    if (gotCrc8 !== flacCrc8(this.buf, off, hdrEnd - 1))
      throw new Error("flac: frame header crc8 mismatch");
    let subs = [];
    for (let c = 0; c < channels; c++) {
      const side = chan >= 8 && c === (chan === 9 ? 0 : 1);
      subs.push(flacSubframe(br, n, side ? 17 : 16));
    }
    if (chan >= 8) subs = flacUndecorrelate(chan, subs);
    br.align();
    const gotCrc16 = br.bits(16);
    const frameEnd = br.pos >> 3;
    if (gotCrc16 !== flacCrc16(this.buf, off, frameEnd - 2))
      throw new Error("flac: frame crc16 mismatch");
    this.channels = channels;
    const pcm = new Int32Array(n * channels);
    for (let i = 0; i < n; i++)
      for (let c = 0; c < channels; c++) pcm[i * channels + c] = subs[c][i];
    return { pcm, used: frameEnd - off };
  }

  /* Feed one packet's payload; returns an array of Int32Array blocks
     (interleaved when stereo) decoded from the complete frames now
     available. */
  push(chunk) {
    if (chunk.length) this._append(chunk);
    const out = [];
    if (!this.gotHeader) {
      try { if (!this._header()) return out; }
      catch (e) { if (e instanceof FlacOverrun) return out; throw e; }
    }
    // track a read offset and slice ONCE after the loop: a per-frame
    // slice re-copied the whole remaining buffer per decoded frame
    let off = 0;
    for (;;) {
      if (this.buf.length - off === 0) break;
      try {
        const { pcm, used } = this._frame(off);
        out.push(pcm);
        off += used;
      } catch (e) {
        if (e instanceof FlacOverrun) break;
        throw e;
      }
    }
    if (off) this.buf = this.buf.slice(off);
    return out;
  }
}
