"""Python mirror of html/zstd.js -- a from-scratch RFC 8878 zstandard
decoder for the stock waterfall stream.

The reference's browsers decode the standard zstd waterfall stream
with an emscripten'd libzstd (jsdsp/src/libzstd.js:1-84).  This image
has no JS runtime, so html/zstd.js cannot be executed here; this
module is its line-for-line structural mirror (same state machine,
same table builders, same bitstream readers), tested empirically
against the real libzstd compressor (`zstandard`) across levels,
data shapes and streaming flush patterns in tests/test_zstd_mirror.py.
Keep the two in lockstep: any change here must be mirrored in
html/zstd.js and vice versa.

Scope: decompression only, no dictionaries (the server's per-client
ZstdStream -- runtime/codecs.py -- never uses one), xxh64 content
checksums skipped (frames from a flush-per-message stream never end).
"""


class ZstdError(Exception):
    pass


# ------------------------------------------------------------ bitstreams

class BackwardBits:
    """zstd FSE/Huffman bitstream: bytes written LSB-first, read from
    the END.  The last byte's highest set bit is a padding marker.
    Reads past the start zero-fill and raise the overflow flag (the
    FSE interleaved-states termination rule needs exactly this)."""

    def __init__(self, d, start, end):
        if end <= start:
            raise ZstdError("empty bitstream")
        last = d[end - 1]
        if last == 0:
            raise ZstdError("bitstream has no padding marker")
        self.d = d
        self.start = start
        # valid bits = everything below the marker bit
        self.bitpos = (end - start - 1) * 8 + last.bit_length() - 1
        self.overflow = False

    def read(self, n):
        self.bitpos -= n
        p = self.bitpos
        if p < 0:
            self.overflow = True
        v = 0
        for i in range(n):
            b = p + i
            if b >= 0 and (self.d[self.start + (b >> 3)] >> (b & 7)) & 1:
                v |= 1 << i
        return v

    def peek(self, n):
        save, save_ov = self.bitpos, self.overflow
        v = self.read(n)
        self.bitpos = save
        # never ERASE a prior overflow: it is the FSE termination signal
        self.overflow = save_ov
        return v


class ForwardBits:
    """LSB-first forward bit reader (FSE table descriptions)."""

    def __init__(self, d, pos):
        self.d = d
        self.bit = pos * 8

    def read(self, n):
        v = 0
        for i in range(n):
            b = self.bit + i
            if (self.d[b >> 3] >> (b & 7)) & 1:
                v |= 1 << i
        self.bit += n
        return v

    def rewind(self, n):
        self.bit -= n

    def bytepos(self):
        return (self.bit + 7) >> 3


# ------------------------------------------------------------------- FSE

def fse_build(counts, al):
    """Decoding table from normalized counts (RFC 8878 4.1.1): -1
    probabilities get one cell each at the table's end; positive
    probabilities spread with the (size/2 + size/8 + 3) step."""
    size = 1 << al
    sym = [0] * size
    high = size - 1
    state_desc = [0] * len(counts)
    for s, c in enumerate(counts):
        if c == -1:
            sym[high] = s
            high -= 1
            state_desc[s] = 1
        elif c > 0:
            state_desc[s] = c
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("corrupt FSE spread")
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        x = state_desc[sym[i]]
        state_desc[sym[i]] += 1
        nb = al - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return sym, nbits, base


def fse_read_counts(fb, max_symbols, max_al):
    """Normalized-count header (forward bitstream, byte-aligned at
    the end).  Returns (counts, accuracy_log)."""
    al = fb.read(4) + 5
    if al > max_al:
        raise ZstdError(f"FSE accuracy {al} > {max_al}")
    remaining = (1 << al) + 1
    counts = []
    while remaining > 1 and len(counts) <= max_symbols:
        bits = remaining.bit_length()
        val = fb.read(bits)
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & low_mask) < threshold:
            fb.rewind(1)
            val &= low_mask
        elif val > low_mask:
            val -= threshold
        proba = val - 1
        counts.append(proba)
        remaining -= 1 if proba < 0 else proba
        if proba == 0:
            rep = fb.read(2)
            while rep == 3:
                counts.extend([0, 0, 0])
                rep = fb.read(2)
            counts.extend([0] * rep)
    if remaining != 1:
        raise ZstdError("corrupt FSE counts")
    # The zero-repeat loop can overshoot the loop-entry bound; bound it
    # explicitly (in lockstep with html/zstd.js) so corrupt streams are
    # contained as ZstdError, not downstream index behavior.
    if len(counts) > max_symbols + 1:
        raise ZstdError(
            f"FSE counts for {len(counts)} symbols > {max_symbols + 1}")
    fb.bit = fb.bytepos() * 8  # descriptions end byte-aligned
    return counts, al


class FseDecoder:
    """One FSE state over a prebuilt table (or a 0-bit RLE 'table')."""

    def __init__(self, table, al):
        self.sym, self.nbits, self.base = table
        self.al = al
        self.state = 0

    @classmethod
    def rle(cls, symbol):
        return cls(([symbol], [0], [0]), 0)

    def init(self, bb):
        self.state = bb.read(self.al)

    def symbol(self):
        return self.sym[self.state]

    def update(self, bb):
        self.state = self.base[self.state] + bb.read(self.nbits[self.state])


# --------------------------------------------------------------- Huffman

def huf_read_weights(d, pos, end):
    """Huffman tree description (RFC 8878 4.2.1): direct 4-bit weights
    (header >= 128) or FSE-compressed weights decoded by two
    interleaved states.  Returns (weights, bytes_consumed)."""
    hb = d[pos]
    if hb >= 128:
        n = hb - 127
        if pos + 1 + ((n + 1) >> 1) > end:  # same bound as the FSE path
            raise ZstdError("truncated huffman description")
        weights = []
        for i in range(n):
            b = d[pos + 1 + (i >> 1)]
            weights.append((b >> 4) if (i & 1) == 0 else (b & 15))
        return weights, 1 + ((n + 1) >> 1)
    if pos + 1 + hb > end:
        raise ZstdError("truncated huffman description")
    fb = ForwardBits(d, pos + 1)
    counts, al = fse_read_counts(fb, 255, 6)
    table = fse_build(counts, al)
    s1 = FseDecoder(table, al)
    s2 = FseDecoder(table, al)
    bb = BackwardBits(d, fb.bytepos(), pos + 1 + hb)
    s1.init(bb)
    s2.init(bb)
    weights = []
    while True:
        weights.append(s1.symbol())
        s1.update(bb)
        if bb.overflow:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        s2.update(bb)
        if bb.overflow:
            weights.append(s1.symbol())
            break
        if len(weights) > 255:
            raise ZstdError("too many huffman weights")
    # the break paths can push past the in-loop guard (up to 256
    # explicit weights + 1 implicit = a 257th symbol) -- lockstep with
    # the JS, which would otherwise wrap symbol 256 in a Uint8Array
    if len(weights) > 255:
        raise ZstdError("too many huffman weights")
    return weights, 1 + hb


def huf_build(weights):
    """Canonical Huffman decode table from explicit weights plus the
    implicit last one.  Returns (symbols, nbits, max_bits)."""
    total = 0
    for w in weights:
        if w > 12:
            raise ZstdError("huffman weight > 12")
        if w > 0:
            total += 1 << (w - 1)
    if total == 0:
        raise ZstdError("empty huffman table")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("corrupt huffman weights")
    weights = weights + [left.bit_length()]
    size = 1 << max_bits
    bits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    rank_count = [0] * (max_bits + 1)
    for b in bits:
        rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    for b in range(max_bits, 0, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (max_bits - b))
    sym = [0] * size
    nb = [0] * size
    for s, b in enumerate(bits):
        if b == 0:
            continue
        code = rank_idx[b]
        span = 1 << (max_bits - b)
        for i in range(code, code + span):
            sym[i] = s
            nb[i] = b
        rank_idx[b] = code + span
    return sym, nb, max_bits


def huf_decode_stream(table, d, start, end, count):
    """Decode exactly `count` literals from one backward stream."""
    sym, nb, max_bits = table
    bb = BackwardBits(d, start, end)
    out = bytearray()
    for _ in range(count):
        idx = bb.peek(max_bits)
        n = nb[idx]
        if n == 0 or n > bb.bitpos:
            raise ZstdError("corrupt huffman stream")
        bb.bitpos -= n
        out.append(sym[idx])
    if bb.bitpos != 0:
        raise ZstdError("huffman stream not fully consumed")
    return out


# -------------------------------------------- sequence code tables (RFC)

LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                             256, 512, 1024, 2048, 4096, 8192, 16384,
                             32768, 65536]
LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                      13, 14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                99, 131, 259, 515, 1027, 2051, 4099, 8195,
                                16387, 32771, 65539]
ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                      12, 13, 14, 15, 16]

LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
              2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
              1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_PREDEF = (fse_build(LL_DEFAULT, 6), 6)
_ML_PREDEF = (fse_build(ML_DEFAULT, 6), 6)
_OF_PREDEF = (fse_build(OF_DEFAULT, 5), 5)

# (max symbol value, max accuracy log, predefined) per field
_SEQ_SPEC = {"ll": (35, 9, _LL_PREDEF), "of": (31, 8, _OF_PREDEF),
             "ml": (52, 9, _ML_PREDEF)}


# --------------------------------------------------------------- decoder

class ZstdStream:
    """Streaming zstd decoder: push() raw wire bytes in (arbitrary
    chunking), get decompressed bytes out.  Mirrors html/zstd.js
    ZstdStream.  Designed for the server's flush-per-message stream
    (one frame, block boundaries at message boundaries) but handles
    complete/multi frames, skippable frames and checksums too."""

    def __init__(self):
        self.buf = b""
        self.in_frame = False
        self.need_checksum = False
        self.checksum_flag = False
        self.window_size = 0
        self.hist = bytearray()
        # per-frame decoder state that persists across blocks
        self.rep = [1, 4, 8]
        self.huf_table = None
        self.fse_prev = {"ll": None, "of": None, "ml": None}

    # -- frame layer ----------------------------------------------------

    def push(self, chunk):
        self.buf += bytes(chunk)
        out = bytearray()
        while True:
            if self.need_checksum:
                if len(self.buf) < 4:
                    break
                self.buf = self.buf[4:]  # xxh64 low 32 bits: skipped
                self.need_checksum = False
            if not self.in_frame:
                if not self._frame_header():
                    break
                continue  # a skippable frame leaves in_frame False
            if not self._block(out):
                break
        return bytes(out)

    def _frame_header(self):
        b = self.buf
        if len(b) < 4:
            return False
        magic = int.from_bytes(b[:4], "little")
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if len(b) < 8:
                return False
            size = int.from_bytes(b[4:8], "little")
            if size > 1 << 20:  # corrupt header would buffer up to 4 GB
                raise ZstdError("skippable frame too large")
            if len(b) < 8 + size:
                return False
            self.buf = b[8 + size:]
            return True
        if magic != 0xFD2FB528:
            raise ZstdError(f"bad magic {magic:#x}")
        if len(b) < 6:
            return False
        fhd = b[4]
        if fhd & 8:
            raise ZstdError("reserved FHD bit set")
        single_seg = (fhd >> 5) & 1
        fcs_flag = fhd >> 6
        dict_bytes = (0, 1, 2, 4)[fhd & 3]
        fcs_bytes = (1 if single_seg else 0, 2, 4, 8)[fcs_flag]
        p = 5
        need = p + (0 if single_seg else 1) + dict_bytes + fcs_bytes
        if len(b) < need:
            return False
        if single_seg:
            window = None
        else:
            wd = b[p]
            p += 1
            base = 1 << (10 + (wd >> 3))
            window = base + (base >> 3) * (wd & 7)
        if dict_bytes:
            if int.from_bytes(b[p:p + dict_bytes], "little"):
                raise ZstdError("dictionaries not supported")
            p += dict_bytes
        if fcs_bytes:
            fcs = int.from_bytes(b[p:p + fcs_bytes], "little")
            if fcs_bytes == 2:
                fcs += 256
            p += fcs_bytes
            if window is None:
                window = fcs
        self.buf = b[p:]
        self.in_frame = True
        self.checksum_flag = bool((fhd >> 2) & 1)
        self.window_size = min(window if window is not None else 0,
                               1 << 27)  # sanity cap, 128 MB
        self.rep = [1, 4, 8]
        self.huf_table = None
        self.fse_prev = {"ll": None, "of": None, "ml": None}
        return True

    def _block(self, out):
        b = self.buf
        if len(b) < 3:
            return False
        h = int.from_bytes(b[:3], "little")
        last = h & 1
        btype = (h >> 1) & 3
        bsize = h >> 3
        if btype != 0 and bsize > 1 << 17:
            # Block_Maximum_Size: regenerated size <= 128 kB (raw
            # blocks are bounded by the wire bytes themselves)
            raise ZstdError("block size exceeds 128 kB")
        body = 1 if btype == 1 else bsize
        if len(b) < 3 + body:
            return False
        if btype == 0:  # raw
            dec = b[3:3 + bsize]
        elif btype == 1:  # RLE
            dec = bytes([b[3]]) * bsize
        elif btype == 2:
            try:
                dec = self._compressed_block(b, 3, 3 + bsize)
            except ZstdError:
                raise
            except (IndexError, ValueError, OverflowError) as e:
                # corrupt lengths walking off the block: surface every
                # parse failure as ZstdError (fuzz-pinned)
                raise ZstdError(f"corrupt block ({e!r})") from e
        else:
            raise ZstdError("reserved block type")
        out += dec
        self.hist += dec
        if self.window_size and len(self.hist) > 2 * self.window_size:
            del self.hist[:len(self.hist) - self.window_size]
        self.buf = b[3 + body:]
        if last:
            self.in_frame = False
            self.need_checksum = self.checksum_flag
        return True

    # -- compressed block -----------------------------------------------

    def _compressed_block(self, d, p, end):
        lits, p = self._literals(d, p, end)
        return self._sequences(d, p, end, lits)

    def _literals(self, d, p, end):
        b0 = d[p]
        ltype = b0 & 3
        sf = (b0 >> 2) & 3
        if ltype <= 1:  # Raw / RLE literals
            if (sf & 1) == 0:
                rs = b0 >> 3
                p += 1
            elif sf == 1:
                rs = (b0 >> 4) | (d[p + 1] << 4)
                p += 2
            else:
                rs = (b0 >> 4) | (d[p + 1] << 4) | (d[p + 2] << 12)
                p += 3
            if rs > 1 << 17:  # > Block_Maximum_Size: corrupt (output cap)
                raise ZstdError("literal size too large")
            if ltype == 0:
                if p + rs > end:  # would consume the NEXT block's bytes
                    raise ZstdError("raw literals overrun block")
                lits = d[p:p + rs]
                p += rs
            else:
                if p >= end:
                    raise ZstdError("RLE literal byte missing")
                lits = bytes([d[p]]) * rs
                p += 1
            return lits, p
        # Compressed (2) / Treeless (3)
        if sf == 0 or sf == 1:
            rs = (b0 >> 4) | ((d[p + 1] & 0x3F) << 4)
            cs = (d[p + 1] >> 6) | (d[p + 2] << 2)
            p += 3
        elif sf == 2:
            rs = (b0 >> 4) | (d[p + 1] << 4) | ((d[p + 2] & 3) << 12)
            cs = (d[p + 2] >> 2) | (d[p + 3] << 6)
            p += 4
        else:
            rs = (b0 >> 4) | (d[p + 1] << 4) | ((d[p + 2] & 0x3F) << 12)
            cs = (d[p + 2] >> 6) | (d[p + 3] << 2) | (d[p + 4] << 10)
            p += 5
        # RFC 8878 3.1.1.3.1.2: Size_Format 00 means ONE stream for BOTH
        # Compressed and Treeless literals (libzstd emits treeless
        # single-stream whenever it reuses a tree on a <256 B section).
        streams = 1 if sf == 0 else 4
        if rs > 1 << 17:  # > Block_Maximum_Size: corrupt (output cap)
            raise ZstdError("literal size too large")
        cend = p + cs
        if cend > end:
            raise ZstdError("literals overrun block")
        if ltype == 2:
            weights, used = huf_read_weights(d, p, cend)
            self.huf_table = huf_build(weights)
            p += used
        elif self.huf_table is None:
            raise ZstdError("treeless literals with no previous table")
        if streams == 1:
            lits = huf_decode_stream(self.huf_table, d, p, cend, rs)
        else:
            s1 = int.from_bytes(d[p:p + 2], "little")
            s2 = int.from_bytes(d[p + 2:p + 4], "little")
            s3 = int.from_bytes(d[p + 4:p + 6], "little")
            starts = [p + 6, p + 6 + s1, p + 6 + s1 + s2,
                      p + 6 + s1 + s2 + s3]
            ends = starts[1:] + [cend]
            n = (rs + 3) >> 2
            counts = [n, n, n, rs - 3 * n]
            if counts[3] < 0 or ends[2] > cend:
                raise ZstdError("corrupt 4-stream literals")
            lits = bytearray()
            for i in range(4):
                lits += huf_decode_stream(self.huf_table, d, starts[i],
                                          ends[i], counts[i])
        return bytes(lits), cend

    def _seq_table(self, d, p, kind):
        """One of the three sequence FSE tables; returns (decoder, p)."""
        max_sym, max_al, predef = _SEQ_SPEC[kind]
        mode = self._modes[kind]
        if mode == 0:
            dec = FseDecoder(*predef)
        elif mode == 1:
            sym = d[p]
            p += 1
            if sym > max_sym:
                raise ZstdError(f"RLE {kind} symbol {sym} > {max_sym}")
            dec = FseDecoder.rle(sym)
        elif mode == 2:
            fb = ForwardBits(d, p)
            counts, al = fse_read_counts(fb, max_sym, max_al)
            dec = FseDecoder(fse_build(counts, al), al)
            p = fb.bytepos()
        else:
            prev = self.fse_prev[kind]
            if prev is None:
                raise ZstdError(f"repeat {kind} table with no previous")
            dec = FseDecoder((prev.sym, prev.nbits, prev.base), prev.al)
        self.fse_prev[kind] = dec
        return dec, p

    def _sequences(self, d, p, end, lits):
        nb = d[p]
        if nb == 0:
            if p + 1 != end:
                raise ZstdError("trailing bytes after empty sequences")
            return lits
        if nb < 128:
            nseq = nb
            p += 1
        elif nb < 255:
            nseq = ((nb - 128) << 8) + d[p + 1]
            p += 2
        else:
            nseq = d[p + 1] + (d[p + 2] << 8) + 0x7F00
            p += 3
        modes = d[p]
        p += 1
        if modes & 3:
            raise ZstdError("reserved sequence mode bits set")
        self._modes = {"ll": (modes >> 6) & 3, "of": (modes >> 4) & 3,
                       "ml": (modes >> 2) & 3}
        ll, p = self._seq_table(d, p, "ll")
        of, p = self._seq_table(d, p, "of")
        ml, p = self._seq_table(d, p, "ml")
        bb = BackwardBits(d, p, end)
        ll.init(bb)
        of.init(bb)
        ml.init(bb)
        out = bytearray()
        hist = self.hist
        hlen = len(hist)
        lpos = 0
        rep = self.rep
        for i in range(nseq):
            ofcode = of.symbol()
            ov = (1 << ofcode) + bb.read(ofcode)
            mlcode = ml.symbol()
            mlen = ML_BASE[mlcode] + bb.read(ML_BITS[mlcode])
            llcode = ll.symbol()
            llen = LL_BASE[llcode] + bb.read(LL_BITS[llcode])
            if bb.overflow:
                raise ZstdError("sequence bitstream overrun")
            if ov > 3:
                off = ov - 3
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = off
            else:
                j = ov + (1 if llen == 0 else 0)
                if j == 1:
                    off = rep[0]
                elif j == 2:
                    off = rep[1]
                    rep[1] = rep[0]
                    rep[0] = off
                elif j == 3:
                    off = rep[2]
                    rep[2] = rep[1]
                    rep[1] = rep[0]
                    rep[0] = off
                else:
                    off = rep[0] - 1
                    if off == 0:
                        raise ZstdError("repeat offset underflow")
                    rep[2] = rep[1]
                    rep[1] = rep[0]
                    rep[0] = off
            if lpos + llen > len(lits):
                raise ZstdError("literals overrun")
            if len(out) + llen + mlen > 1 << 17:  # zstd block max 128 kB
                raise ZstdError("block output exceeds 128 kB")
            out += lits[lpos:lpos + llen]
            lpos += llen
            if off > hlen + len(out):
                raise ZstdError("match offset beyond window")
            for _ in range(mlen):  # byte-wise: overlap is the point
                idx = len(out) - off
                out.append(out[idx] if idx >= 0 else hist[hlen + idx])
            if i + 1 < nseq:
                ll.update(bb)
                ml.update(bb)
                of.update(bb)
        if bb.bitpos != 0:
            raise ZstdError("sequence bitstream not fully consumed")
        out += lits[lpos:]
        return bytes(out)
