// AV1 waterfall decode for the built-in frontend.
//
// The server's av1 mode sends raw AV1 temporal units on /waterfall
// (runtime/av1.py AV1Encoder, reference waterfallcompression.cpp:40-129):
// 8 coalesced lines per frame in the luma plane (values int8 dB ^ 0x80),
// plus a T.35 metadata OBU whose payload is 0x00 + zstd(8 x 24-byte
// per-line headers {u64 frame_num; u32 bytes; u32 l; u32 r}).
//
// The bitstream layer (OBU walk, metadata extraction via zstd.js) is
// plain JS mirrored by tests/test_av1_frontend.py; pixel decode uses
// the browser's WebCodecs VideoDecoder (the reference browsers use a
// dav1d WASM build, jsdsp/lib/dav1d.cpp:1-86 -- WebCodecs is the
// browser-native equivalent).
"use strict";

const OBU_SEQUENCE_HEADER = 1;
const OBU_METADATA = 5;
const OBU_METADATA_TYPE_ITUT_T35 = 4;
const AV1_LINES_PER_FRAME = 8;   // WATERFALL_COALESCE

// Minimal AV1 low-overhead bitstream OBU walk (has_size_field=1).
// Mirror of tests/test_av1.py parse_obus.
function parseObus(d) {
  const obus = [];
  let pos = 0;
  while (pos < d.length) {
    const hdr = d[pos];
    const obuType = (hdr >> 3) & 0xf;
    const hasExt = (hdr >> 2) & 1;
    const hasSize = (hdr >> 1) & 1;
    if (!hasSize) throw new Error("expect low-overhead size-field OBUs");
    let p = pos + 1 + hasExt;
    let sz = 0, shift = 0;
    for (;;) {  // leb128
      if (p >= d.length)  // undefined would coerce to a silent 0 size
        throw new Error("truncated OBU leb128");
      const b = d[p++];
      sz += (b & 0x7f) * Math.pow(2, shift);
      shift += 7;
      if (!(b & 0x80)) break;
    }
    if (p + sz > d.length) throw new Error("truncated OBU payload");
    obus.push({ type: obuType, payload: d.subarray(p, p + sz) });
    pos = p + sz;
  }
  return obus;
}

function av1HasSeqHdr(tu) {
  return parseObus(tu).some((o) => o.type === OBU_SEQUENCE_HEADER);
}

// Per-line headers out of an already-parsed OBU list; returns an array
// of AV1_LINES_PER_FRAME {frameNum, bytes, l, r} (or null if absent).
function av1Headers(obus) {
  const meta = obus.find((o) => o.type === OBU_METADATA);
  if (!meta) return null;
  const p = meta.payload;
  // payload = leb128 metadata_type (one byte here) + itu_t_t35_country
  // code 0x00 + zstd blob (+ OBU trailing bits byte)
  if (p[0] !== OBU_METADATA_TYPE_ITUT_T35 || p[1] !== 0) return null;
  const blob = new ZstdStream().push(p.subarray(2));
  const v = new DataView(blob.buffer, blob.byteOffset, blob.byteLength);
  const out = [];
  for (let i = 0; i < AV1_LINES_PER_FRAME; i++) {
    const o = i * 24;  // {u64 frame_num; u32 bytes; u32 l; u32 r; pad 4}
    if (o + 20 > blob.length) break;
    out.push({
      frameNum: v.getUint32(o, true) + v.getUint32(o + 4, true) * 2 ** 32,
      bytes: v.getUint32(o + 8, true),
      l: v.getUint32(o + 12, true),
      r: v.getUint32(o + 16, true),
    });
  }
  return out;
}

// Wire up a WebCodecs VideoDecoder; returns a feed(tuBytes) function
// that emits decoded int8 rows through onRow(row, hdr), or null when
// WebCodecs AV1 is unavailable.
function av1MakeFeed(onRow, onError) {
  if (typeof VideoDecoder !== "function") return null;
  const pending = [];  // header blocks, decode order
  const dec = new VideoDecoder({
    output: (frame) => {
      const hdrs = pending.shift() || [];
      const opts = { rect: { x: 0, y: 0, width: frame.codedWidth,
                             height: frame.codedHeight } };
      const buf = new Uint8Array(frame.allocationSize(opts));
      frame.copyTo(buf, opts).then((layout) => {
        try {
          const stride = layout[0].stride, off = layout[0].offset;
          for (let y = 0; y < Math.min(AV1_LINES_PER_FRAME,
                                       frame.codedHeight); y++) {
            const h = hdrs[y];
            if (!h || h.bytes === 0) continue;
            const row = new Int8Array(h.bytes);
            for (let i = 0; i < h.bytes; i++)
              row[i] = ((buf[off + y * stride + i] ^ 0x80) << 24) >> 24;
            onRow(row, h);
          }
        } finally {
          frame.close();  // a leaked frame exhausts the decoder's pool
        }
      }, (e) => { frame.close(); onError(e); });
    },
    error: onError,
  });
  let configured = false;
  let ts = 0;
  return (tu) => {
    if (dec.state === "closed")  // fatal error already reported via
      return;                    // onError; don't throw on every packet
    const obus = parseObus(tu);  // ONE walk per TU for both questions
    const key = obus.some((o) => o.type === OBU_SEQUENCE_HEADER);
    if (!configured) {
      if (!key) return;            // wait for the first keyframe TU
      dec.configure({ codec: "av01.0.31M.08", optimizeForLatency: true });
      configured = true;
    }
    pending.push(av1Headers(obus) || []);
    dec.decode(new EncodedVideoChunk(
      { type: key ? "key" : "delta", timestamp: ts++, data: tu }));
  };
}
