/* Minimal CBOR decoder for the server's nlohmann-compatible packets
   (audio: {data, frame_num, l, m, pwr, r}; waterfall: {data,
   frame_num, l, r}) -- maps, text/byte strings, ints, doubles.
   Mirror of tools/verify/client.py's decoder, incremental-friendly:
   cborTryDecode returns null when the buffer holds only a partial
   packet (the deflate stream chunks don't align with packets). */
"use strict";

const CBOR_TEXT = new TextDecoder();  // hoisted: several keys per packet

function cborTryDecode(b) {
  const view = new DataView(b.buffer, b.byteOffset, b.byteLength);
  let p = 0;

  function need(n) { if (p + n > b.length) throw new RangeError("short"); }

  function item() {
    need(1);
    const ib = b[p++];
    const major = ib >> 5, info = ib & 0x1f;
    let val;
    if (info < 24) val = info;
    else if (info === 24) { need(1); val = b[p]; p += 1; }
    else if (info === 25) { need(2); val = view.getUint16(p); p += 2; }
    else if (info === 26) { need(4); val = view.getUint32(p); p += 4; }
    else if (info === 27) {
      need(8);
      if (major === 7) { const f = view.getFloat64(p); p += 8; return f; }
      val = Number(view.getBigUint64(p)); p += 8;
    } else throw new Error("cbor info " + info);
    switch (major) {
      case 0: return val;
      case 1: return -1 - val;
      case 2: {
        need(val);
        const s = b.slice(p, p + val); p += val; return s;
      }
      case 3: {
        need(val);
        const s = CBOR_TEXT.decode(b.subarray(p, p + val));
        p += val; return s;
      }
      case 4: {
        const out = [];
        for (let i = 0; i < val; i++) out.push(item());
        return out;
      }
      case 5: {
        // null prototype: a third-party server's "__proto__" key must
        // create an own property, not hit the prototype setter
        const out = Object.create(null);
        for (let i = 0; i < val; i++) { const k = item(); out[k] = item(); }
        return out;
      }
      case 7:
        if (info === 26) return view.getFloat32(p - 4);
        if (info === 20) return false;
        if (info === 21) return true;
        if (info === 22) return null;
        // lockstep with the Python mirror: half-floats (info 25) and
        // other simple values raise rather than leak raw ints
        throw new Error("cbor major 7 info " + info);
      default: throw new Error("cbor major " + major);
    }
  }

  try {
    const value = item();
    return { value, used: p };
  } catch (e) {
    if (e instanceof RangeError) return null;
    throw e;
  }
}

function cborDecode(buf) {
  const r = cborTryDecode(
    buf instanceof Uint8Array ? buf : new Uint8Array(buf));
  if (!r) throw new Error("cbor: truncated");
  return r.value;
}
