"""html/av1.js bitstream-layer mirror tests.

The browser decodes AV1 waterfall pixels with WebCodecs VideoDecoder
(no JS runtime or browser in this image to drive it); everything BELOW
that API is our own JS -- the OBU walk, keyframe detection, T.35
metadata extraction and the zstd'd per-line header parse -- and is
validated here bit-level against REAL AV1Encoder output, with the
libaom AV1Decoder standing in for VideoDecoder to close the pixel
loop (lossless mode ⇒ bit-exact)."""

import struct

import numpy as np
import pytest

from phantomsdr_tpu.runtime import av1 as av1mod
from tests.test_av1 import parse_obus, OBU_SEQUENCE_HEADER, OBU_METADATA
from tests.zstd_mirror import ZstdStream

pytestmark = pytest.mark.skipif(not av1mod.av1_available(),
                                reason="libaom unusable in this image")

LINES = av1mod.WATERFALL_COALESCE


def av1_has_seq_hdr(tu):
    """Mirror of html/av1.js av1HasSeqHdr."""
    return any(t == OBU_SEQUENCE_HEADER for t, _ in parse_obus(tu))


def av1_headers(tu):
    """Mirror of html/av1.js av1Headers: per-line {frame_num, bytes,
    l, r} out of the T.35 metadata OBU, zstd-decoded by the SAME
    from-scratch decoder the frontend ships (tests/zstd_mirror ==
    html/zstd.js)."""
    metas = [p for t, p in parse_obus(tu) if t == OBU_METADATA]
    if not metas:
        return None
    p = metas[0]
    if p[0] != 4 or p[1] != 0:  # ITU-T T.35 type + country byte
        return None
    blob = ZstdStream().push(bytes(p[2:]))
    out = []
    for i in range(LINES):
        o = i * 24
        if o + 20 > len(blob):
            break
        fn, nb, l, r = struct.unpack_from("<QIII", blob, o)
        out.append({"frame_num": fn, "bytes": nb, "l": l, "r": r})
    return out


def _encode_stream(width=512, n_lines=24, seed=3):
    rng = np.random.default_rng(seed)
    enc = av1mod.AV1Encoder(width)
    rows, tus = [], []
    for i in range(n_lines):
        row = rng.integers(-128, 128, width).astype(np.int8)
        rows.append(row)
        tu = enc.send(row.tobytes(), frame_num=1000 + i, l=7 * i,
                      r=7 * i + width)
        if tu is not None:
            tus.append(tu)
    enc.close()
    return rows, tus


def test_headers_bit_level_against_encoder():
    rows, tus = _encode_stream()
    assert len(tus) == 3  # 24 lines / 8 per frame
    for f, tu in enumerate(tus):
        hdrs = av1_headers(tu)
        assert hdrs is not None and len(hdrs) == LINES
        for y, h in enumerate(hdrs):
            i = f * LINES + y
            assert h == {"frame_num": 1000 + i, "bytes": 512,
                         "l": 7 * i, "r": 7 * i + 512}


def test_keyframe_detection():
    """The frontend must label the first TU 'key' and the rest 'delta'
    for EncodedVideoChunk -- detected by sequence-header presence."""
    _, tus = _encode_stream()
    assert av1_has_seq_hdr(tus[0])
    assert not any(av1_has_seq_hdr(tu) for tu in tus[1:])


def test_pixel_loop_with_decoder_stand_in():
    """VideoDecoder stand-in: libaom decode + the mirror's ^0x80 line
    extraction must give back the exact int8 rows the server encoded
    (the JS applies the same xor to the luma plane)."""
    rows, tus = _encode_stream()
    dec = av1mod.AV1Decoder()
    got = []
    for tu in tus:
        for frame in dec.decode(tu):
            hdrs = av1_headers(tu)
            for y in range(frame.shape[0]):
                got.append(frame[y, :hdrs[y]["bytes"]])
    dec.close()
    assert len(got) == len(rows)
    for a, b in zip(got, rows):
        np.testing.assert_array_equal(a, b)


def test_mirror_matches_js():
    """html/av1.js must textually track this mirror's structure."""
    from pathlib import Path

    js = (Path(__file__).resolve().parent.parent / "html"
          / "av1.js").read_text()
    for marker in ["parseObus", "av1HasSeqHdr", "av1Headers",
                   "OBU_METADATA_TYPE_ITUT_T35", "i * 24",
                   "^ 0x80", "VideoDecoder", "EncodedVideoChunk",
                   "truncated OBU leb128",   # corrupt-TU containment
                   "frame.close()"]:         # no leaked VideoFrames
        assert marker in js, f"html/av1.js missing mirror marker {marker}"
