"""AV1 waterfall codec: OBU-level validation of the emitted stream
plus a full decode round trip (AV1Decoder binds the system libaom's
av1_dx; LOSSLESS mode makes the luma bit-exact)."""

import struct

import numpy as np
import pytest
import zstandard

from phantomsdr_tpu.runtime import av1 as av1mod

pytestmark = pytest.mark.skipif(
    not av1mod.av1_available(),
    reason=f"libaom unavailable: {av1mod._Aom.failure()}")


def parse_obus(data: bytes):
    """Minimal AV1 low-overhead bitstream OBU walk (has_size_field=1)."""
    obus = []
    pos = 0
    while pos < len(data):
        hdr = data[pos]
        obu_type = (hdr >> 3) & 0xF
        has_ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        assert has_size, "expect low-overhead size-field OBUs"
        p = pos + 1 + has_ext
        # leb128
        sz = 0
        shift = 0
        while True:
            b = data[p]
            p += 1
            sz |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
        obus.append((obu_type, data[p:p + sz]))
        pos = p + sz
    return obus


OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_METADATA = 5
OBU_FRAME = 6


def test_av1_stream_structure_and_metadata():
    w = 512
    enc = av1mod.AV1Encoder(w)
    rng = np.random.default_rng(1)
    frames = []
    rows = []
    for i in range(16):
        row = rng.integers(-128, 128, w).astype(np.int8).tobytes()
        rows.append(row)
        out = enc.send(row, 100 + i, 2 * i, 2 * i + w)
        if out is not None:
            frames.append(out)
    assert len(frames) == 2  # 16 lines / coalesce 8

    for fi, frame in enumerate(frames):
        obus = parse_obus(frame)
        types = [t for t, _ in obus]
        assert OBU_FRAME in types or OBU_FRAME_HEADER in types
        assert OBU_METADATA in types, f"frame {fi}: no metadata OBU {types}"
        if fi == 0:
            assert OBU_SEQUENCE_HEADER in types
        # T.35 metadata: leb128 metadata_type(4), itu_t_t35 country byte 0,
        # then our zstd blob of 8 x {u64 frame_num, u32 bytes, u32 l, u32 r}
        meta = [p for t, p in obus if t == OBU_METADATA][0]
        assert meta[0] == av1mod.OBU_METADATA_TYPE_ITUT_T35
        assert meta[1] == 0  # header_multi_compressed[0] = 0
        blob = zstandard.ZstdDecompressor().decompress(
            bytes(meta[2:]), max_output_size=1 << 16)
        assert len(blob) == 8 * 24
        for line in range(8):
            fn, nb, l, r = struct.unpack_from("<QIII", blob, line * 24)
            i = fi * 8 + line
            assert fn == 100 + i
            assert nb == w
            assert (l, r) == (2 * i, 2 * i + w)
    enc.close()


def test_av1_first_frame_has_sequence_header_dims():
    w = 256
    enc = av1mod.AV1Encoder(w)
    out = None
    for i in range(8):
        out = enc.send(bytes(w), i, 0, w)
    assert out
    obus = parse_obus(out)
    seq = [p for t, p in obus if t == OBU_SEQUENCE_HEADER]
    assert seq, "first temporal unit must carry the sequence header"
    # seq_profile(3) must be 0 (monochrome needs profile 0 w/ mono flag)
    assert (seq[0][0] >> 5) == 0
    enc.close()


def test_av1_lossless_actually_engages():
    """Canary for the empirically-established control IDs: lossless mode
    must produce a substantially LARGER stream than lossy on
    full-entropy noise (quantization bypassed).  If a libaom ABI change
    remaps AV1E_SET_LOSSLESS, either the checked control rc fails the
    constructor or this size relation breaks."""
    import ctypes
    from phantomsdr_tpu.runtime import av1 as av1mod

    if not av1mod.av1_available():
        import pytest
        pytest.skip(f"libaom unavailable: {av1mod._Aom.failure()}")

    rng = np.random.default_rng(0)
    rows = [rng.integers(-128, 128, 1024).astype(np.int8).tobytes()
            for _ in range(8)]

    def frame_size(lossless: bool) -> int:
        enc = av1mod.AV1Encoder(1024)
        if not lossless:  # flip lossless back OFF on this instance
            rc = enc.aom.lib.aom_codec_control(
                ctypes.byref(enc.ctx),
                ctypes.c_int(av1mod.AV1E_SET_LOSSLESS), ctypes.c_int(0))
            assert rc == 0
        out = None
        for i, r in enumerate(rows):
            out = enc.send(r, i, 0, 1024) or out
        enc.close()
        return len(out)

    lossy, lossless = frame_size(False), frame_size(True)
    # 8 KB of noise: lossless carries ~full entropy, lossy quantizes
    assert lossless > lossy * 1.3, (lossless, lossy)
    assert lossless > 8000


def test_av1_lossless_decode_roundtrip():
    """Close the codec loop with the system decoder (AV1Decoder binds
    aom_codec_av1_dx -- the role dav1d WASM plays in the reference's
    browser, jsdsp/lib/dav1d.cpp): LOSSLESS mode means every decoded
    luma row equals the int8 waterfall row BIT-exactly, across key AND
    inter frames, and the T.35 metadata OBU still carries the per-line
    headers (parse_t35_headers from the stream-structure test)."""
    if not av1mod.av1_available():
        import pytest
        pytest.skip(f"libaom unavailable: {av1mod._Aom.failure()}")

    rng = np.random.default_rng(42)
    enc = av1mod.AV1Encoder(1024)
    dec = av1mod.AV1Decoder()
    for f in range(3):                       # frame 0 key, 1-2 inter
        rows = rng.integers(-128, 128, size=(8, 1024)).astype(np.int8)
        blob = None
        for i in range(8):
            blob = enc.send(rows[i].tobytes(), 8 * f + i, 16, 1040)
        assert blob
        frames = dec.decode(blob)
        assert len(frames) == 1
        np.testing.assert_array_equal(frames[0], rows)
    enc.close()
    dec.close()
