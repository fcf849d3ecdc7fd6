"""Codec tests: FLAC round-trip via a from-spec decoder, Opus smoke,
zstd stream framing, CBOR wire format."""

import numpy as np
import pytest

from phantomsdr_tpu.runtime import cbor
from phantomsdr_tpu.runtime.codecs import FlacEncoder, OpusChunkEncoder, ZstdStream


# ----------------------------------------------------- minimal FLAC decoder

def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    tab = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        tab.append(crc & mask)
    return tab


_CRC8_TAB = _crc_table(0x07, 8)     # FLAC frame-header CRC (RFC 9639 9.1.1)
_CRC16_TAB = _crc_table(0x8005, 16)  # FLAC frame CRC


def _crc8(d: bytes) -> int:
    crc = 0
    for b in d:
        crc = _CRC8_TAB[crc ^ b]
    return crc


def _crc16(d: bytes) -> int:
    crc = 0
    for b in d:
        crc = _CRC16_TAB[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


class BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.d[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


def signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def _decode_residual(br: "BitReader", n: int, order: int) -> list[int]:
    """Rice-coded residual, any partition order (RFC 9639 9.2.7: the
    first partition is `order` samples short)."""
    method = br.bits(2)
    assert method == 0  # 4-bit rice (we never emit rice2 / escapes)
    po = br.bits(4)
    psize = n >> po
    res = []
    for part in range(1 << po):
        k = br.bits(4)
        assert k != 15
        cnt = psize - (order if part == 0 else 0)
        for _ in range(cnt):
            q = br.unary()
            low = br.bits(k) if k else 0
            u = (q << k) | low
            res.append((u >> 1) ^ -(u & 1))
    return res


def _decode_subframe(br: "BitReader", n: int, bps: int = 16) -> list[int]:
    """bps = 17 for the side channel of a stereo-decorrelated frame."""
    assert br.bits(1) == 0
    sub = br.bits(6)
    assert br.bits(1) == 0  # no wasted bits
    if sub == 0:  # CONSTANT
        return [signed(br.bits(bps), bps)] * n
    if sub == 1:  # VERBATIM
        return [signed(br.bits(bps), bps) for _ in range(n)]
    if (sub >> 3) == 1:  # FIXED, integer coefficients, no shift
        order = sub & 7
        x = [signed(br.bits(bps), bps) for _ in range(order)]
        coef = {
            0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
        }[order]
        shift = 0
    else:  # LPC: quantized coefficients, arithmetic-shifted prediction
        assert sub & 0x20, f"unknown subframe type: {sub:06b}"
        order = (sub & 0x1F) + 1
        x = [signed(br.bits(bps), bps) for _ in range(order)]
        precision = br.bits(4) + 1
        assert precision != 16  # 15 = invalid field value
        shift = br.bits(5)
        coef = [signed(br.bits(precision), precision) for _ in range(order)]
    res = _decode_residual(br, n, order)
    for i, r in enumerate(res):
        pred = sum(c * x[order + i - 1 - j] for j, c in enumerate(coef))
        x.append(r + (pred >> shift))  # python >> floors = arithmetic
    return x


def _undecorrelate(chan: int, subs: list[list[int]]) -> list[list[int]]:
    """Channel assignment 8/9/10 -> [left, right] (RFC 9639 4.1)."""
    a, b = subs
    if chan == 8:     # left-side: b = left - right
        return [a, [l - s for l, s in zip(a, b)]]
    if chan == 9:     # right-side: a = left - right
        return [[r + s for s, r in zip(a, b)], b]
    if chan == 10:    # mid-side: a = (l+r)>>1, b = l-r
        left, right = [], []
        for m, s in zip(a, b):
            m = (m << 1) | (s & 1)
            left.append((m + s) >> 1)
            right.append((m - s) >> 1)
        return [left, right]
    return subs


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode the subset our encoder emits: 16-bit constant / fixed /
    LPC subframes, any rice partition order, mono or stereo with
    per-frame channel decorrelation (independent / left-side /
    right-side / mid-side).  Returns (sample_rate, samples) -- stereo
    interleaved L0 R0 L1 R1 ..."""
    assert data[:4] == b"fLaC"
    pos = 4
    # metadata blocks
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        size = int.from_bytes(hdr[1:4], "big")
        pos += 4 + size
        if last:
            break
    out = []
    sample_rate = None
    while pos < len(data):
        br = BitReader(data[pos:])
        assert br.bits(14) == 0x3FFE, "lost sync"
        br.bits(1)  # reserved
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        chan = br.bits(4)
        assert chan in (0, 1, 8, 9, 10), chan  # mono / indep / decorrelated
        channels = 1 if chan == 0 else 2
        bps_code = br.bits(3)
        assert bps_code == 4  # 16 bit
        br.bits(1)
        # UTF-8 coded frame number
        first = br.bits(8)
        extra = 0
        if first >= 0xC0:
            x = first
            while x & 0x40:
                extra += 1
                x <<= 1
        for _ in range(extra):
            br.bits(8)
        if bs_code == 6:
            n = br.bits(8) + 1
        elif bs_code == 7:
            n = br.bits(16) + 1
        elif bs_code == 1:
            n = 192
        elif 2 <= bs_code <= 5:
            n = 576 << (bs_code - 2)
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 13:
            sample_rate = br.bits(16)
        elif sr_code == 14:
            sample_rate = br.bits(16) * 10
        elif sr_code == 12:
            sample_rate = br.bits(8) * 1000
        got_crc8 = br.bits(8)
        hdr_len = br.pos // 8          # header is byte-aligned here
        assert got_crc8 == _crc8(data[pos:pos + hdr_len - 1]), \
            "frame header CRC-8 mismatch"
        subs = [_decode_subframe(
            br, n, 16 + (ch == (0 if chan == 9 else 1) and chan >= 8))
            for ch in range(channels)]
        subs = _undecorrelate(chan, subs) if chan >= 8 else subs
        for i in range(n):
            for s in subs:
                out.append(s[i])
        br.align()
        got_crc16 = br.bits(16)
        frame_len = br.pos // 8
        assert got_crc16 == _crc16(data[pos:pos + frame_len - 2]), \
            "frame CRC-16 mismatch"
        pos += frame_len
    return sample_rate, np.array(out, np.int32)


def _subframe_types(data: bytes) -> set:
    """Decode a stream recording each subframe's type tag:
    'constant' | 'verbatim' | 'fixed' | 'lpc'."""
    seen = set()
    import tests.test_codecs as m

    real = m._decode_subframe

    def spy(br, n, bps=16):
        pos0 = br.pos
        br.bits(1)
        sub = br.bits(6)
        br.pos = pos0
        seen.add("constant" if sub == 0 else "verbatim" if sub == 1
                 else "fixed" if (sub >> 3) == 1 else "lpc")
        return real(br, n, bps)

    m._decode_subframe = spy
    try:
        decode_flac(data)
    finally:
        m._decode_subframe = real
    return seen


def test_flac_subframe_type_selection():
    """The level-5-parity encoder must actually USE its predictors:
    tonal content -> LPC subframes win; silence -> CONSTANT; and the
    LPC stream must carry a partition order > 0 somewhere (the exact
    Rice partition search isn't a dead knob)."""
    t = np.arange(12 * 4096)
    tone = (9000 * np.sin(2 * np.pi * 700 / 12000 * t)
            + 40 * np.random.default_rng(2).standard_normal(t.size))
    enc = FlacEncoder(12000)
    data = enc.process(tone.astype(np.int16)) + enc.finish()
    assert "lpc" in _subframe_types(data)

    enc = FlacEncoder(12000)
    data = enc.process(np.zeros(3 * 4096, np.int16)) + enc.finish()
    assert _subframe_types(data) == {"constant"}

    # impulsive content: rice stats vary along the frame, so the exact
    # partition search must pick order > 0 for at least one subframe
    rng = np.random.default_rng(7)
    x = (60 * rng.standard_normal(8 * 4096)).astype(np.int16)
    x[::5000] = 28000  # sparse clicks concentrate cost locally
    enc = FlacEncoder(12000)
    data = enc.process(x) + enc.finish()
    sr, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.astype(np.int32))
    # scan partition orders out of the stream via a bits-spy
    orders = []
    real_residual = _decode_residual

    def spy(br, n, order):
        method = br.bits(2)
        po = br.bits(4)
        br.pos -= 6
        orders.append(po)
        return real_residual(br, n, order)

    import tests.test_codecs as m
    m._decode_residual = spy
    try:
        decode_flac(data)
    finally:
        m._decode_residual = real_residual
    assert any(po > 0 for po in orders), orders


def test_flac_stereo_decorrelation():
    """Mono-dominant stereo (the WBFM case: L ~= R) must pick a
    decorrelated channel assignment (side channel near-silent) and
    still decode bit-exact; anti-correlated content must NOT be forced
    into mid-side."""
    rng = np.random.default_rng(4)
    t = np.arange(6 * 4096)
    mono = 9000 * np.sin(2 * np.pi * 600 / 12000 * t)
    l = mono + 60 * rng.standard_normal(t.size)
    r_ = mono + 60 * rng.standard_normal(t.size)
    x = np.stack([l, r_], 1).reshape(-1).astype(np.int16)
    enc = FlacEncoder(12000, channels=2)
    data = enc.process(x) + enc.finish()
    # record channel assignments via the decoder's real frame walk
    # (byte-scanning for 0xFF 0xF8 false-positives inside residuals)
    import tests.test_codecs as m
    assigns = set()
    real_undecorrelate = m._undecorrelate

    def spy(chan, subs):
        assigns.add(chan)
        return real_undecorrelate(chan, subs)

    m._undecorrelate = spy
    try:
        _, got = decode_flac(data)
    finally:
        m._undecorrelate = real_undecorrelate
    assert assigns & {8, 9, 10}, assigns  # decorrelation used
    np.testing.assert_array_equal(got, x.astype(np.int32))
    # anti-correlated: R = -L(ish) -> side = 2L is WORSE than indep
    r2 = -l + 60 * rng.standard_normal(t.size)
    x2 = np.stack([l, r2], 1).reshape(-1).astype(np.int16)
    enc2 = FlacEncoder(12000, channels=2)
    data2 = enc2.process(x2) + enc2.finish()
    _, got2 = decode_flac(data2)
    np.testing.assert_array_equal(got2, x2.astype(np.int32))


def test_flac_roundtrip_random():
    r = np.random.default_rng(0)
    enc = FlacEncoder(12000, blocksize=512)
    x = (r.standard_normal(5000) * 8000).astype(np.int16)
    data = enc.process(x[:3000]) + enc.process(x[3000:]) + enc.finish()
    sr, got = decode_flac(data)
    assert sr == 12000
    np.testing.assert_array_equal(got, x.astype(np.int32))


def test_flac_roundtrip_tonal():
    # tonal content compresses well through the fixed predictors
    t = np.arange(20000)
    x = (12000 * np.sin(2 * np.pi * 440 / 12000 * t)).astype(np.int16)
    enc = FlacEncoder(12000)
    data = enc.process(x) + enc.finish()
    sr, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.astype(np.int32))
    assert len(data) < 2 * x.size  # better than raw int16


def _ar_process(rng, n, coefs, scale):
    """Stable AR(p) driven by white noise, clipped to int16 rails --
    the signal family LPC models exactly."""
    p = len(coefs)
    x = np.zeros(n + p)
    e = rng.standard_normal(n + p) * scale
    for i in range(p, n + p):
        x[i] = np.dot(coefs, x[i - p:i][::-1]) + e[i]
    return np.clip(x[p:], -32768, 32767).astype(np.int16)


def test_flac_lpc_fuzz():
    """Randomized round-trip sweep over the signal classes and header
    variants the serving edge can emit: LPC-favorable AR content near
    the int16 rails, impulsive square waves, random walks, stereo with
    17-bit side-channel extremes, every blocksize-code family
    (192 / 576<<k / 8-bit / 16-bit), the daHz sample-rate path
    (192 kHz), partial final frames down to 1 sample, and multibyte
    UTF-8 frame numbers.  Every stream must decode sample-exact with
    frame CRCs verified (decode_flac checks CRC-8 + CRC-16)."""
    rng = np.random.default_rng(11)

    # 1. near-rail AR(8), 192 kHz (sr code 14 = daHz), 31-sample tail
    ar = _ar_process(rng, 3 * 4096 + 31,
                     [1.8, -0.9, 0.05, -0.02, 0.01, 0.0, 0.005, -0.001],
                     6000)
    enc = FlacEncoder(192000, blocksize=4096)
    data = enc.process(ar) + enc.finish()
    sr, got = decode_flac(data)
    assert sr == 192000
    np.testing.assert_array_equal(got, ar.astype(np.int32))
    assert "lpc" in _subframe_types(data)

    # 2. full-scale square wave (impulsive residuals), blocksize 576
    sq = np.where(np.arange(2 * 576 + 5) % 14 < 7, 32767, -32768)
    enc = FlacEncoder(44100, blocksize=576)
    data = enc.process(sq.astype(np.int16)) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, sq)

    # 3. clipped random walk, blocksize 192 (bs code 1), 1-sample tail
    walk = np.clip(np.cumsum(rng.integers(-900, 900, 4 * 192 + 1)),
                   -32768, 32767).astype(np.int16)
    enc = FlacEncoder(12000, blocksize=192)
    data = enc.process(walk) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, walk.astype(np.int32))

    # 4. stereo rail extremes: side channel hits its 17-bit corners
    n = 2 * 512 + 3
    l = np.full(n, 32767, np.int16)
    r_ = np.full(n, -32768, np.int16)
    r_[::7] = 32767                     # side flips 0 <-> 65535
    x = np.stack([l, r_], 1).reshape(-1)
    enc = FlacEncoder(48000, blocksize=512, channels=2)
    data = enc.process(x) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.astype(np.int32))

    # 5. stereo anti-correlated AR (decorrelation must not hurt)
    a = _ar_process(rng, 3 * 512 + 9, [1.6, -0.7], 3000)
    b = (-a + rng.integers(-50, 50, a.size)).astype(np.int16)
    x = np.stack([a, b], 1).reshape(-1)
    enc = FlacEncoder(48000, blocksize=512, channels=2)
    data = enc.process(x) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.astype(np.int32))

    # 6. full-scale chirp (time-varying spectrum across one frame)
    t = np.arange(4096 + 17)
    ch = (32000 * np.sin(2 * np.pi * (50 + t * 0.03) * t / 48000))
    enc = FlacEncoder(48000, blocksize=4096)
    data = enc.process(ch.astype(np.int16)) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, ch.astype(np.int16).astype(np.int32))


def test_flac_multibyte_frame_numbers():
    """2100 frames crosses both UTF-8 coded-number boundaries (0x80,
    0x800); the header CRC now verified per frame pins the coding."""
    enc = FlacEncoder(12000, blocksize=64)
    x = np.zeros(64 * 2100, np.int16)
    x[::64] = np.arange(2100) % 17      # not all-constant streams
    data = enc.process(x) + enc.finish()
    _, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.astype(np.int32))


def test_flac_process_chunks_bit_identical():
    """process_chunks (one native call per step, per-hop splits) emits
    exactly the bytes of per-hop process() calls -- the serving edge
    swaps the Python hop loop for the C one with an unchanged wire
    stream.  Covers blocksize-straddling chunks and stereo."""
    r = np.random.default_rng(3)
    for channels, clen in ((1, 128), (2, 256), (1, 4096 + 64)):
        e1 = FlacEncoder(12000, channels=channels)
        e2 = FlacEncoder(12000, channels=channels)
        for _ in range(30):
            p = (r.standard_normal((7, clen)) * 9000).astype(np.int16)
            per_hop = [e1.process(p[h]) for h in range(7)]
            assert per_hop == e2.process_chunks(p)
    # and the concatenation still decodes
    e3 = FlacEncoder(12000, blocksize=512)
    x = (r.standard_normal((4, 700)) * 8000).astype(np.int16)
    data = b"".join(e3.process_chunks(x)) + e3.finish()
    sr, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.reshape(-1).astype(np.int32))


def test_flac_output_buffer_grow():
    """The C side consumes input before the output size is known; when
    the pickup buffer is too small the bytes must be STASHED and
    retrieved via phantom_flac_take (dropping them would corrupt the
    stream).  Force the path with a tiny buffer and check the full
    stream still decodes sample-exact."""
    import ctypes

    r = np.random.default_rng(9)
    x = (r.standard_normal((6, 700)) * 8000).astype(np.int16)
    enc = FlacEncoder(12000, blocksize=512)
    enc._cap = 16                      # far below any frame
    enc._out = ctypes.create_string_buffer(enc._cap)
    data = b"".join(enc.process_chunks(x[:3]))
    assert enc._cap > 16               # grew
    enc._cap = 16
    enc._out = ctypes.create_string_buffer(enc._cap)
    data += enc.process(x[3:].reshape(-1))
    data += enc.finish()
    sr, got = decode_flac(data)
    np.testing.assert_array_equal(got, x.reshape(-1).astype(np.int32))


def test_opus_smoke():
    enc = OpusChunkEncoder(12000)
    assert enc.frame_size == 240
    t = np.arange(3000)
    x = (8000 * np.sin(2 * np.pi * 440 / 12000 * t)).astype(np.int16)
    pkts = enc.process(x)
    # 3000 samples > 12 frames of 240 -> at least 11 packets ('>' gate)
    assert len(pkts) >= 11
    assert all(len(p) > 1 for p in pkts)


def test_zstd_stream_per_message_flush():
    import zstandard

    z = ZstdStream()
    d = zstandard.ZstdDecompressor().decompressobj()
    msgs = [bytes([i]) * 100 for i in range(5)]
    for m in msgs:
        comp = z.compress(m)
        assert len(comp) > 0
        got = d.decompress(comp)
        assert got == m  # flush-per-message => immediately decodable


def test_cbor_audio_packet():
    pkt = cbor.audio_packet(7, 100, 150.5, 200, 1.25, b"\x01\x02")
    # map(6): data, frame_num, l, m, pwr, r in sorted key order
    assert pkt[0] == 0xA6
    assert pkt[1:6] == b"\x64data"
    assert pkt[6:9] == b"\x42\x01\x02"
    # doubles encoded as 0xFB + 8 bytes
    assert b"\xfb" in pkt
    import struct
    i = pkt.index(b"\x61m\xfb") + 3
    assert struct.unpack(">d", pkt[i:i + 8])[0] == 150.5


def test_cbor_waterfall_packet():
    pkt = cbor.waterfall_packet(3, 0, 1024, b"\x00" * 4)
    assert pkt[0] == 0xA4
    assert pkt[1:6] == b"\x64data"


def test_opus_high_rate_decimation():
    """WBFM-profile rates (>48 kHz) are decimated before Opus (the
    reference time-stretches instead, src/audio.cpp:59-62)."""
    enc = OpusChunkEncoder(192000)
    assert enc.rate == 48000
    assert enc._decim == 4
    assert enc.frame_size == 960  # 20 ms at 48 kHz
    t = np.arange(19200)
    x = (8000 * np.sin(2 * np.pi * 1000 / 192000 * t)).astype(np.int16)
    pkts = enc.process(x)
    # 19200 in -> 4800 out -> 4 full 960-sample frames ('>' gate)
    assert len(pkts) == 4
    # decimated tone preserved: feed the decimator directly
    enc2 = OpusChunkEncoder(192000)
    y = enc2._decimate(x)
    assert y.size == 4800
    spec = np.abs(np.fft.rfft(y[200:].astype(float)))
    peak = np.fft.rfftfreq(y.size - 200, 1 / 48000)[np.argmax(spec[2:]) + 2]
    assert abs(peak - 1000) < 25


def test_opus_rate_60000_picks_legal_rate():
    # naive ceil(60000/48000)=2 would target 30000 (illegal for Opus);
    # the factor search must land on a legal rate instead
    enc = OpusChunkEncoder(60000)
    assert enc.rate in (48000, 24000, 16000, 12000, 8000)
    assert 60000 % enc._decim == 0
    x = np.zeros(6000, np.int16)
    enc.process(x)  # must not raise


def test_flac_create_rejects_illegal_params():
    """blocksize=0 would make the C encode loop's need==0 an infinite
    loop; blocksize/sample_rate beyond their STREAMINFO field widths
    would silently truncate into a corrupt stream.  Reject at create."""
    for kwargs in (dict(sample_rate=12000, blocksize=0),
                   dict(sample_rate=12000, blocksize=70000),
                   dict(sample_rate=0),
                   dict(sample_rate=1 << 20)):
        with pytest.raises(RuntimeError):
            FlacEncoder(**kwargs)
    FlacEncoder(sample_rate=(1 << 20) - 1, blocksize=65535)  # edges OK


def test_flac_stereo_rejects_odd_sample_count():
    """A half L/R pair would permanently swap the interleave for the
    rest of the stream with no error downstream."""
    enc = FlacEncoder(12000, channels=2)
    with pytest.raises(ValueError):
        enc.process(np.zeros(4097, np.int16))
    with pytest.raises(ValueError):
        enc.process_chunks(np.zeros((2, 333), np.int16))
    data = enc.process(np.zeros(8192, np.int16)) + enc.finish()
    _, got = decode_flac(data)
    assert got.size == 8192  # encoder still healthy after the rejects


def test_opus_decimator_short_input_fabricates_nothing():
    """np.convolve(mode='valid') swaps arguments when the input is
    shorter than the kernel: with only the filter history buffered, a
    sub-decim call must produce ZERO samples, not garbage."""
    e = OpusChunkEncoder(192000)  # decim 4 -> 48 kHz
    assert e._decim == 4
    e.process(np.zeros(1024, np.int16))  # prime the filter history
    out = e._decimate(np.zeros(3, np.int16))
    assert out.size == 0  # 3 < decim: nothing decodable yet
    # the 3 samples were stashed, not lost: one more sample completes
    # the phase and yields exactly one output sample
    out = e._decimate(np.zeros(1, np.int16))
    assert out.size == 1
