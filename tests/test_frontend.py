"""Built-in html/ frontend: wire-protocol mirrors.

This dev image has no browser or JS runtime, so html/{flac,cbor}.js
cannot be executed here.  These tests validate the DESIGN they
implement with faithful Python mirrors of the streaming logic (same
structure, same state machine, same greedy-parse/partial-tail rules):

- FlacStreamMirror == html/flac.js: incremental push() over the real
  FlacEncoder byte stream, with the stream header and frames split at
  adversarial chunk boundaries, must reproduce the golden decoder's
  samples exactly (mono and stereo).
- cbor_try_decode == html/cbor.js cborTryDecode: packets reassembled
  from a byte-dribbled stream (how the deflate chunks arrive) must
  decode to the same objects, returning None on every partial prefix.

Plus static checks that the shipped JS/HTML stay self-contained (no
external resources -- the server may run air-gapped).
"""

import json
import math
import re
from pathlib import Path

import numpy as np
import pytest

from phantomsdr_tpu.runtime import cbor
from phantomsdr_tpu.runtime.codecs import FlacEncoder
from tests.test_codecs import (
    decode_flac, BitReader, signed, _decode_subframe, _undecorrelate,
)

HTML = Path(__file__).resolve().parent.parent / "html"


# ---------------------------------------------------- flac.js mirror

class _Overrun(Exception):
    pass


class _Bits(BitReader):
    """BitReader that raises instead of IndexError past the buffer
    (flac.js FlacBitReader semantics)."""

    def bits(self, n):
        if self.pos + n > len(self.d) * 8:
            raise _Overrun()
        return super().bits(n)


class FlacStreamMirror:
    """Structural mirror of html/flac.js FlacStream."""

    def __init__(self):
        self.buf = b""
        self.got_header = False
        self.channels = 1

    def _header(self):
        b = self.buf
        if len(b) < 4:
            return False
        assert b[:4] == b"fLaC"
        p = 4
        while True:
            if p + 4 > len(b):
                return False
            last = b[p] & 0x80
            size = int.from_bytes(b[p + 1:p + 4], "big")
            if p + 4 + size > len(b):
                return False
            p += 4 + size
            if last:
                break
        self.buf = b[p:]
        self.got_header = True
        return True

    def _frame(self):
        br = _Bits(self.buf)
        assert br.bits(14) == 0x3FFE
        br.bits(2)
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        chan = br.bits(4)
        channels = 1 if chan == 0 else 2
        assert br.bits(3) == 4
        br.bits(1)
        first = br.bits(8)
        extra, x = 0, first
        if first >= 0xC0:
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
            br.bits(16)
        elif sr_code == 14:
            br.bits(16)
        elif sr_code == 12:
            br.bits(8)
        br.bits(8)
        subs = [_decode_subframe(
            br, n, 16 + (ch == (0 if chan == 9 else 1) and chan >= 8))
            for ch in range(channels)]
        if chan >= 8:
            subs = _undecorrelate(chan, subs)
        br.align()
        br.bits(16)
        self.channels = channels
        pcm = []
        for i in range(n):
            for s in subs:
                pcm.append(s[i])
        return pcm, br.pos >> 3

    def push(self, chunk: bytes):
        if chunk:
            self.buf += chunk
        out = []
        if not self.got_header:
            if not self._header():
                return out
        while self.buf:
            try:
                pcm, used = self._frame()
            except _Overrun:
                break
            out.append(pcm)
            self.buf = self.buf[used:]
        return out


def test_flac_js_tracks_decoder_subset():
    """html/flac.js must textually track the encoder's subset (no JS
    runtime here to execute it): LPC subframes, rice partitions, and
    the float-division prediction that dodges JS 32-bit bitwise
    truncation (15-bit coefs x 16-bit samples x order 8 > 2^31)."""
    js = (HTML / "flac.js").read_text()
    for marker in [
        "sub & 0x20",                 # LPC subframe tag
        "(sub & 0x1f) + 1",           # LPC order coding
        "br.bits(4) + 1",             # qlp precision field
        "br.bits(5)",                 # qlp shift field
        "Math.floor(pred / div)",     # >32-bit-safe arithmetic shift
        "const po = br.bits(4)",      # rice partition order
        "x.fill(flacSigned",          # constant subframe
        "crc8 mismatch",              # frame header CRC verified
        "crc16 mismatch",             # frame CRC verified (lockstep
                                      # with tests/test_codecs.py)
    ]:
        assert marker in js, f"html/flac.js missing marker {marker}"


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("split", ["per_hop", "dribble_17", "one_blob"])
def test_flac_stream_mirror(channels, split):
    r = np.random.default_rng(11)
    enc = FlacEncoder(12000, channels=channels)
    hops = [(r.standard_normal(512 * channels) * 7000).astype(np.int16)
            for _ in range(12)]
    stream = b"".join(enc.process(h) for h in hops)
    if split == "per_hop":
        enc2 = FlacEncoder(12000, channels=channels)
        chunks = [enc2.process(h) for h in hops]
    elif split == "dribble_17":
        # worst case: bytes arrive 17 at a time, straddling the stream
        # header, frame headers and rice codes arbitrarily
        chunks = [stream[i:i + 17] for i in range(0, len(stream), 17)]
    else:
        chunks = [stream]
    mirror = FlacStreamMirror()
    got = []
    for c in chunks:
        for pcm in mirror.push(c):
            got.extend(pcm)
    # mirror also tolerates empty pushes (muted keep-alive packets)
    assert mirror.push(b"") == []
    _, want = decode_flac(stream)
    np.testing.assert_array_equal(np.array(got, np.int64), want)
    assert mirror.channels == channels


# ---------------------------------------------------- cbor.js mirror

def cbor_try_decode(b: bytes):
    """Mirror of html/cbor.js cborTryDecode: (value, used) or None if
    the buffer holds only a partial packet."""
    import struct

    pos = [0]

    def need(n):
        if pos[0] + n > len(b):
            raise _Overrun()

    def item():
        need(1)
        ib = b[pos[0]]
        pos[0] += 1
        major, info = ib >> 5, ib & 0x1F
        if info < 24:
            val = info
        elif info == 24:
            need(1); val = b[pos[0]]; pos[0] += 1
        elif info == 25:
            need(2); val = struct.unpack_from(">H", b, pos[0])[0]; pos[0] += 2
        elif info == 26:
            need(4); val = struct.unpack_from(">I", b, pos[0])[0]; pos[0] += 4
        elif info == 27:
            need(8)
            if major == 7:
                v = struct.unpack_from(">d", b, pos[0])[0]
                pos[0] += 8
                return v
            val = struct.unpack_from(">Q", b, pos[0])[0]
            pos[0] += 8
        else:
            raise ValueError(info)
        if major == 0:
            return val
        if major == 1:
            return -1 - val
        if major == 2:
            need(val)
            v = b[pos[0]:pos[0] + val]
            pos[0] += val
            return v
        if major == 3:
            need(val)
            v = b[pos[0]:pos[0] + val].decode()
            pos[0] += val
            return v
        if major == 5:
            out = {}
            for _ in range(val):
                k = item()
                out[k] = item()
            return out
        raise ValueError(major)

    try:
        v = item()
        return v, pos[0]
    except _Overrun:
        return None


def test_cbor_dribble_reassembly():
    pkts = [cbor.audio_packet(7, 0, 512.5, 300, 1.25e-3, b"\x01" * 37),
            cbor.audio_packet(8, 0, 512.5, 300, 0.0, b""),
            cbor.waterfall_packet(9, 1024, 3072, bytes(range(256)) * 4)]
    stream = b"".join(pkts)
    got, buf = [], b""
    for i in range(0, len(stream), 13):
        buf += stream[i:i + 13]
        while True:
            r = cbor_try_decode(buf)
            if r is None:
                break
            got.append(r[0])
            buf = buf[r[1]:]
    assert buf == b""
    assert [g["frame_num"] for g in got] == [7, 8, 9]
    assert got[0]["data"] == b"\x01" * 37
    assert got[0]["pwr"] == pytest.approx(1.25e-3)
    assert got[1]["data"] == b""
    assert got[2]["l"] == 1024 and got[2]["r"] == 3072


# ------------------------------------------------- opus player mirror

@pytest.mark.parametrize("channels", [1, 2])
def test_opus_player_mirror(channels):
    """Mirror of html/app.js opus mode: each CBOR packet's data is ONE
    raw opus packet fed to AudioDecoder({codec:"opus", sampleRate:
    48000}) as an independently-decodable 'key' chunk.  Stand-in:
    OpusChunkDecoder(48000) (same libopus the browser wraps).  The
    encoded tone must come back at its frequency (and, for stereo, in
    its channel)."""
    from phantomsdr_tpu.runtime.codecs import (OpusChunkEncoder,
                                               OpusChunkDecoder)

    fs_in = 12000
    n = fs_in  # 1 s
    t = np.arange(n) / fs_in
    tone = (9000 * np.sin(2 * np.pi * 700 * t)).astype(np.int16)
    if channels == 2:
        pcm = np.stack([tone, np.zeros_like(tone)], 1).reshape(-1)
    else:
        pcm = tone
    enc = OpusChunkEncoder(fs_in, channels=channels)
    packets = enc.process(pcm)        # = the CBOR data fields
    assert len(packets) >= 40         # 20 ms frames
    dec = OpusChunkDecoder(48000, channels)   # the JS config
    out = np.concatenate([dec.decode(p) for p in packets])
    dec.close()
    enc.close()
    x = out.reshape(-1, channels).astype(np.float64) / 32768.0
    skip = x.shape[0] // 4            # codec warmup
    spec = np.abs(np.fft.rfft(x[skip:, 0] * np.hanning(x.shape[0] - skip)))
    freqs = np.fft.rfftfreq(x.shape[0] - skip, 1 / 48000)
    f_peak = freqs[1 + int(np.argmax(spec[1:]))]
    assert abs(f_peak - 700) < 15, f_peak
    if channels == 2:
        # left-only tone stays left through the opus loop (>20 dB)
        pl = np.mean(x[skip:, 0] ** 2)
        pr = np.mean(x[skip:, 1] ** 2)
        assert pl > 100 * pr, (pl, pr)


def test_opus_player_js_markers():
    """app.js must wire the opus path the way the mirror models it."""
    app = (HTML / "app.js").read_text()
    assert 'codec: "opus", sampleRate: 48000' in app
    assert "EncodedAudioChunk" in app
    assert 'type: "key"' in app          # every opus packet standalone
    assert "enqueueAudioData" in app
    assert 'f32-planar' in app


# ------------------------------------------------- shipped-file checks

def test_frontend_is_self_contained():
    """The server may run air-gapped: no external URLs in the shipped
    frontend, and every local resource index.html references exists."""
    idx = (HTML / "index.html").read_text()
    assert "http://" not in idx and "https://" not in idx
    for ref in re.findall(r'(?:src|href)="([^"]+)"', idx):
        assert (HTML / ref).is_file(), f"missing asset {ref}"
    for js in HTML.glob("*.js"):
        t = js.read_text()
        assert "http://" not in t and "https://" not in t
        # balanced delimiters (no JS runtime here to parse for real)
        for o, c in ("{}", "()", "[]"):
            assert t.count(o) == t.count(c), f"{js.name}: unbalanced {o}{c}"


# ---------------------------------------------- tuning-window mirror
# Python mirror of app.js offBins()/windowFor().  Keep in sync with the
# JS (no JS runtime in this image to execute it directly).

def _off_bins(info, hz):
    return math.floor(hz * info["fft_result_size"] / info["total_bandwidth"])


def _window_for(info, m, md):
    R = info["fft_result_size"]
    mi = math.floor(m)
    if md == "USB":
        l, r = mi, mi + _off_bins(info, 3000)
    elif md == "LSB":
        l, r = mi - _off_bins(info, 3000), mi
    elif md == "WBFM":
        l, r = mi - _off_bins(info, 96000), mi + _off_bins(info, 96000)
    else:
        l, r = mi - _off_bins(info, 5000), mi + _off_bins(info, 5000)
    # server rejects l >= R or r >= R (registry.retune): clamp to R-1
    l = max(0, min(R - 1, l))
    r = max(0, min(R - 1, r))
    a = info["audio_max_fft"]
    if r - l > a:
        if md == "LSB":
            l = r - a
        elif md == "USB":
            r = l + a
        else:
            l = max(0, min(R - 1 - a, mi - a // 2))
            r = l + a
    return l, m, r


def test_window_for_real_input_width():
    """offBins must divide by total_bandwidth (sps/2 for real input),
    not sps, or every demod window is half as wide as intended."""
    info = {"fft_result_size": 1 << 19, "total_bandwidth": 500_000,
            "sps": 1_000_000, "audio_max_fft": 99999}
    l, _, r = _window_for(info, 1000.0, "USB")
    assert r - l == 3000 * (1 << 19) // 500_000  # spans 3 kHz of sps/2


def test_window_for_clamps_toward_tuned_bin():
    """When the ideal window exceeds audio_max_fft, the surviving slice
    must stay on the side of the tuned bin that carries the signal."""
    info = {"fft_result_size": 4096, "total_bandwidth": 100_000,
            "sps": 100_000, "audio_max_fft": 64}
    mi = 2000
    # LSB: passband entirely left of m -> keep the carrier at r.
    l, _, r = _window_for(info, mi, "LSB")
    assert r == mi and r - l == 64
    # USB: passband right of m -> keep the carrier at l.
    l, _, r = _window_for(info, mi, "USB")
    assert l == mi and r - l == 64
    # Symmetric modes shrink around m.
    for md in ("AM", "FM", "WBFM"):
        l, _, r = _window_for(info, mi, md)
        assert r - l == 64 and l <= mi <= r
    # Edge safety: windows must be SERVER-ACCEPTABLE at both band
    # edges -- registry.retune rejects l >= R or r >= R, so a window
    # touching R would be silently ignored (dead zone at the edge).
    for mi in (0, 1, 4095, 4096):
        for md in ("USB", "LSB", "AM", "WBFM"):
            l, _, r = _window_for(info, mi, md)
            assert 0 <= l <= r <= 4095
            assert r - l <= info["audio_max_fft"]


def test_window_for_mirror_matches_js():
    """The mirror above must textually track app.js's windowFor."""
    app = (HTML / "app.js").read_text()
    assert "info.fft_result_size / info.total_bandwidth" in app
    assert "l = r - a" in app          # LSB clamp toward carrier
    assert "r = l + a" in app
    assert "mi - Math.floor(a / 2)" in app


# ------------------------------- station labels + keyboard tuning mirror
# Python mirrors of app.js stationsInView()/nextStationBin()/
# tuneStepBins().  Keep in sync with the JS.

def _hz_to_bin(info, hz):
    return (hz - info["basefreq"]) * info["fft_result_size"] \
        / info["total_bandwidth"]


def _stations_in_view(info, stations, view_l, view_r, min_px, width_px):
    out = []
    sx = width_px / (view_r - view_l)
    last_x = -1e9
    for s in stations:
        b = _hz_to_bin(info, s["f"])
        if b < view_l or b > view_r:
            continue
        x = (b - view_l) * sx
        labeled = x - last_x >= min_px
        if labeled:
            last_x = x
        out.append({"x": x, "labeled": labeled,
                    "name": str(s["d"]).split("\n")[0][:18]})
    return out


def _next_station_bin(info, stations, m_bin, direction):
    best = None
    for s in stations:
        b = _hz_to_bin(info, s["f"])
        if b < 0 or b > info["fft_result_size"]:
            continue
        if (b > m_bin + 1) if direction > 0 else (b < m_bin - 1):
            if best is None or ((b < best) if direction > 0 else (b > best)):
                best = b
    return best


_INFO = {"fft_result_size": 1 << 16, "total_bandwidth": 30_000_000,
         "basefreq": 0}


def test_station_labels_in_view():
    """Ticks for every in-view station; names elected with min pixel
    spacing so a crowded band degrades to ticks, not overdraw."""
    stations = [{"f": f, "d": f"Station {i}\nsecond line", "m": "AM"}
                for i, f in enumerate(range(5_950_000, 6_200_000, 5_000))]
    # zoomed out: all 50 get ticks, labels are thinned by spacing
    sv = _stations_in_view(_INFO, stations, 12000, 14000, 70, 1024)
    in_view = [s for s in stations
               if 12000 <= _hz_to_bin(_INFO, s["f"]) <= 14000]
    assert len(sv) == len(in_view) > 10
    labeled = [s for s in sv if s["labeled"]]
    assert 0 < len(labeled) < len(sv)
    xs = [s["x"] for s in labeled]
    assert all(b - a >= 70 for a, b in zip(xs, xs[1:]))
    # first line only, truncated
    assert all("\n" not in s["name"] and len(s["name"]) <= 18 for s in sv)
    # zoomed in tight: the lone station in view is labeled
    b = _hz_to_bin(_INFO, stations[10]["f"])
    one = _stations_in_view(_INFO, stations, b - 2, b + 2, 70, 1024)
    assert len(one) == 1 and one[0]["labeled"]


def test_station_jump_next_prev():
    stations = [{"f": f, "d": "x", "m": "AM"}
                for f in (5_000_000, 6_000_000, 7_000_000)]
    m = _hz_to_bin(_INFO, 6_000_000)
    nxt = _next_station_bin(_INFO, stations, m, +1)
    prv = _next_station_bin(_INFO, stations, m, -1)
    assert nxt == pytest.approx(_hz_to_bin(_INFO, 7_000_000))
    assert prv == pytest.approx(_hz_to_bin(_INFO, 5_000_000))
    # at the band edges: no wraparound
    assert _next_station_bin(_INFO, stations,
                             _hz_to_bin(_INFO, 7_000_000), +1) is None
    assert _next_station_bin(_INFO, stations,
                             _hz_to_bin(_INFO, 5_000_000), -1) is None


def test_keyboard_tuning_js_markers():
    app = (HTML / "app.js").read_text()
    assert "shortwavestations.json" in app     # DB consumed by the UI
    assert "stationsInView" in app and "nextStationBin" in app
    assert "TUNE_STEP_HZ" in app and "keydown" in app
    # step table: mode-dependent Hz steps, shift multiplies
    assert "USB: 100" in app and "WBFM: 100000" in app
    assert "shift ? 10 : 1" in app
    idx = (HTML / "index.html").read_text()
    assert "keys-help" in idx                  # discoverability


def test_frontend_commands_match_server_surface():
    """Every cmd the frontend sends is one the server handles."""
    app = (HTML / "app.js").read_text()
    sent = set(re.findall(r'cmd:\s*"(\w+)"', app))
    # no "compression": since zstd.js the frontend consumes the STOCK
    # zstd stream (the server's deflate extension remains for other
    # clients and is covered by tests/test_server.py)
    assert sent == {"window", "demodulation", "mute", "nr", "rds",
                    "am_sync"}
    server = Path(HTML, "..", "phantomsdr_tpu", "runtime",
                  "server.py").read_text()
    for c in sent:
        assert f'"{c}"' in server, f"server missing handler for {c}"
