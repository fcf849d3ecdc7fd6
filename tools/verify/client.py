"""End-to-end verification client for the variants in ``captures.py``.

Connects ``/audio`` (and ``/waterfall`` + ``/events`` for the base
check), drives the JSON command surface, reassembles the FLAC stream
out of the CBOR packets, decodes it (tests/test_codecs.decode_flac) and
asserts the signal-level ground truth from ``truth.json``:

    tone    demodulated 1 kHz tone at its expected Hz; waterfall peak
            at the carrier bin; survives protocol garbage probes
    am      two listeners, default (PLL) vs envelope opt-out: the PLL
            ear's H2/H1 must be clean, the envelope ear's must fold
    stereo  2-channel FLAC; >20 dB L/R separation at 800/1300 Hz
    rds     {"type":"rds"} frames assemble the exact PI / PS / RT
    both    stereo AND rds against one server (shared pilot path)
    nr      floor drop >4 dB when {"cmd":"nr"} flips on, tone kept
    de      decoded 10k/1k ratio matches the 75 us single-pole response

Exit 0 = PASS (prints one JSON line per check), nonzero = FAIL.

Usage:
    python tools/verify/client.py --dir /tmp/verify1 [--secs 8]
(the server must already be running on truth.json's port; see the
verify skill for the launch line.)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


# ----------------------------------------------------- CBOR decoding

def cbor_decode(data: bytes):
    """Minimal decoder for the server's nlohmann-compatible packets
    (maps, text/byte strings, ints, 64-bit doubles)."""
    obj, pos = _cb(data, 0)
    return obj


def _cb(b: bytes, p: int):
    ib = b[p]
    major, info = ib >> 5, ib & 0x1F
    p += 1
    if info < 24:
        val = info
    elif info == 24:
        val = b[p]; p += 1
    elif info == 25:
        val = struct.unpack_from(">H", b, p)[0]; p += 2
    elif info == 26:
        val = struct.unpack_from(">I", b, p)[0]; p += 4
    elif info == 27:
        val = struct.unpack_from(">Q", b, p)[0]; p += 8
    else:
        raise ValueError(f"cbor info {info}")
    if major == 0:
        return val, p
    if major == 1:
        return -1 - val, p
    if major == 2:
        return b[p:p + val], p + val
    if major == 3:
        return b[p:p + val].decode("utf-8"), p + val
    if major == 4:
        out = []
        for _ in range(val):
            v, p = _cb(b, p)
            out.append(v)
        return out, p
    if major == 5:
        out = {}
        for _ in range(val):
            k, p = _cb(b, p)
            v, p = _cb(b, p)
            out[k] = v
        return out, p
    if major == 7:
        if info == 27:  # the 8 bytes were already consumed as "val"
            return struct.unpack(">d", struct.pack(">Q", val))[0], p
        if info == 26:
            return struct.unpack(">f", struct.pack(">I", val))[0], p
        if info in (20, 21):
            return info == 21, p
        if info == 22:
            return None, p
    raise ValueError(f"cbor major {major} info {info}")


# ------------------------------------------------------ audio helpers

def decode_audio(chunks: list[bytes], channels: int, trim: int = 0,
                 compression: str = "flac"):
    """Decode the audio stream; `trim` discards that many leading
    samples per channel (PLL lock / AGC ramp settle).  FLAC: reassemble
    the stream and decode (tests/test_codecs).  Opus: one raw opus
    packet per CBOR data field, decoded at 48 kHz with the libopus
    binding -- the exact flow html/app.js runs through WebCodecs
    AudioDecoder."""
    if compression == "opus":
        from phantomsdr_tpu.runtime.codecs import OpusChunkDecoder

        dec = OpusChunkDecoder(48000, channels)
        pcm = [dec.decode(bytes(c)) for c in chunks if len(c)]
        dec.close()
        samples = (np.concatenate(pcm) if pcm
                   else np.zeros(0, np.int16))
        sr = 48000
    else:
        from tests.test_codecs import decode_flac
        sr, samples = decode_flac(b"".join(chunks))
    x = samples.astype(np.float64) / 32768.0
    if channels == 2:
        return sr, x[0::2][trim:], x[1::2][trim:]
    return sr, x[trim:], None


def tone_power(x: np.ndarray, fs: float, f: float, bw: float = 30.0):
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft(x * w)) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    sel = (freqs > f - bw) & (freqs < f + bw)
    return spec[sel].max() if sel.any() else 0.0


async def collect_audio(session, url, secs, cmds=(), text_frames=None,
                        probes=False, settle=0.0):
    """Connect /audio, send cmds, collect ALL binary CBOR payload
    chunks for secs+settle (FLAC can only be decoded from the stream
    start — `settle` seconds are trimmed as decoded SAMPLES afterwards,
    the chunks themselves must all be kept)."""
    import aiohttp
    import time

    chunks, info = [], None
    async with session.ws_connect(url + "/audio", max_msg_size=1 << 22) as ws:
        info = json.loads((await ws.receive(timeout=120)).data)  # bounded: a wedged server must fail, not hang
        for c in cmds:
            await ws.send_str(json.dumps(c))
        if probes:
            await ws.send_str("this is not json {{{")
            await ws.send_str(json.dumps(
                {"cmd": "window", "l": -5, "r": 1e9, "m": 0}))
            await ws.send_str(json.dumps(
                {"cmd": "demodulation", "demodulation": "XYZZY"}))
            await ws.send_str("A" * 5000)
        t_end = time.monotonic() + secs + settle
        while time.monotonic() < t_end:
            try:
                msg = await ws.receive(
                    timeout=max(t_end - time.monotonic(), 0.05))
            except asyncio.TimeoutError:
                break
            if msg.type == aiohttp.WSMsgType.BINARY:
                pkt = cbor_decode(msg.data)
                chunks.append(pkt["data"])
            elif msg.type == aiohttp.WSMsgType.TEXT:
                if text_frames is not None:
                    text_frames.append(json.loads(msg.data))
            else:
                break
    return info, chunks


async def collect_ab_audio(session, url, secs, cmds, fs, settle=1.5,
                           extra=({"cmd": "nr", "enabled": True},)):
    """The A/B pattern the NR-family checks share: collect one
    connection without the opt-in commands and one with, decode both,
    trim the settle.  Returns (x_off, x_on), each mean-removed."""
    out = []
    for add in ((), tuple(extra)):
        _, chunks = await collect_audio(
            session, url, secs, list(cmds) + list(add), settle=settle)
        _, x, _ = decode_audio(chunks, 1, int(settle * fs))
        out.append(x - x.mean())
    return out


def row_peak(raw, hl, hr):
    """Full-resolution peak bin of one waterfall row whose wire coords
    are [hl, hr).  A strong carrier CLIPS a run of bins at int8 127
    (exact int8-dB parity with the reference quantizer), so take the
    centroid of the max-valued run, not argmax's first bin.  Returns
    (peak_bin, scale) with scale = 1 << level."""
    scale = max(1, round((hr - hl) / len(raw)))
    peak = hl + float(np.mean(np.nonzero(raw == raw.max())[0])) * scale
    return peak, scale


async def check_waterfall_av1(session, url, truth):
    """AV1-mode /waterfall: binary frames are raw AV1 temporal units;
    decode with the libaom binding (lossless ⇒ rows bit-exact) and
    read the per-line l/r out of the zstd'd T.35 metadata OBU."""
    import struct

    import aiohttp
    import zstandard

    from phantomsdr_tpu.runtime.av1 import AV1Decoder
    from tests.test_av1 import parse_obus, OBU_METADATA

    dec = AV1Decoder()
    rows = peak_ok = 0
    async with session.ws_connect(url + "/waterfall",
                                  max_msg_size=1 << 22) as ws:
        info = json.loads((await ws.receive(timeout=120)).data)  # bounded: a wedged server must fail, not hang
        assert info["waterfall_compression"] == "av1"
        rsize = info["fft_result_size"]
        m_bin = (0.5 + truth["f_off_hz"] / truth["sps"]) * rsize
        span = min(2048, rsize)
        l0 = int(max(0, min(rsize - span, m_bin - span / 2)))
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": l0, "r": l0 + span}))
        # AV1 frames flush every 8 lines (~1.2 s at 7 rows/s)
        for _ in range(6):
            try:
                msg = await ws.receive(timeout=6)
            except asyncio.TimeoutError:
                break
            if msg.type != aiohttp.WSMsgType.BINARY:
                continue
            frames = dec.decode(msg.data)
            meta = [p for t, p in parse_obus(msg.data)
                    if t == OBU_METADATA][0]
            blob = zstandard.ZstdDecompressor().decompress(
                bytes(meta[2:]), max_output_size=1 << 16)
            for frame in frames:
                for line in range(frame.shape[0]):
                    fn, nb, hl, hr = struct.unpack_from(
                        "<QIII", blob, line * 24)
                    if nb == 0:
                        continue
                    rows += 1
                    peak, scale = row_peak(frame[line, :nb], hl, hr)
                    if abs(peak - m_bin) < 16 * scale + 8:
                        peak_ok += 1
            if peak_ok >= 3:
                break
    dec.close()
    assert rows > 0, "no av1 waterfall lines"
    assert peak_ok >= 1, "av1 waterfall peak never at carrier bin"
    return {"waterfall_rows": rows, "peak_ok": peak_ok, "codec": "av1"}


async def check_waterfall(session, url, truth):
    """One /waterfall connection: zstd rows present, peak bin at the
    carrier, l<<level coordinate scaling consistent."""
    import aiohttp

    # one streaming decompressor per connection: the server flushes the
    # SAME zstd stream once per message (waterfallcompression.cpp:24-37)
    try:
        import zstandard
        dobj = zstandard.ZstdDecompressor().decompressobj()
        dec = dobj.decompress
    except ImportError:
        dec = None
    # live cross-check of the built-in frontend's from-scratch zstd
    # decoder (html/zstd.js, via its Python mirror) on the real wire
    try:
        from tests.zstd_mirror import ZstdStream as MirrorZstd
        mirror = MirrorZstd()
    except ImportError:
        mirror = None
    rows = 0
    async with session.ws_connect(url + "/waterfall",
                                  max_msg_size=1 << 22) as ws:
        info = json.loads((await ws.receive(timeout=120)).data)  # bounded: a wedged server must fail, not hang
        rsize = info["fft_result_size"]
        m_bin = (0.5 + truth["f_off_hz"] / truth["sps"]) * rsize
        span = min(2048, rsize)
        l = int(max(0, min(rsize - span, m_bin - span / 2)))
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": l, "r": l + span}))
        peak_ok = 0
        for _ in range(12):
            try:
                msg = await ws.receive(timeout=4)
            except asyncio.TimeoutError:
                break
            if msg.type != aiohttp.WSMsgType.BINARY:
                continue
            if dec is None:
                rows += 1
                continue
            # wire = zstd(CBOR{data, frame_num, l, r}): the whole CBOR
            # packet rides the per-client zstd stream
            blob = dec(msg.data)
            if mirror is not None:
                got = mirror.push(msg.data)
                assert got == blob, (
                    "frontend zstd mirror diverged from libzstd on live "
                    f"wire bytes ({len(got)} vs {len(blob)})")
            pkt = cbor_decode(blob)
            rows += 1
            raw = np.frombuffer(bytes(pkt["data"]), dtype=np.int8)
            if not len(raw):
                continue
            # packet l/r are full-resolution coords (sl << level), the
            # row is at level resolution (see row_peak)
            peak, scale = row_peak(raw, pkt["l"], pkt["r"])
            if abs(peak - m_bin) < 16 * scale + 8:
                peak_ok += 1
            if peak_ok >= 3:
                break
    assert rows > 0, "no waterfall rows"
    if dec is not None:
        assert peak_ok >= 1, "waterfall peak never at carrier bin"
    return {"waterfall_rows": rows, "peak_ok": peak_ok if dec else None}


async def check_events(session, url):
    import aiohttp
    async with session.ws_connect(url + "/events") as ws:
        msg = await ws.receive(timeout=5)
        assert msg.type == aiohttp.WSMsgType.TEXT
        return json.loads(msg.data)


# ----------------------------------------------------------- variants

def _audio_cmds(info, truth, mode):
    rsize = info["fft_result_size"]
    m = (0.5 + truth["f_off_hz"] / truth["sps"]) * rsize
    if mode == "WBFM":
        off = 96_000 * rsize // truth["sps"]
        mode = "FM"
    elif mode == "AM":
        off = 5_000 * rsize // truth["sps"]
    else:
        off = 3_000 * rsize // truth["sps"]
    return [{"cmd": "window", "l": int(m - off), "m": m,
             "r": int(m + off)},
            {"cmd": "demodulation", "demodulation": mode}]


async def run(args):
    import aiohttp

    d = Path(args.dir)
    truth = json.loads((d / "truth.json").read_text())
    if args.port:
        truth["port"] = args.port
    url = f"http://127.0.0.1:{truth['port']}"
    variant = truth["variant"]
    results = {}
    async with aiohttp.ClientSession(
            connector=aiohttp.TCPConnector(limit=0)) as s:
        # handshake probe connection to learn geometry for the cmds
        info, _ = await collect_audio(s, url, 0.1)
        for k in ("sps", "fft_size", "fft_result_size", "basefreq"):
            assert k in info, f"basic_info missing {k}"
        assert info["sps"] == truth["sps"]
        fs = info["audio_max_sps"]
        ch = info.get("audio_channels", 1)

        if variant == "tone":
            comp = info.get("audio_compression", "flac")
            dec_fs = 48000 if comp == "opus" else fs
            cmds = _audio_cmds(info, truth, "AM")
            _, chunks = await collect_audio(
                s, url, args.secs, cmds, probes=True, settle=1.0)
            sr, x, _ = decode_audio(chunks, 1, int(1.0 * dec_fs), comp)
            fs = dec_fs
            w = np.hanning(len(x))
            spec = np.abs(np.fft.rfft((x - x.mean()) * w))
            freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
            f_peak = freqs[1 + int(np.argmax(spec[1:]))]
            assert abs(f_peak - truth["tone_hz"]) < 20, \
                f"tone at {f_peak:.1f} Hz, wanted {truth['tone_hz']}"
            results["tone"] = {"f_peak_hz": round(float(f_peak), 1),
                               "n_samples": len(x)}
            if info.get("waterfall_compression") == "av1":
                results["waterfall"] = await check_waterfall_av1(
                    s, url, truth)
            else:
                results["waterfall"] = await check_waterfall(s, url, truth)
            ev = await check_events(s, url)
            results["events"] = {"keys": sorted(ev)[:4]}

        elif variant == "am":
            cmds = _audio_cmds(info, truth, "AM")
            (_, pll), (_, env) = await asyncio.gather(
                collect_audio(s, url, args.secs, cmds, settle=1.5),
                collect_audio(s, url, args.secs,
                              cmds + [{"cmd": "am_sync",
                                       "enabled": False}], settle=1.5))
            out = {}
            for name, chunks in (("pll", pll), ("envelope", env)):
                _, x, _ = decode_audio(chunks, 1, int(1.5 * fs))
                x = x - x.mean()
                h1 = tone_power(x, fs, truth["tone_hz"])
                h2 = tone_power(x, fs, 2 * truth["tone_hz"])
                out[name] = round(float(np.sqrt(h2 / max(h1, 1e-30))), 3)
            assert out["pll"] < 0.1, f"PLL ear folds: H2/H1={out['pll']}"
            assert out["envelope"] > 0.25, \
                f"envelope ear did not fold: H2/H1={out['envelope']}"
            results["am_h2_h1"] = out

        elif variant in ("stereo", "both", "soak"):
            assert ch == 2, "server not advertising 2-channel audio"
            cmds = _audio_cmds(info, truth, "WBFM")
            text = None if variant == "stereo" else []
            if text is not None:
                cmds.append({"cmd": "rds", "enabled": True})
            comp = info.get("audio_compression", "flac")
            if comp == "opus":
                fs = 48000  # opus decodes at 48 kHz (decimated stereo)
            _, chunks = await collect_audio(
                s, url, args.secs, cmds, text_frames=text, settle=2.0)
            sr, L, R = decode_audio(chunks, 2, int(2.0 * fs), comp)
            lp_l = tone_power(L, fs, truth["left_hz"])
            lp_r = tone_power(R, fs, truth["left_hz"])
            rp_r = tone_power(R, fs, truth["right_hz"])
            rp_l = tone_power(L, fs, truth["right_hz"])
            sep_l = 10 * np.log10(lp_l / max(lp_r, 1e-30))
            sep_r = 10 * np.log10(rp_r / max(rp_l, 1e-30))
            assert sep_l > 20 and sep_r > 20, \
                f"separation L={sep_l:.1f} R={sep_r:.1f} dB"
            results["stereo_sep_db"] = [round(float(sep_l), 1),
                                        round(float(sep_r), 1)]
            if text is not None:
                results["rds"] = _check_rds(text, truth)

        elif variant == "rds":
            assert info.get("rds_available"), "rds_available false"
            cmds = _audio_cmds(info, truth, "WBFM")
            cmds.append({"cmd": "rds", "enabled": True})
            text = []
            _, chunks = await collect_audio(
                s, url, args.secs, cmds, text_frames=text)
            results["rds"] = _check_rds(text, truth)

        elif variant == "nr":
            assert info.get("nr_available"), "nr_available false"
            cmds = _audio_cmds(info, truth, "AM")
            ab = await collect_ab_audio(s, url, args.secs, cmds, fs)
            out = {}
            for name, x in zip(("off", "on"), ab):
                n_win = max(1, len(x) // (fs // 4))
                wins = np.array_split(x, n_win)
                floors = sorted(float(np.sqrt(np.mean(w ** 2)))
                                for w in wins)
                out[name] = {
                    "floor": floors[0],
                    "tone": float(np.sqrt(tone_power(
                        x, fs, truth["tone_hz"]))),
                }
            drop_db = 20 * np.log10(out["off"]["floor"]
                                    / max(out["on"]["floor"], 1e-30))
            tone_db = 20 * np.log10(out["on"]["tone"]
                                    / max(out["off"]["tone"], 1e-30))
            assert drop_db > 4, f"floor only dropped {drop_db:.1f} dB"
            assert tone_db > -6, f"tone lost {tone_db:.1f} dB"
            results["nr"] = {"floor_drop_db": round(float(drop_db), 1),
                             "tone_delta_db": round(float(tone_db), 1)}

        elif variant == "lms":
            # LMS keeps the STEADY tone (predictable) and adapts the
            # noise away; the reference's 4x output gain raises both
            # absolute levels, so judge by the tone/noise RATIO
            assert info.get("nr_available"), "nr_available false"
            cmds = _audio_cmds(info, truth, "AM")
            ab = await collect_ab_audio(s, url, args.secs, cmds, fs,
                                        settle=2.5)
            snr = {}
            for name, x in zip(("off", "on"), ab):
                w = np.hanning(len(x))
                spec = np.abs(np.fft.rfft(x * w)) ** 2
                freqs = np.fft.rfftfreq(len(x), 1.0 / fs)
                sig = (freqs > 970) & (freqs < 1030)
                noise = (freqs > 200) & (freqs < 4500) & ~sig
                snr[name] = 10 * np.log10(
                    spec[sig].max() / max(np.mean(spec[noise]), 1e-30))
            gain_db = snr["on"] - snr["off"]
            assert gain_db > 6, f"LMS SNR gain only {gain_db:.1f} dB"
            results["lms_snr_db"] = {k: round(float(v), 1)
                                     for k, v in snr.items()}

        elif variant == "nb":
            # judge by the COUNT of samples above 4x rms (impulses in
            # the reference's frame-start blind zone survive, NB.c:209)
            assert info.get("nr_available"), "nr_available false"
            rsize = info["fft_result_size"]
            m = (0.5 + truth["f_off_hz"] / truth["sps"]) * rsize
            off_w = int(truth["wide_hz"] * rsize / truth["sps"])
            cmds = [{"cmd": "window", "l": int(m - off_w), "m": m,
                     "r": int(m + off_w)},
                    {"cmd": "demodulation", "demodulation": "AM"}]
            ab = await collect_ab_audio(s, url, args.secs, cmds, fs)
            counts = {}
            for name, x in zip(("off", "on"), ab):
                thr = 4.0 * np.sqrt(np.mean(x ** 2))
                counts[name] = int(np.sum(np.abs(x) > thr))
            assert counts["off"] > 20, \
                f"clicks not visible pre-NB ({counts['off']})"
            assert counts["on"] < 0.6 * counts["off"], \
                f"NB removed too little: {counts['off']} -> {counts['on']}"
            results["nb_click_samples"] = counts

        elif variant == "de":
            assert info.get("deemphasis") == truth["tau_us"]
            cmds = _audio_cmds(info, truth, "WBFM")
            _, chunks = await collect_audio(
                s, url, args.secs, cmds, settle=2.0)
            _, x, _ = decode_audio(chunks, 1, int(2.0 * fs))
            x = x - x.mean()
            a_lo = np.sqrt(tone_power(x, fs, truth["tone_lo_hz"]))
            a_hi = np.sqrt(tone_power(x, fs, truth["tone_hi_hz"]))
            tau = truth["tau_us"] * 1e-6
            resp = lambda f: 1.0 / np.sqrt(1 + (2 * np.pi * f * tau) ** 2)
            expect = resp(truth["tone_hi_hz"]) / resp(truth["tone_lo_hz"])
            got = a_hi / max(a_lo, 1e-30)
            assert abs(got - expect) / expect < 0.15, \
                f"10k/1k ratio {got:.4f}, theory {expect:.4f}"
            results["deemph_ratio"] = {"got": round(float(got), 4),
                                       "theory": round(float(expect), 4)}
        else:
            raise SystemExit(f"no client check for variant {variant!r}")
    print(json.dumps({"variant": variant, "pass": True, **results}))


def _check_rds(frames, truth):
    assert frames, "no rds text frames"
    last = frames[-1]
    assert last.get("type") == "rds"
    synced = [f for f in frames if f.get("synced")]
    assert synced, "rds never synced"
    fin = synced[-1]
    assert fin.get("pi") == truth["pi"], f"PI {fin.get('pi')}"
    assert fin.get("ps") == truth["ps"], f"PS {fin.get('ps')!r}"
    assert fin.get("rt") == truth["rt"], f"RT {fin.get('rt')!r}"
    return {"frames": len(frames), "synced": len(synced),
            "pi": fin["pi"], "ps": fin["ps"], "rt": fin["rt"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True,
                    help="capture dir made by captures.py (truth.json)")
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--port", type=int, default=0,
                    help="override truth.json's port (e.g. a cluster "
                         "follower's)")
    args = ap.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
