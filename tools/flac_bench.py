"""Measure the FLAC LPC compression gain and encode cost, A/B vs the
fixed-predictors-only round-4 encoder (phantom_flac_set_lpc toggle).

The reference encodes every listener at libFLAC compression level 5
(/root/reference/src/signal.cpp:17-28, src/audio.cpp:38-44: LPC order
<= 8 + rice partitioning); round 4's encoder shipped fixed predictors
only, leaving per-client audio bytes/s materially above the
reference's.  This tool measures what the round-5 LPC + partition
encoder buys.

Two modes:

  default (synthetic): audio classes shaped like the verify captures'
    demodulated output --
      tone     1 kHz sine + small floor (tone variant demod)
      am       program-like multitone, high SNR (am variant class)
      voice    voice-like pink noise with syllabic envelope
      stereo   192 kHz 2-channel WBFM audio (stereo variant class)
      noisy    multitone at ~35 dB SNR: documents the entropy-bound
               case where NO encoder can win (the floor dominates;
               measured exhaustive-order search gains <3% here too)
      silence  muted/idle channel (constant-subframe path)

  --live: runs the real pipeline (tools/verify captures + server on
    CPU) for tone/am/stereo, collects each variant's actual FLAC
    stream, decodes it back to the exact int16 PCM (lossless), and
    re-encodes that A/B.  This is the claim-of-record measurement.

Prints one JSON line per signal plus a summary; exits nonzero if the
mean gain over the scored signals is < 15% (the VERDICT-r4 bar).
`noisy` and `silence` are excluded from the score (documented bounds,
not targets).
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from phantomsdr_tpu.runtime.codecs import FlacEncoder  # noqa: E402


def _tone(n, sps, rng):
    t = np.arange(n)
    x = 0.5 * np.sin(2 * np.pi * 1000 / sps * t)
    x += 0.003 * rng.standard_normal(n)
    return x


def _am(n, sps, rng):
    t = np.arange(n)
    x = np.zeros(n)
    for f, a in ((440, 0.3), (880, 0.15), (1320, 0.08), (2500, 0.04)):
        x += a * np.sin(2 * np.pi * f / sps * t + rng.uniform(0, 6))
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.3 / sps * t)
    x += 0.001 * rng.standard_normal(n)
    return x


def _noisy(n, sps, rng):
    return _am(n, sps, rng) + 0.01 * rng.standard_normal(n)


def _voice(n, sps, rng):
    # formant-synthesized vowel: 120 Hz glottal pulse train through
    # three resonators (classic source-filter voice model; LPC-8 can
    # model the 6 poles, which is exactly why codecs use LPC on speech)
    pitch = 120.0
    src = np.zeros(n)
    period = sps / pitch
    k = np.arange(int(n / period))
    src[(k * period).astype(int)] = 1.0
    src += 0.02 * rng.standard_normal(n)
    x = src
    for fc, bw in ((500, 60), (1500, 90), (2500, 120)):
        r = np.exp(-np.pi * bw / sps)
        b1 = 2 * r * np.cos(2 * np.pi * fc / sps)
        b2 = -r * r
        y = np.zeros(n)
        y1 = y2 = 0.0
        for i in range(n):
            y0 = x[i] + b1 * y1 + b2 * y2
            y2, y1 = y1, y0
            y[i] = y0
        x = y
    x /= np.abs(x).max() + 1e-9
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3 / sps * np.arange(n))
    return 1.6 * x * env


def _stereo(n, sps, rng):
    t = np.arange(n)
    left = 0.4 * np.sin(2 * np.pi * 800 / sps * t)
    right = 0.4 * np.sin(2 * np.pi * 1300 / sps * t)
    noise = 0.002 * rng.standard_normal((n, 2))
    x = np.stack([left, right], axis=1) + noise
    return x.reshape(-1)


def _stereo_mono_dom(n, sps, rng):
    # real broadcast stereo is mono-dominant: shared program + a small
    # L-R difference -- the adaptive mid-side case (round 5)
    t = np.arange(n)
    mono = 0.4 * np.sin(2 * np.pi * 800 / sps * t) \
        + 0.15 * np.sin(2 * np.pi * 2500 / sps * t)
    diff = 0.04 * np.sin(2 * np.pi * 1300 / sps * t)
    noise = 0.002 * rng.standard_normal((n, 2))
    x = np.stack([mono + diff, mono - diff], axis=1) + noise
    return x.reshape(-1)


def measure(name, samples, sps, channels):
    """Encode int16 interleaved `samples` with and without LPC;
    round-trips both through the from-spec decoder."""
    frames = max(samples.size // (4096 * channels), 1)
    out = {"signal": name, "sps": sps, "channels": channels,
           "seconds": round(samples.size / channels / sps, 2)}
    for mode in ("fixed", "lpc"):
        enc = FlacEncoder(sps, channels=channels)
        enc.set_lpc(mode == "lpc")
        t0 = time.perf_counter()
        data = enc.process(samples) + enc.finish()
        dt = time.perf_counter() - t0
        out[f"bytes_{mode}"] = len(data)
        out[f"us_per_frame_{mode}"] = round(1e6 * dt / frames, 1)
        from tests.test_codecs import decode_flac
        _, got = decode_flac(data)
        np.testing.assert_array_equal(got, samples.astype(np.int32))
    out["gain_pct"] = round(
        100 * (1 - out["bytes_lpc"] / out["bytes_fixed"]), 2)
    return out


# ------------------------------------------------------------- live mode

async def _collect_pcm(variant, port, secs):
    """Launch the verify server for `variant` on CPU, collect the live
    FLAC stream, decode to the exact int16 PCM it carried."""
    import asyncio

    import aiohttp

    sys.path.insert(0, str(REPO / "tools" / "verify"))
    from client import collect_audio, _audio_cmds  # noqa: E402
    from tests.test_codecs import decode_flac  # noqa: E402

    out = Path(f"/tmp/flacbench_{variant}")
    subprocess.run(
        [sys.executable, "tools/verify/captures.py", "--variant", variant,
         "--out", str(out), "--port", str(port)],
        check=True, cwd=REPO, capture_output=True)
    log = open(out / "server.log", "w")
    srv = subprocess.Popen(
        [sys.executable, "-m", "phantomsdr_tpu", "-c",
         str(out / "config.toml"), "--input-file",
         str(out / "capture.s16"), "--loop", "--throttle",
         "--platform", "cpu"],
        stdout=log, stderr=log, cwd=REPO)
    try:
        url = f"http://127.0.0.1:{port}"
        truth = json.loads((out / "truth.json").read_text())
        deadline = time.monotonic() + 120
        async with aiohttp.ClientSession() as s:
            while True:  # wait for serving to start (cold jit compile)
                try:
                    async with s.get(url + "/metrics") as r:
                        if (json.loads(await r.text())["frames"] or 0) > 0:
                            break
                except Exception:
                    pass
                if time.monotonic() > deadline:
                    raise RuntimeError(f"{variant}: server never served")
                await asyncio.sleep(1.0)
            info, _ = await collect_audio(s, url, 0.1)
            mode = "WBFM" if variant == "stereo" else "AM"
            cmds = _audio_cmds(info, truth, mode)
            _, chunks = await collect_audio(s, url, secs, cmds)
        sr, samples = decode_flac(b"".join(chunks))
        channels = info.get("audio_channels", 1)
        return sr, channels, samples.astype(np.int16)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()  # don't mask the in-flight error / leak the port
            srv.wait()
        log.close()


def live_rows(secs):
    import asyncio

    rows = []
    for variant, port in (("tone", 19601), ("am", 19602),
                          ("stereo", 19603)):
        sr, ch, pcm = asyncio.run(_collect_pcm(variant, port, secs))
        rows.append(measure(f"live_{variant}", pcm, sr, ch))
        print(json.dumps(rows[-1]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40,
                    help="4096-sample FLAC frames per synthetic signal")
    ap.add_argument("--live", action="store_true",
                    help="measure on real verify-pipeline audio")
    ap.add_argument("--secs", type=float, default=20.0,
                    help="live collection seconds per variant")
    args = ap.parse_args()

    if args.live:
        rows = live_rows(args.secs)
        scored = rows
    else:
        rng = np.random.default_rng(5)
        n = args.frames * 4096
        rows = []
        for name, sps, channels, gen in (
            ("tone", 12000, 1, _tone),
            ("am", 12000, 1, _am),
            ("voice", 12000, 1, _voice),
            ("stereo", 192000, 2, _stereo),
            ("stereo_mono_dom", 192000, 2, _stereo_mono_dom),
            ("noisy", 12000, 1, _noisy),
            ("silence", 12000, 1, lambda nn, s, r: np.zeros(nn)),
        ):
            x = gen(n * channels, sps, rng)
            samples = np.clip(x * 16384, -32768, 32767).astype(np.int16)
            rows.append(measure(name, samples, sps, channels))
            print(json.dumps(rows[-1]))
        scored = [r for r in rows if r["signal"] not in
                  ("noisy", "silence")]

    mean_gain = sum(r["gain_pct"] for r in scored) / len(scored)
    summary = {
        "mode": "live" if args.live else "synthetic",
        "mean_gain_pct": round(mean_gain, 2),
        "bar_pct": 15.0,
        "pass": mean_gain >= 15.0,
        "us_per_frame_lpc_max": round(
            max(r["us_per_frame_lpc"] for r in rows), 1),
    }
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
