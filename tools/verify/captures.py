"""Synthetic-capture generators for end-to-end verification.

Each variant writes ``capture.s16`` (interleaved s16 IQ) plus a matching
``config.toml`` into ``--out``, and prints a JSON line with the ground
truth the client checks (carrier bin, tone Hz, PI/PS/RT, ...).  These
are the repo-resident versions of the /tmp recipes the verify skill
describes (container resets used to wipe them); the skill's measured
pass criteria live in ``client.py``.

Usage:
    python tools/verify/captures.py --variant tone --out /tmp/verify1
    python tools/verify/captures.py --variant rds  --out /tmp/verify_rds --port 19008

Variants (signal design mirrors the verify skill; reference semantics
cited there):
    tone    AM carrier +0.15*sps off-center with a 1 kHz tone (fast
            compile: fft 32768, audio_sps 12000)
    am      overmodulated AM (m=1.8, carrier +10 Hz) for the PLL-vs-
            envelope A/B (src/signal.cpp:242-257 parity)
    stereo  FM MPX: 19 kHz pilot + 800 Hz left-only + 1300 Hz right-only
    rds     FM MPX with the tests/test_rds RDS bitstream (known PI/PS/RT)
    both    stereo tones AND RDS on one MPX (shared-pilot path)
    nr      AM with a BURSTY 1 kHz tone + in-channel noise (nr=true)
    lms     AM with a STEADY 1 kHz tone + noise (nr_algo=lms keeps
            predictable tones, judged by SNR ratio)
    nb      AM carrier with sharp impulses at a WIDE channel
            (nr_algo=nb; clicks must stay sharp through the filter)
    de      FM with equal 1 kHz + 10 kHz tones (deemphasis=75)
    soak    10 s FM stereo+RDS at 1.92 MSPS / fft 131072 (mid-size
            serving soak; use with tools/stress.py --rds)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

FS_MPX = 192_000  # MPX synthesis rate for the FM variants


def _write_iq(path: Path, iq: np.ndarray, scale=32000.0) -> None:
    s = np.empty(2 * iq.size, dtype=np.int16)
    s[0::2] = np.round(np.clip(iq.real, -1, 1) * scale).astype(np.int16)
    s[1::2] = np.round(np.clip(iq.imag, -1, 1) * scale).astype(np.int16)
    s.tofile(path)


def _fm_modulate(mpx: np.ndarray, fs_mpx: int, sps: int, secs: float,
                 dev_hz: float = 75_000.0, f_off: float = 0.0,
                 amp: float = 0.5) -> np.ndarray:
    """FM-modulate an MPX waveform at ``dev_hz`` deviation, upsampled
    (linear interp) from fs_mpx to sps, carrier at baseband ``f_off``."""
    n_lo = int(fs_mpx * secs)
    n_hi = int(sps * secs)
    t_lo = np.arange(n_lo, dtype=np.float64) / fs_mpx
    t_hi = np.arange(n_hi, dtype=np.float64) / sps
    mu = np.interp(t_hi, t_lo, mpx[:n_lo].astype(np.float64))
    ph = 2 * np.pi * dev_hz * np.cumsum(mu) / sps
    if f_off:
        ph = ph + 2 * np.pi * f_off * t_hi
    return amp * np.exp(1j * ph)


def _config(out: Path, port: int, sps: int, fft_size: int, audio_sps: int,
            extra_input: dict | None = None, modulation: str = "WBFM",
            frequency: int = 98_000_000,
            default_frequency: int = 0, mesh: int = 0,
            wf_compression: str = "zstd",
            audio_compression: str = "flac") -> None:
    lines = [
        "[server]", f"port = {port}", 'html_root = "html/"',
        "otherusers = 1", "",
        "[input]", f"sps = {sps}", f"fft_size = {fft_size}",
        f"frequency = {frequency}", 'signal = "iq"',
        f"audio_sps = {audio_sps}", f'audio_compression = "{audio_compression}"',
        f'waterfall_compression = "{wf_compression}"', "waterfall_size = 1024",
    ]
    for k, v in (extra_input or {}).items():
        if isinstance(v, bool):
            lines.append(f"{k} = {'true' if v else 'false'}")
        elif isinstance(v, str):
            lines.append(f'{k} = "{v}"')
        else:
            lines.append(f"{k} = {v}")
    if mesh:
        # mesh server mode (virtual CPU devices in this environment:
        # launch with --platform cpu --cpu-devices N); hop_batch and
        # max_channels must divide by the mesh size.  MUST come after
        # the [input] extras: TOML keys bind to the latest section
        lines += ["", "[tpu]", f"mesh_devices = {mesh}",
                  f"hop_batch = {4 * mesh}"]
    lines += ["", "[input.driver]", 'name = "stdin"', 'format = "s16"',
              "", "[input.defaults]", f'modulation = "{modulation}"']
    if default_frequency:
        lines.append(f"frequency = {default_frequency}")
    lines.append("")
    (out / "config.toml").write_text("\n".join(lines))


def _inchannel_noise(rng, n: int, sps: int, cutoff_hz: float = 4500.0,
                     rms: float = 0.15) -> np.ndarray:
    """Band-limited white noise inside the AM channel (<cutoff audio):
    the demodulated floor must be set by it, not by wideband noise the
    channel filter rejects."""
    wn = np.fft.rfft(rng.standard_normal(n))
    wn[np.fft.rfftfreq(n, 1.0 / sps) > cutoff_hz] = 0.0
    out = np.fft.irfft(wn, n)
    return out * (rms / np.sqrt(np.mean(out ** 2)))


def _stereo_mpx(n: int, fs: int = FS_MPX) -> np.ndarray:
    t = np.arange(n) / fs
    th = 2 * np.pi * 19_000.0 * t
    L = np.sin(2 * np.pi * 800.0 * t)
    R = np.sin(2 * np.pi * 1300.0 * t)
    return (0.4 * (L + R) / 2 + 0.09 * np.cos(th)
            + 0.4 * (L - R) / 2 * np.cos(2 * th)).astype(np.float32)


def make(variant: str, out: Path, port: int, secs: float,
         fft_override: int = 0, mesh: int = 0,
         wf_compression: str = "zstd",
         audio_compression: str = "flac") -> dict:
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    truth: dict = {"variant": variant, "port": port}
    if audio_compression == "opus" and variant in ("am", "nr", "lms",
                                                   "nb", "de"):
        # client.py's A/B decode paths for these checks are FLAC-only;
        # silently writing an opus config would report false coverage
        raise SystemExit(
            f"--audio-compression opus is not supported for variant "
            f"{variant!r} (client.py decodes these checks via FLAC); "
            f"use tone/stereo/rds/both/soak")

    if variant in ("tone", "am", "nr", "lms"):
        sps, fft = 960_000, fft_override or 32_768
        f_off = 0.15 * sps if variant == "tone" else 10.0
        n = int(sps * secs)
        t = np.arange(n, dtype=np.float64) / sps
        tone = np.sin(2 * np.pi * 1000.0 * t)
        if variant == "lms":
            # STEADY tone (LMS keeps predictable signals) + in-channel
            # noise; judged by the tone/floor RATIO (the reference's 4x
            # output gain raises both absolute levels)
            env = 1.0 + 0.5 * tone + _inchannel_noise(rng, n, sps)
        elif variant == "nr":
            gate = ((t % 2.0) < 1.0).astype(np.float64)  # 1 s on/off
            env = 1.0 + 0.5 * tone * gate + _inchannel_noise(rng, n, sps)
        elif variant == "am":
            env = 1.0 + 1.8 * tone  # overmodulated: envelope folds
        else:
            env = 1.0 + 0.5 * tone
        iq = 0.35 * env * np.exp(2j * np.pi * f_off * t)
        _write_iq(out / "capture.s16", iq)
        extra = {}
        if variant == "nr":
            extra = {"nr": True}
        elif variant == "lms":
            extra = {"nr": True, "nr_algo": "lms"}
        _config(out, port, sps, fft, 12_000, extra_input=extra,
                modulation="AM", mesh=mesh,
                wf_compression=wf_compression,
                audio_compression=audio_compression,
                default_frequency=98_000_000 + sps // 2 + int(round(f_off)))
        truth.update(f_off_hz=f_off, tone_hz=1000.0, sps=sps,
                     fft_size=fft, audio_sps=12_000)
        return truth

    if variant == "nb":
        # sharp clicks on an AM carrier; audio_sps 192k + a WIDE client
        # window keep them sharp through the channel filter (the NB
        # repairs impulses the filter hasn't already smeared)
        sps, fft = 1_536_000, fft_override or 32_768
        n = int(sps * secs)
        t = np.arange(n, dtype=np.float64) / sps
        env = 1.0 + 0.25 * np.sin(2 * np.pi * 1000.0 * t)
        clicks = np.zeros(n)
        step = int(sps * 0.1)                    # 10 clicks/s
        # ~8 samples wide AT THE AUDIO RATE (64 here).  Width matters
        # twice: the whitener nearly cancels 1-2 sample pulses
        # (adjacent LPC coefficients sum to ~0 at low frequency), and a
        # box much WIDER than the repair window survives in its middle
        # (the blanker is built for impulses <= nb_samples, NB.c) --
        # 8-at-audio-rate has sharp detectable edges AND fits inside
        # one +-12 repair
        for i in range(step // 2, n - 100, step):
            clicks[i:i + 64] = 4.0
        # 0.12 keeps the click peaks inside s16 full scale (no clipping)
        iq = 0.12 * (env + clicks) * np.exp(2j * np.pi * 10.0 * t)
        _write_iq(out / "capture.s16", iq)
        # nb_samples 25: the wide brick-wall channel rings (sinc tails)
        # around each click; the repair window must cover the ring
        _config(out, port, sps, fft, 192_000,
                extra_input={"nr": True, "nr_algo": "nb",
                             "nb_samples": 25},
                modulation="AM", mesh=mesh,
                wf_compression=wf_compression,
                default_frequency=98_000_000 + sps // 2 + 10)
        truth.update(f_off_hz=10.0, tone_hz=1000.0, sps=sps,
                     fft_size=fft, audio_sps=192_000, wide_hz=90_000)
        return truth

    # FM family: MPX at 192 kHz, 8x upsample to 1.536 MSPS — the 8x
    # keeps the audio block a power of two (192000*fft/sps/2 = fft/16),
    # which the RDS decimation chain requires (config.finalize's
    # rds=true check).  soak: same rate at fft 131072 (mid-size).
    if variant == "soak":
        sps, fft, secs = 1_536_000, fft_override or 131_072, max(secs, 10.0)
    else:
        sps, fft = 1_536_000, fft_override or 32_768
    n_mpx = int(FS_MPX * secs)
    extra: dict = {}
    if variant == "stereo":
        mpx = _stereo_mpx(n_mpx)
        extra = {"stereo": True}
        truth.update(left_hz=800.0, right_hz=1300.0)
    elif variant in ("rds", "both", "soak"):
        from tests.test_rds import _mpx, PI, PS, RT
        mpx = _mpx(n_mpx)  # stereo tones + pilot + RDS
        extra = {"rds": True}
        if variant in ("both", "soak"):
            extra["stereo"] = True
            truth.update(left_hz=800.0, right_hz=1300.0)
        if variant == "soak":
            extra["deemphasis"] = 75
        truth.update(pi=f"{PI:04X}", ps=PS, rt=RT)
    elif variant == "de":
        t = np.arange(n_mpx) / FS_MPX
        mpx = (0.35 * np.sin(2 * np.pi * 1000.0 * t)
               + 0.35 * np.sin(2 * np.pi * 10_000.0 * t)).astype(np.float32)
        extra = {"deemphasis": 75}
        truth.update(tone_lo_hz=1000.0, tone_hi_hz=10_000.0, tau_us=75.0)
    else:
        raise SystemExit(f"unknown variant {variant!r}")
    iq = _fm_modulate(mpx, FS_MPX, sps, secs)
    _write_iq(out / "capture.s16", iq)
    _config(out, port, sps, fft, 192_000, extra_input=extra,
            modulation="WBFM", mesh=mesh,
            wf_compression=wf_compression,
            audio_compression=audio_compression)
    truth.update(f_off_hz=0.0, sps=sps, fft_size=fft, audio_sps=192_000)
    return truth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=("tone", "am", "stereo", "rds", "both",
                             "nr", "lms", "nb", "de", "soak"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--port", type=int, default=19020)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--fft-size", type=int, default=0,
                    help="override the variant's fft_size")
    ap.add_argument("--mesh", type=int, default=0,
                    help="emit a [tpu] mesh_devices=N config (drive "
                         "with --platform cpu --cpu-devices N)")
    ap.add_argument("--audio-compression", choices=("flac", "opus"),
                    default="flac",
                    help="audio codec (opus: client.py decodes with "
                         "the libopus binding, the WebCodecs stand-in)")
    ap.add_argument("--wf-compression", choices=("zstd", "av1"),
                    default="zstd",
                    help="waterfall codec (av1: client.py decodes via "
                         "the libaom AV1Decoder binding)")
    ap.add_argument("--cluster", action="store_true",
                    help="also write config_follower.toml (port+1) for "
                         "the 2-process multihost recipe (see the "
                         "verify skill for the two launch lines)")
    args = ap.parse_args()
    truth = make(args.variant, Path(args.out), args.port, args.secs,
                 args.fft_size, args.mesh, args.wf_compression,
                 args.audio_compression)
    if args.cluster:
        cfg = (Path(args.out) / "config.toml").read_text()
        (Path(args.out) / "config_follower.toml").write_text(
            cfg.replace(f"port = {args.port}", f"port = {args.port + 1}"))
        truth["follower_port"] = args.port + 1
    (Path(args.out) / "truth.json").write_text(json.dumps(truth))
    print(json.dumps(truth))


if __name__ == "__main__":
    main()
