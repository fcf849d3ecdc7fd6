"""Audio-fidelity bound: pipeline audio vs the reference-semantics
oracle must agree within 0.1 dB SNR (BASELINE.md target) on realistic
modulated signals, per demod mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy
from tests import oracle

SPS = 192000
FFT = 8192


def make_cfg():
    return config_from_dict({
        "input": {
            "sps": SPS, "frequency": 7000000, "fft_size": FFT,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 512,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 4},
    })


def modulated_stream(n, mode, f_center, rng):
    """A modulated carrier + noise at f_center Hz offset, interleaved s16."""
    t = np.arange(n) / SPS
    msg = np.sin(2 * np.pi * 700 * t) + 0.5 * np.sin(2 * np.pi * 1900 * t)
    if mode == "AM":
        base = (1 + 0.7 * msg / 1.5) * np.exp(2j * np.pi * f_center * t)
    elif mode == "FM":
        phase = 2 * np.pi * np.cumsum(2000 * msg / 1.5) / SPS
        base = np.exp(1j * (2 * np.pi * f_center * t + phase))
    else:  # SSB: shifted audio band
        sign = 1 if mode == "USB" else -1
        base = 0.7 * (
            np.exp(2j * np.pi * (f_center + sign * 700) * t)
            + 0.5 * np.exp(2j * np.pi * (f_center + sign * 1900) * t)
        )
    x = 0.3 * base + 0.003 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = x.real, x.imag
    return np.clip(inter * 32767, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("mode", ["USB", "LSB", "AM", "FM"])
def test_audio_snr_within_bound(mode):
    rng = np.random.default_rng(99)
    cfg = make_cfg()
    pipe = HopPipeline(cfg)
    a = cfg.audio_fft_size
    half = a // 2
    rsize = cfg.fft_result_size

    f_center = 30000.0  # Hz above the IQ band's base (-96 kHz)
    mid_bin = (f_center + SPS / 2) * rsize / SPS
    m_idx = int(np.floor(mid_bin))
    off = int(4000 * rsize / SPS)
    if mode == "USB":
        l, r = m_idx, m_idx + off
    elif mode == "LSB":
        l, r = m_idx - off, m_idx
    else:
        l, r = m_idx - off, m_idx + off

    mode_codes = {"USB": 0, "LSB": 1, "AM": 2, "FM": 3}
    # the oracle implements envelope AM (the reference's non-liquid
    # fallback); pin that path via the per-client am_env opt-out --
    # the default PLL detector is covered by tests/test_am_sync.py
    table = channels_from_numpy(
        l=[l] * 4, r=[r] * 4, m_idx=[m_idx] * 4,
        mode=[mode_codes[mode]] * 4, active=[True] * 4,
        am_env=[True] * 4)

    steps = 6
    b = cfg.hop_batch
    total = steps * b
    raw = modulated_stream(cfg.hop_size * total, mode, f_center, rng)

    # pipeline
    state = pipe.init_state()
    halo = np.zeros(pipe.wire_per_hop, np.int16)
    got = []
    for s in range(steps):
        blk = raw[s * b * pipe.wire_per_hop:(s + 1) * b * pipe.wire_per_hop]
        state, out = pipe.step(state, jnp.asarray(np.concatenate([halo, blk])),
                               table, waterfall="off")
        halo = blk[-pipe.wire_per_hop:]
        got.append(np.asarray(out.audio)[:, 0, :])
    got = np.concatenate(got).reshape(-1).astype(np.float64)

    # oracle
    x = oracle.convert_samples(raw.view(np.uint8), "s16")
    xc = x[0::2] + 1j * x[1::2]
    window = oracle.hann(FFT)
    xfull = np.concatenate([np.zeros(cfg.hop_size, xc.dtype), xc])
    orc = oracle.OracleChannel(a, False, rsize)
    dcb = oracle.OracleDCBlocker((cfg.audio_sps // 750) * 2)
    agc = oracle.OracleAGC(sr=cfg.audio_sps)
    want = []
    for frame in range(total):
        fr = xfull[frame * cfg.hop_size: frame * cfg.hop_size + FFT] * window
        spec = oracle.forward_spectrum(fr, False)
        ext = oracle.extend_spectrum(spec, False, rsize, a)
        start = (l + cfg.base_idx) % rsize
        audio, _ = orc.send_audio(ext[start:], frame, l, r, float(mid_bin), mode)
        audio = agc.process(dcb.process(audio.astype(np.float64)))
        want.append(oracle.float_to_int16(audio.astype(np.float32)))
    want = np.concatenate(want).astype(np.float64)

    # drop AGC warmup region
    w0 = 3000
    g, w = got[w0:], want[w0:]
    sig_pow = np.mean(w ** 2)
    err_pow = np.mean((g - w) ** 2)
    assert sig_pow > 1e3, "oracle produced silence; test setup broken"
    snr_db = 10 * np.log10(sig_pow / max(err_pow, 1e-12))
    # the 0.1 dB budget on the signal corresponds to a ~16 dB error floor;
    # require far better: implementation error must be tiny vs signal
    assert snr_db > 40, f"mode={mode}: pipeline vs oracle SNR {snr_db:.1f} dB"
    # explicit 0.1 dB statement: output power deviates by < 0.1 dB
    p_ratio_db = abs(10 * np.log10(np.mean(g ** 2) / sig_pow))
    assert p_ratio_db < 0.1, f"mode={mode}: power deviation {p_ratio_db:.3f} dB"
