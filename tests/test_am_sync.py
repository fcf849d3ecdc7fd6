"""PLL carrier-synchronous AM detection (the reference's liquid path,
signal.cpp:242-252): lock behavior and message recovery."""

import numpy as np
import jax.numpy as jnp

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy
from phantomsdr_tpu.ops.channelizer import am_sync_detect


def test_pll_locks_to_offset_carrier():
    """A bare complex exponential at a small frequency offset: once the
    PLL locks, the mixed-down output is ~real and ~constant."""
    sr = 12000.0
    f0 = 20.0  # Hz offset
    n = 24000
    t = np.arange(n) / sr
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)[None, :]
    audio, phase, freq = am_sync_detect(
        jnp.asarray(x), jnp.asarray(x),
        jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32))
    out = np.asarray(audio)[0]
    # locked: output -> Re(e^{j phi_err}) -> ~1 with small ripple
    tail = out[-4000:]
    assert tail.mean() > 0.95
    assert tail.std() < 0.05
    # NCO frequency converged to the carrier offset (rad/sample)
    assert abs(float(freq[0]) - 2 * np.pi * f0 / sr) < 0.002


def test_am_sync_default_on_and_per_client_envelope():
    """Parity default: with liquid built (the reference's normal
    configuration) AM is PLL-synchronous detection
    (src/signal.cpp:242-252), so am_sync now defaults TRUE; the
    envelope fallback (:253-257) stays available PER CLIENT via the
    am_env table column ({"cmd":"am_sync","enabled":false}).

    Discriminator: an OVERMODULATED AM signal (m > 1).  Envelope
    detection rectifies the negative swings (|1 + m*msg| folds -> heavy
    even-harmonic distortion); carrier-synchronous detection recovers
    the clean message (Re keeps the sign).  Row 0 (default, PLL) must
    show far less 2nd-harmonic than row 1 (envelope opt-out)."""
    cfg = config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 8192,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 512,
            "driver": {"format": "s16"},   # note: NO am_sync key
        },
        "tpu": {"hop_batch": 4, "max_channels": 2},
    })
    assert cfg.am_sync  # the new default
    pipe = HopPipeline(cfg)
    rsize = cfg.fft_result_size
    f_center = 30000.0
    m_idx = int((f_center + cfg.sps / 2) * rsize / cfg.sps)
    off = int(4000 * rsize / cfg.sps)
    table = channels_from_numpy(
        l=[m_idx - off] * 2, r=[m_idx + off] * 2, m_idx=[m_idx] * 2,
        mode=[2] * 2, active=[True] * 2,
        am_env=[False, True])  # row 0 PLL (default), row 1 envelope

    steps, b = 24, cfg.hop_batch
    n = cfg.hop_size * steps * b
    t = np.arange(n) / cfg.sps
    msg = np.sin(2 * np.pi * 800 * t)
    x = 0.25 * (1 + 1.8 * msg) * np.exp(2j * np.pi * (f_center + 10) * t)
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = x.real, x.imag
    raw_all = np.clip(inter * 32767, -32768, 32767).astype(np.int16)

    state = pipe.init_state()
    halo = np.zeros(pipe.wire_per_hop, np.int16)
    audio = []
    for s in range(steps):
        blk = raw_all[s * b * pipe.wire_per_hop:
                      (s + 1) * b * pipe.wire_per_hop]
        state, out = pipe.step(
            state, jnp.asarray(np.concatenate([halo, blk])), table,
            waterfall="off")
        halo = blk[-pipe.wire_per_hop:]
        audio.append(np.asarray(out.audio))
    y = np.concatenate(audio)                   # [steps*b, 2, half]
    y = y.transpose(1, 0, 2).reshape(2, -1).astype(np.float64)
    y = y[:, 8000:]                             # AGC warmup + PLL lock

    def h2_ratio(sig):
        n_ = sig.size
        w = np.hanning(n_)
        f = np.fft.rfftfreq(n_, 1 / cfg.audio_sps)
        s = np.abs(np.fft.rfft(sig * w))
        amp = [s[np.argmin(np.abs(f - hz))-2:
                 np.argmin(np.abs(f - hz))+3].max()
               for hz in (800.0, 1600.0)]
        return amp[1] / amp[0]

    r_pll, r_env = h2_ratio(y[0]), h2_ratio(y[1])
    assert r_env > 0.25, f"envelope row should fold: H2/H1={r_env:.3f}"
    assert r_pll < r_env / 4, (
        f"PLL row should be clean: {r_pll:.3f} vs env {r_env:.3f}")
    # and the two detector paths really produced different audio
    assert np.abs(y[0] - y[1]).max() > 0.01


def test_am_sync_pipeline_recovers_message():
    cfg = config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 8192,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 512,
            "am_sync": True,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 2},
    })
    assert cfg.am_sync
    pipe = HopPipeline(cfg)
    rsize = cfg.fft_result_size
    f_center = 30000.0
    mid_bin = (f_center + cfg.sps / 2) * rsize / cfg.sps
    m_idx = int(mid_bin)
    off = int(4000 * rsize / cfg.sps)
    table = channels_from_numpy(
        l=[m_idx - off] * 2, r=[m_idx + off] * 2, m_idx=[m_idx] * 2,
        mode=[2] * 2, active=[True] * 2)

    steps, b = 20, cfg.hop_batch
    n = cfg.hop_size * steps * b
    t = np.arange(n) / cfg.sps
    msg = np.sin(2 * np.pi * 800 * t)
    x = 0.3 * (1 + 0.6 * msg) * np.exp(2j * np.pi * (f_center + 15) * t)
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = x.real, x.imag
    raw_all = np.clip(inter * 32767, -32768, 32767).astype(np.int16)

    state = pipe.init_state()
    halo = np.zeros(pipe.wire_per_hop, np.int16)
    audio = []
    for s in range(steps):
        blk = raw_all[s * b * pipe.wire_per_hop:(s + 1) * b * pipe.wire_per_hop]
        state, out = pipe.step(state, jnp.asarray(np.concatenate([halo, blk])),
                               table, waterfall="off")
        halo = blk[-pipe.wire_per_hop:]
        audio.append(np.asarray(out.audio)[:, 0, :])
    y = np.concatenate(audio).reshape(-1).astype(np.float64)
    # skip AGC warmup + PLL lock-in, then find the 800 Hz message
    y = y[6000:]
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    freqs = np.fft.rfftfreq(y.size, 1 / cfg.audio_sps)
    peak = freqs[np.argmax(spec[10:]) + 10]
    assert abs(peak - 800) < 10, f"sync AM peak at {peak} Hz"
