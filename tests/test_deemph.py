"""FM de-emphasis (ops/deemph.py + pipeline wiring).

The reference ships raw discriminator audio and leaves the de-emphasis
pole to the browser; here it is a server-side option
(``[input] deemphasis = 75``) evaluated as an O(log T) associative
scan.  These tests pin the recurrence against a straight-line
sequential reference, streaming continuity, the frequency response,
FM-only gating, and the sharded/single-device equivalence of the new
carry.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops.deemph import deemph_alpha, deemph_process
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

FS = 192000


def _seq_ref(y0, alpha, x):
    y = np.empty_like(x)
    prev = y0.copy()
    for n in range(x.shape[1]):
        prev = alpha * prev + (1 - alpha) * x[:, n]
        y[:, n] = prev
    return y


def test_matches_sequential_reference():
    rng = np.random.default_rng(0)
    a = deemph_alpha(FS, 75.0)
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    y0 = rng.standard_normal(3).astype(np.float32)
    mask = np.array([True, True, False])
    yp, y = deemph_process(jnp.asarray(y0), a, jnp.asarray(x),
                           jnp.asarray(mask))
    ref = _seq_ref(y0.astype(np.float64), a, x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(y)[:2], ref[:2], atol=2e-5)
    # masked-off row passes through untouched, carry frozen
    np.testing.assert_array_equal(np.asarray(y)[2], x[2])
    assert np.asarray(yp)[2] == y0[2]
    np.testing.assert_allclose(np.asarray(yp)[:2], ref[:2, -1], atol=2e-5)


def test_streaming_continuity():
    """Chunked (carry passed) equals one-shot."""
    rng = np.random.default_rng(1)
    a = deemph_alpha(FS, 50.0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    m = jnp.array([True, True])
    _, y_full = deemph_process(jnp.zeros(2), a, jnp.asarray(x), m)
    yp = jnp.zeros(2)
    outs = []
    for i in range(0, 8192, 1024):
        yp, y = deemph_process(yp, a, jnp.asarray(x[:, i:i + 1024]), m)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_full), atol=1e-5)


def test_frequency_response():
    """Single-pole response: |H(f)| = 1 at DC, and at f it matches
    1/sqrt(1 + (2*pi*f*tau)^2) within a few percent -- e.g. ~-8.2 dB at
    5 kHz with tau=75us."""
    tau = 75e-6
    a = deemph_alpha(FS, 75.0)
    t = np.arange(FS)
    for f, tol in ((100.0, 0.02), (5000.0, 0.03), (15000.0, 0.05)):
        x = np.sin(2 * np.pi * f * t / FS).astype(np.float32)[None]
        _, y = deemph_process(jnp.zeros(1), a, jnp.asarray(x),
                              jnp.array([True]))
        y = np.asarray(y)[0][FS // 4:]       # past the settle
        amp = np.abs(np.sum(y * np.exp(-2j * np.pi * f *
                                       np.arange(y.size) / FS))) * 2 / y.size
        want = 1.0 / np.sqrt(1.0 + (2 * np.pi * f * tau) ** 2)
        assert abs(amp - want) < tol * want, (f, amp, want)


def test_pipeline_fm_only_gating():
    """[input] deemphasis=75: the FM row's audio is low-passed relative
    to the no-deemphasis run, the AM row's is bit-identical."""
    def cfg_for(us):
        return config_from_dict({
            "input": {
                "sps": 1_536_000, "frequency": 98_000_000,
                "fft_size": 4096, "signal": "iq", "audio_sps": 192000,
                "waterfall_size": 512, "deemphasis": us,
                "driver": {"format": "s16"},
                "defaults": {"frequency": 98_000_000,
                             "modulation": "WBFM"},
            },
            "tpu": {"hop_batch": 16, "max_channels": 2},
        })

    mid_run = {}
    for us in (0.0, 75.0):
        cfg = cfg_for(us)
        pipe = HopPipeline(cfg)
        half = cfg.audio_fft_size // 2
        mid = cfg.fft_result_size // 2
        table = channels_from_numpy(
            l=[mid - half // 2] * 2, r=[mid + half // 2] * 2,
            m_idx=[mid] * 2, mode=[3, 2], active=[True, True])
        rng = np.random.default_rng(5)
        n = cfg.hop_size * (cfg.hop_batch + 1) * 2
        state = pipe.init_state()
        outs = []
        for _ in range(14):
            raw = rng.integers(-20000, 20000, n, dtype=np.int16)
            state, out = pipe.step(state, jnp.asarray(raw), table,
                                   waterfall="off")
            outs.append(np.asarray(out.audio))
        mid_run[us] = np.concatenate(outs, axis=0)
    a0, a75 = mid_run[0.0], mid_run[75.0]
    # AM row identical; FM row differs and has less high-band energy
    np.testing.assert_array_equal(a0[:, 1], a75[:, 1])
    fm0 = a0[:, 0].reshape(-1).astype(np.float64)
    fm75 = a75[:, 0].reshape(-1).astype(np.float64)
    assert np.any(fm0 != fm75) and np.any(fm75)
    s0 = np.abs(np.fft.rfft(fm0[-40960:]))
    s75 = np.abs(np.fft.rfft(fm75[-40960:]))
    hi = slice(s0.size // 2, s0.size)        # top half of the band
    assert np.sum(s75[hi]) < 0.3 * np.sum(s0[hi])


def test_pipeline_stereo_deemph_rows():
    """stereo=true + deemphasis=75: the per-STREAM row mask (2 rows per
    channel, interleaved L/R) must filter both ears of the FM row and
    leave the AM row's two ears bit-identical to a no-deemphasis run."""
    def cfg_for(us):
        return config_from_dict({
            "input": {
                "sps": 1_536_000, "frequency": 98_000_000,
                "fft_size": 4096, "signal": "iq", "audio_sps": 192000,
                "waterfall_size": 512, "deemphasis": us, "stereo": True,
                "driver": {"format": "s16"},
                "defaults": {"frequency": 98_000_000,
                             "modulation": "WBFM"},
            },
            "tpu": {"hop_batch": 16, "max_channels": 2},
        })

    runs = {}
    for us in (0.0, 75.0):
        cfg = cfg_for(us)
        pipe = HopPipeline(cfg)
        half = cfg.audio_fft_size // 2
        mid = cfg.fft_result_size // 2
        table = channels_from_numpy(
            l=[mid - half // 2] * 2, r=[mid + half // 2] * 2,
            m_idx=[mid] * 2, mode=[3, 2], active=[True, True])
        rng = np.random.default_rng(9)
        n = cfg.hop_size * (cfg.hop_batch + 1) * 2
        state = pipe.init_state()
        outs = []
        for _ in range(14):
            raw = rng.integers(-20000, 20000, n, dtype=np.int16)
            state, out = pipe.step(state, jnp.asarray(raw), table,
                                   waterfall="off")
            outs.append(np.asarray(out.audio))  # [B, C, 2*half] L/R
        runs[us] = np.concatenate(outs, axis=0)
    a0, a75 = runs[0.0], runs[75.0]
    np.testing.assert_array_equal(a0[:, 1], a75[:, 1])  # AM row identical
    fm0 = a0[:, 0].reshape(-1, 2)
    fm75 = a75[:, 0].reshape(-1, 2)
    for ear in (0, 1):  # L and R both de-emphasized
        assert np.any(fm0[:, ear] != fm75[:, ear])
        s0 = np.abs(np.fft.rfft(fm0[-20480:, ear].astype(np.float64)))
        s75 = np.abs(np.fft.rfft(fm75[-20480:, ear].astype(np.float64)))
        hi = slice(s0.size // 2, s0.size)
        assert np.sum(s75[hi]) < 0.3 * np.sum(s0[hi])


def test_config_validation():
    with pytest.raises(ValueError, match="deemphasis"):
        config_from_dict({
            "input": {
                "sps": 192000, "frequency": 7000000, "fft_size": 2048,
                "signal": "iq", "audio_sps": 12000,
                "waterfall_size": 256, "deemphasis": -1,
                "driver": {"format": "s16"},
            },
            "tpu": {"hop_batch": 2, "max_channels": 2},
        })
