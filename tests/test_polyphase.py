"""Polyphase decimator vs scipy oracle: streaming equivalence and
anti-alias behavior."""

import numpy as np
import jax.numpy as jnp
from scipy import signal as sps

from phantomsdr_tpu.ops import polyphase as pp


def test_lowpass_matches_firwin():
    h = pp.design_lowpass(64, 0.2)
    want = sps.firwin(64, 0.2, window="hamming")
    np.testing.assert_allclose(h, want, atol=1e-6)


def test_streaming_decimate_matches_offline():
    rng = np.random.default_rng(0)
    c, factor = 3, 4
    taps = pp.decimator_taps(factor)
    nt = taps.shape[0]
    total = 4096
    x = rng.standard_normal((c, total)).astype(np.float32)

    # offline oracle: full convolution then stride, matching the
    # documented alignment (window k covers padded[k*f : k*f+nt])
    padded = np.concatenate([np.zeros((c, nt - 1), np.float32), x], axis=1)
    want = np.stack([
        np.convolve(padded[i], taps[::-1], mode="valid")[::factor]
        for i in range(c)
    ])[:, : total // factor]

    st = pp.init_decimator_state(c, nt)
    outs = []
    blk = 512
    for s in range(total // blk):
        st, y = pp.polyphase_decimate(
            st, jnp.asarray(x[:, s * blk:(s + 1) * blk]), taps, factor)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_antialias_rejects_out_of_band_tone():
    factor = 4
    taps = pp.decimator_taps(factor, taps_per_phase=16)
    fs = 192000.0
    t = np.arange(8192) / fs
    inband = np.sin(2 * np.pi * 5000 * t).astype(np.float32)
    alias = np.sin(2 * np.pi * 70000 * t).astype(np.float32)  # > fs/8
    st = pp.init_decimator_state(2, taps.shape[0])
    _, y = pp.polyphase_decimate(
        st, jnp.asarray(np.stack([inband, alias])), taps, factor)
    y = np.asarray(y)[:, 64:]  # drop filter warmup
    assert np.std(y[0]) > 0.5          # in-band passes
    assert np.std(y[1]) < 0.02         # out-of-band (would alias) rejected
