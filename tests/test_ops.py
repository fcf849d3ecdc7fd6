"""Golden tests: TPU ops vs the NumPy oracle (reference semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from phantomsdr_tpu.ops import windows, convert, quantize, fft as fftops
from tests import oracle


def rng(seed=0):
    return np.random.default_rng(seed)


# ------------------------------------------------------------------ windows

def test_hann_matches_reference():
    n = 4096
    w = np.asarray(windows.hann_window(n))
    ref = oracle.hann(n)
    np.testing.assert_allclose(w, ref, rtol=0, atol=1e-6)
    # periodic window: w[0] == 0, w[n/2] == 1
    assert w[0] == 0.0
    assert abs(w[n // 2] - 1.0) < 1e-6


# ------------------------------------------------------------------ convert

@pytest.mark.parametrize("fmt", ["u8", "s8", "u16", "s16", "u32", "s32", "f32", "f64"])
def test_sample_convert(fmt):
    r = rng(1)
    d = convert.wire_dtype(fmt)
    if d.kind in "ui":
        info = np.iinfo(d)
        raw = r.integers(info.min, info.max, size=1024, endpoint=True, dtype=d)
    else:
        raw = r.standard_normal(1024).astype(d)
    pre = convert.host_preconvert(raw, fmt)
    got = np.asarray(convert.to_float(jnp.asarray(pre), fmt))
    want = oracle.convert_samples(raw.view(np.uint8), fmt)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)
    if d.kind in "ui":  # floats pass through unscaled (samplereader.cpp:59-65)
        assert got.min() >= -1.0 and got.max() < 1.0 + 1e-6


# ----------------------------------------------------------------- quantize

def test_quantize_power_matches():
    r = rng(2)
    p = np.concatenate(
        [10.0 ** r.uniform(-14, 1, 4096), [0.0, 1e-38, 1.0]]
    ).astype(np.float32)
    for off in (17, 20, -3):
        got = np.asarray(quantize.quantize_power(jnp.asarray(p), off))
        want = oracle.quantize_power(p, off)
        # float32 log2 rounding at exact integer-dB boundaries may flip
        # trunc by one; allow <=1 lsb on <0.5% of bins
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.005


@pytest.mark.parametrize("is_real", [False, True])
def test_waterfall_pyramid(is_real):
    r = rng(3)
    n = 4096
    size_log2 = 12
    levels = 3
    x = r.standard_normal(n).astype(np.float32)
    if not is_real:
        x = (x + 1j * r.standard_normal(n).astype(np.float32)).astype(np.complex64)
    spec = oracle.forward_spectrum(x, is_real)
    want = oracle.waterfall_pyramid(spec, is_real, size_log2, levels)

    rsize = n // 2 if is_real else n
    base_idx = 0 if is_real else n // 2 + 1
    p = quantize.spectrum_power(jnp.asarray(spec)[: rsize])
    p = quantize.roll_iq(p, base_idx)
    got = quantize.waterfall_pyramid(p, levels, size_log2)
    assert len(got) == levels
    for g, w in zip(got, want):
        g = np.asarray(g).astype(int)
        w = w.astype(int)
        assert g.shape == w.shape
        assert np.abs(g - w).max() <= 1
        assert (g != w).mean() < 0.01


def test_pyramid_flat_layout():
    r = 1024
    levels = 3
    pyr = [jnp.full((r >> i,), i, jnp.int8) for i in range(levels)]
    flat = np.asarray(quantize.pyramid_flat(pyr))
    offs = quantize.pyramid_level_offsets(r, levels)
    assert offs == [0, 1024, 1536]
    assert flat.shape[0] == 1024 + 512 + 256
    assert (flat[offs[1]: offs[1] + 512] == 1).all()


# ---------------------------------------------------------------------- fft

def test_frame_hops_overlap():
    n = 64
    b = 3
    samples = jnp.arange((b + 1) * n // 2, dtype=jnp.float32)
    frames = np.asarray(fftops.frame_hops(samples, b, n))
    assert frames.shape == (b, n)
    for i in range(b):
        np.testing.assert_array_equal(
            frames[i], np.arange(i * n // 2, i * n // 2 + n)
        )


@pytest.mark.parametrize("n", [1 << 10, 1 << 14])
def test_four_step_fft_matches_direct(n):
    r = rng(4)
    x = (r.standard_normal((2, n)) + 1j * r.standard_normal((2, n))).astype(
        np.complex64
    )
    want = np.fft.fft(x)
    got = np.asarray(fftops._four_step_fft(jnp.asarray(x), "fft"))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * np.abs(want).max() / 100)


@pytest.mark.parametrize("is_real", [False, True])
def test_forward_spectrum(is_real):
    r = rng(5)
    n = 2048
    w = windows.hann_window(n)
    if is_real:
        frames = r.standard_normal((2, n)).astype(np.float32)
    else:
        frames = (
            r.standard_normal((2, n)) + 1j * r.standard_normal((2, n))
        ).astype(np.complex64)
    got = np.asarray(
        fftops.forward_spectrum(jnp.asarray(frames), w, is_real, "direct")
    )
    wf = frames * np.asarray(w)
    want = np.stack([oracle.forward_spectrum(wf[i], is_real) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-4)


def test_sliding_max_abs_exact():
    """Both _sliding_max_abs formulations (block-by-out_len for the
    production w > out_len case, block-by-w otherwise) must equal the
    brute-force sliding window max exactly -- the AGC look-ahead peak
    feeds the gain recursion, so any off-by-one shows up as gain
    pumping.  (The w > out_len path is the round-4 rewrite that cut
    lane-axis cummax work ~13x at 2048 channels, PERF.md.)"""
    import jax.numpy as jnp
    from phantomsdr_tpu.ops.agc import _sliding_max_abs

    rng = np.random.default_rng(3)

    def brute(y, w, out_len):
        a = np.abs(y)
        return np.stack([a[..., i:i + w].max(-1) for i in range(out_len)],
                        -1)

    cases = [(int(rng.integers(1, 40)), int(rng.integers(1, 90)),
              int(rng.integers(0, 30))) for _ in range(60)]
    # production-like and boundary shapes (w == out_len +- 1 crosses
    # the formulation switch)
    cases += [(180, 2400, 0), (1024, 38400, 0), (180, 7, 0),
              (180, 180, 0), (180, 181, 0), (1, 1, 0), (3, 500, 11)]
    for out_len, w, extra in cases:
        m = out_len + w - 1 + extra
        y = rng.standard_normal((3, m)).astype(np.float32)
        got = np.asarray(_sliding_max_abs(jnp.asarray(y), w, out_len))
        np.testing.assert_array_equal(got, brute(y, w, out_len),
                                      err_msg=f"w={w} L={out_len} m={m}")
