"""Forward FFT core: 50%-overlap framing, windowing, large-FFT strategies.

Reference semantics (src/fft.cpp:47-70, src/fft_impl.cpp:131-161):

- hop = N/2 samples, hard-coded 50% overlap,
- each frame is [prev_half, cur_half] multiplied by the two halves of a
  periodic Hann window,
- forward FFT is unnormalized (FFTW convention); the quantize step then
  divides the spectrum by N in place, so the spectrum consumed by both
  the waterfall and the audio path is X/N,
- real input: r2c of N reals -> N/2(+1) bins; IQ input: c2c of N
  complex samples -> N bins in natural FFT order.

TPU-native design: frames are batched ([B, N]) so one device call
processes B hops; the FFT maps to XLA's native FFT.  For very large N a
four-step (Cooley-Tukey rows/columns) decomposition is provided --
``large_fft`` -- which turns one N-point FFT into two batched
sqrt(N)-point FFT passes plus a twiddle multiply and transposes, a
layout XLA tiles far better at N >= 2^19, and which is also the natural
multi-chip split (shard the row axis, all_to_all for the transpose).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def frame_hops(samples: jnp.ndarray, num_hops: int, fft_size: int) -> jnp.ndarray:
    """Build [B, N] overlapped frames from a contiguous sample run.

    ``samples``: [(B+1) * N/2] samples (previous half-frame followed by B
    new half-frames).  Frame b covers samples[b*H : b*H + N], H = N/2 --
    the reference's triple-buffer rotation (src/fft.cpp:50-68) expressed
    as static slices.
    """
    hop = fft_size // 2
    # frame b = [half b, half b+1]: two strided views + one concat,
    # independent of B (a per-hop slice loop bloats compile time)
    v = samples.reshape(num_hops + 1, hop)
    return jnp.concatenate([v[:-1], v[1:]], axis=1)


def _split_sizes(n: int) -> tuple[int, int]:
    """Factor n = n1 * n2 for the four-step decomposition.

    TPU-measured (v5e, [18, 2^20] c2c, tools/profile.py slope method):
    n2 = 128 -- the second FFT runs over exactly one lane tile and the
    first pass keeps a 128-lane minor -- beats the near-sqrt split
    (3.8 ms vs 5.3 ms) and XLA's direct FFT (5.9 ms).  Fall back to the
    sqrt split only when n is too small to give both factors >= 128."""
    if n >= (1 << 14):
        return n // 128, 128
    log = int(round(math.log2(n)))
    n1 = 1 << (log // 2)
    return n1, n // n1


@partial(jax.jit, static_argnames=("direction",))
def _four_step_fft(x: jnp.ndarray, direction: str = "fft") -> jnp.ndarray:
    """Four-step FFT over the last axis (length n = n1*n2, powers of two).

    X[k1 + n1*k2] = sum_{m2} [ W(n, m2*k1) * sum_{m1} x[m1*n2 + m2] W(n1, m1*k1) ] W(n2, m2*k2)

    Steps: reshape to [n1, n2] (row-major: x[m1, m2] = x[m1*n2 + m2]),
    FFT over axis 0 (length n1, batched n2 ways), twiddle multiply,
    FFT over axis 1 (length n2, batched n1 ways), then read out
    transposed: out[k1, k2] -> index k1 + n1*k2.
    """
    n = x.shape[-1]
    n1, n2 = _split_sizes(n)
    batch = x.shape[:-1]
    v = x.reshape(batch + (n1, n2))
    # FFT along the n1 axis (stride-n2 subsequences)
    v = jnp.fft.fft(v, axis=-2) if direction == "fft" else jnp.fft.ifft(v, axis=-2)
    # Twiddle: W(n, m2*k1), sign matches forward/backward
    k1 = np.arange(n1).reshape(n1, 1)
    m2 = np.arange(n2).reshape(1, n2)
    sign = -2j if direction == "fft" else 2j
    tw = np.exp(sign * np.pi * (k1 * m2) / n).astype(np.complex64)
    v = v * tw
    # FFT along the n2 axis
    v = jnp.fft.fft(v, axis=-1) if direction == "fft" else jnp.fft.ifft(v, axis=-1)
    # out index k = k1 + n1*k2  ->  transpose [.., n1, n2] -> [.., n2, n1]
    v = jnp.swapaxes(v, -1, -2)
    return v.reshape(batch + (n,))


# N at/above which the four-step decomposition beats XLA's direct FFT.
# Determined empirically on v5e (see bench notes); overridable per call.
FOUR_STEP_THRESHOLD = 1 << 19


def large_fft(x: jnp.ndarray, strategy: str = "auto") -> jnp.ndarray:
    """c2c forward FFT over the last axis with a large-N strategy.

    strategy: 'direct' (XLA FFT), 'four_step', or 'auto'.
    """
    n = x.shape[-1]
    if strategy == "direct" or (strategy == "auto" and n < FOUR_STEP_THRESHOLD):
        return jnp.fft.fft(x)
    return _four_step_fft(x, "fft")


def forward_spectrum(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    is_real: bool,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Window + forward FFT + 1/N normalization.

    Returns the normalized spectrum X/N in natural FFT order:
    [B, N/2 + 1] for real input (r2c), [B, N] for IQ (c2c).
    The 1/N normalization mirrors the in-place divide the reference
    applies before power (src/fft_impl.cpp:34-35), which makes the
    spectrum seen by the audio path X/N.
    """
    n = window.shape[0]
    xw = frames * window
    if is_real:
        spec = jnp.fft.rfft(xw)
    else:
        spec = large_fft(xw, strategy)
    return spec * jnp.asarray(1.0 / n, jnp.float32)
