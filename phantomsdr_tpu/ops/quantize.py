"""Waterfall power / int8-dB quantization / downsample pyramid.

Output semantics match the reference kernels (reference:
src/fft_impl.cpp:13-61 CPU, src/fft_impl.cpp:198-223 OpenCL):

- spectrum is normalized by the FFT length N *before* the power is taken
  (``complexbuf[i] /= normalize`` with ``normalize = N``),
- ``power = re^2 + im^2`` of the normalized bin,
- quantized int8 value ``q = sat_trunc(20*log10(power) + 127 +
  power_offset * 6.020599913279624)`` clamped to [-128, 127], where
  ``power_offset = round(log2(N)) + brightness_offset`` at the full
  resolution level and decreases by 1 per pyramid level,
- each pyramid level sums adjacent *power* pairs of the previous level
  (src/fft_impl.cpp:45-61) and re-quantizes with the decremented offset.

The reference CPU path computes log2 with a float bit-trick
(``vec_log2``, src/fft_impl.cpp:14-23); per SURVEY.md we match the
*output*, not the trick: the OpenCL/CUDA paths of the reference already
use the exact ``log10``, so exact log is the canonical semantics.

For IQ (c2c) input the quantized buffer is rolled so that bin 0 is the
lowest frequency: quantized[j] corresponds to FFT bin
``(j + base_idx) % N`` with ``base_idx = N/2 + 1``
(src/fft_impl.cpp:148-160).  The complex spectrum itself is *not*
rolled (the audio path indexes it through the same base_idx offset).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 20 * log10(2): dB per power-of-two, reference src/fft_impl.cpp:42
_DB_PER_OCTAVE = 6.020599913279624
# log10(2) * 20 applied to log2(power), reference src/fft_impl.cpp:42
_LOG2_TO_DB = 0.3010299956639812 * 20.0


def quantize_power(power: jnp.ndarray, power_offset) -> jnp.ndarray:
    """int8 dB quantization of a (already normalized) power array.

    ``q = sat_trunc(log2(p) * 20*log10(2) + 127 + offset*6.0206)``;
    zero power maps to -128 (log -> -inf -> clamped).
    """
    # log2 of 0 -> -inf; the subsequent clamp handles it, but avoid NaN
    # propagation from negative/denormal garbage.
    p = jnp.maximum(power, 0.0)
    db = jnp.log2(p) * _LOG2_TO_DB + 127.0 + jnp.asarray(power_offset, jnp.float32) * _DB_PER_OCTAVE
    db = jnp.where(p > 0, db, -128.0)
    # Reference CPU does (int8)max(-128.f, v) (truncation toward zero);
    # OpenCL uses convert_char_sat_rtz (round-to-zero, saturate).  We use
    # the well-defined saturate form.
    q = jnp.clip(jnp.trunc(db), -128.0, 127.0)
    return q.astype(jnp.int8)


def spectrum_power(spec: jnp.ndarray) -> jnp.ndarray:
    """|X|^2 of an (already normalized) complex spectrum."""
    return jnp.real(spec) * jnp.real(spec) + jnp.imag(spec) * jnp.imag(spec)


def roll_iq(x: jnp.ndarray, base_idx: int) -> jnp.ndarray:
    """Roll the last axis so output[j] = x[(j + base_idx) % R].

    For IQ input ``base_idx = N/2 + 1`` puts the lowest frequency at
    bin 0 (reference src/fft_impl.cpp:148-153).  For real input
    base_idx == 0 and this is the identity.
    """
    if base_idx == 0:
        return x
    return jnp.roll(x, -base_idx, axis=-1)


def _pair_matrix(n: int) -> "np.ndarray":
    """[n, n//2] f32 0/1 matrix: (x @ m)[j] = x[2j] + x[2j+1].

    Each column has exactly two 1-entries, so every output bin of the
    matmul is a single f32 ``a + b`` (the other products are exact +0):
    bit-identical to the reference's adjacent-pair sum regardless of
    the MXU accumulation order.
    """
    import numpy as np
    m = np.zeros((n, n // 2), np.float32)
    m[np.arange(0, n, 2), np.arange(n // 2)] = 1.0
    m[np.arange(1, n, 2), np.arange(n // 2)] = 1.0
    return m


_PAIR_MATS = {n: _pair_matrix(n) for n in (128, 64, 32, 16, 8, 4, 2)}


def waterfall_pyramid(
    power0: jnp.ndarray,
    levels: int,
    size_log2: int,
) -> list[jnp.ndarray]:
    """Build the int8 waterfall pyramid from full-resolution power.

    ``power0``: [..., R] normalized power in *display order* (already
    rolled for IQ).  Returns ``levels`` int8 arrays, level i of width
    R >> i, with power offset ``size_log2 - i``
    (reference src/fft_impl.cpp:162-172: level 0 uses size_log2, each
    halving uses size_log2 - i - 1).

    Formulation (tools/pyr_bench.py shootout on v5e, [18, 2^20] x 11
    levels): adjacent-pair sums run on the MXU as 0/1-matrix matmuls
    along the lane-minor dim, which avoids both the cross-lane
    relayouts of strided slicing (16.3 ms) and the per-level
    reduce_window overhead (3.9 ms) -- 1.38 ms, bit-exact (see
    _pair_matrix).  The minor dim shrinks 128 -> 64 -> ... -> 2 -> 1;
    when it bottoms out the flat width is re-split by 128 (one tiny
    relayout at width R/128) and the chain restarts.  Widths below 256
    (small test configs) fall back to reduce_window.
    """
    out = [quantize_power(power0, size_log2)]
    p = power0
    lead = power0.shape[:-1]
    win = (1,) * (power0.ndim - 1) + (2,)
    i = 0
    while i < levels - 1:
        w = p.shape[-1]
        if w >= 256 and w % 128 == 0:
            p3 = p.reshape(*lead, w // 128, 128)
            n = 128
            while n >= 2 and i < levels - 1:
                p3 = jax.lax.dot_general(
                    p3, _PAIR_MATS[n], (((p3.ndim - 1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
                n //= 2
                i += 1
                q = quantize_power(p3, size_log2 - i)
                out.append(q.reshape(*lead, -1))
            p = p3.reshape(*lead, -1)
        else:
            # small-width tail: strided reduce_window pair sum (still the
            # exact a+b addition; cheap at these sizes)
            p = jax.lax.reduce_window(p, 0.0, jax.lax.add, win, win,
                                      "VALID")
            i += 1
            out.append(quantize_power(p, size_log2 - i))
    return out


def pyramid_flat(pyramid: list[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate pyramid levels into the reference's flat layout.

    quantizedbuf[0:R] = level0, then R/2, R/4, ... -- matches the pointer
    walk in the reference waterfall loop (src/websocket.cpp:207-236).
    """
    return jnp.concatenate(pyramid, axis=-1)


def pyramid_level_offsets(fft_result_size: int, levels: int) -> list[int]:
    """Byte offsets of each level inside the flat pyramid buffer."""
    offs = []
    o = 0
    for i in range(levels):
        offs.append(o)
        o += fft_result_size >> i
    return offs
