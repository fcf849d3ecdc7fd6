"""Polyphase decimating FIR, batched over the channel population.

The per-chip "polyphase filter/decimate" kernel from BASELINE.json's
north star.  The reference reaches baseband purely by frequency-domain
bin slicing (its decimation IS the bin slice, src/signal.cpp:126-214)
and never low-pass-decimates in the time domain; this op covers the
rate-conversion cases the reference leaves rough -- e.g. WBFM at
audio_sps=192000 feeding Opus, which is capped at 48 kHz
(src/audio.cpp:59): the reference stuffs 192 k samples/s into a 48 kHz
Opus encoder (a 4x pitch/time error); here the stream can be properly
filtered and decimated 4:1 on device first.

TPU mapping: the polyphase filter is expressed as a strided
`conv_general_dilated` over [C, L] with the prototype lowpass -- XLA
lowers it onto the conv/MXU path, batched across all channels at once.
State (filter tail) is carried across hops like the other audio ops.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


def design_lowpass(num_taps: int, cutoff: float, dtype=np.float32) -> np.ndarray:
    """Windowed-sinc prototype lowpass.

    cutoff: normalized to Nyquist (1.0 = fs/2).  Hamming window; unity
    DC gain.  (scipy.signal.firwin equivalent, kept dependency-free for
    the runtime path; tests cross-check against scipy.)
    """
    n = np.arange(num_taps, dtype=np.float64)
    m = (num_taps - 1) / 2.0
    h = np.sinc(cutoff * (n - m))
    h *= np.hamming(num_taps)
    h /= h.sum()
    return h.astype(dtype)


def decimator_taps(factor: int, taps_per_phase: int = 8) -> np.ndarray:
    """Anti-alias prototype for decimation by `factor`:
    cutoff at 0.8 of the output Nyquist, factor*taps_per_phase taps."""
    return design_lowpass(factor * taps_per_phase, 0.8 / factor)


class DecimatorState(NamedTuple):
    tail: jnp.ndarray  # [C, num_taps - 1] input history


def init_decimator_state(num_channels: int, num_taps: int) -> DecimatorState:
    return DecimatorState(
        tail=jnp.zeros((num_channels, num_taps - 1), jnp.float32))


def polyphase_decimate(state: DecimatorState, x: jnp.ndarray,
                       taps: np.ndarray, factor: int
                       ) -> tuple[DecimatorState, jnp.ndarray]:
    """Filter + decimate a block: [C, L] -> [C, L // factor].

    Streaming-continuous: y[c, k] = sum_t taps[t] * x_full[c, k*factor - t]
    with x_full the concatenation of all blocks (history carried in
    state).  L must be a multiple of factor.
    """
    c, l = x.shape
    assert l % factor == 0, "block length must be a multiple of the factor"
    nt = taps.shape[0]
    y_in = jnp.concatenate([state.tail, x], axis=1)     # [C, nt-1+L]
    # conv_general_dilated with window stride = decimation factor.
    # feature dims: treat channels as batch, 1 feature.
    lhs = y_in[:, None, :]                               # [C, 1, T]
    rhs = jnp.asarray(taps[::-1], jnp.float32)[None, None, :]  # [1, 1, nt]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(factor,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    # VALID windows start at offsets 0, factor, ...; window k covers
    # y_in[k*factor : k*factor + nt], i.e. output sample aligned to
    # input index k*factor + nt - 1 of the padded stream == k*factor - 1
    # + nt of x_full -- a pure (nt-1)-sample group delay, as expected.
    new_tail = y_in[:, -(nt - 1):]
    return DecimatorState(tail=new_tail), out[:, : l // factor]
