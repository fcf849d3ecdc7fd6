"""Device-side FM de-emphasis (single-pole IIR via associative scan).

Broadcast FM pre-emphasizes treble at the transmitter (+6 dB/octave
above 1/(2*pi*tau), tau = 75 us in the Americas / 50 us elsewhere);
a receiver must apply the matching de-emphasis pole or FM audio sounds
harsh and hissy.  The reference server ships the raw discriminator
output and leaves de-emphasis to the browser (its jsdsp FIR toolkit,
jsdsp/src/LiquidDSP.js, is how the frontend builds such filters);
here it is a server-side option (``[input] deemphasis = 75``) applied
on device to every FM listener at once.

TPU mapping: the filter is the linear recurrence

    y[n] = alpha * y[n-1] + (1 - alpha) * x[n],
    alpha = exp(-1 / (tau * fs))

which is NOT expressed as a per-sample lax.scan (the pattern every
other recursion in this codebase needs) but as a
``lax.associative_scan``: first-order linear recurrences compose
associatively ((A2,B2)o(A1,B1) = (A1*A2, A2*B1+B2)), so the whole
[C, T] block evaluates in O(log T) parallel steps on the VPU instead
of T sequential ones.  The cross-step carry y[-1] folds in exactly as
``alpha^(n+1) * y_prev`` (the scan's cumulative A is alpha^(n+1)).

Placement (pipeline.audio_from_spectra): AFTER the RDS tap and the
stereo demix -- the 19 kHz pilot, 38 kHz DSB and 57 kHz RDS
subcarriers must not see the pole (a 75 us pole is ~15 dB down at
38 kHz); real receivers de-emphasize each matrixed audio channel, not
the MPX.  Non-FM rows pass through untouched.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def deemph_alpha(audio_sps: int, tau_us: float) -> float:
    """Pole coefficient for a tau-microsecond de-emphasis at fs."""
    return math.exp(-1.0 / (tau_us * 1e-6 * float(audio_sps)))


def deemph_process(y_prev: jnp.ndarray, alpha: float, x: jnp.ndarray,
                   mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One block of streaming de-emphasis.

    y_prev: [R] carried output sample (per stream row), x: [R, T],
    mask: [R] bool (True rows filtered, False rows passed through).
    Returns (new y_prev, y [R, T]).
    """
    a = jnp.float32(alpha)
    b = (1.0 - a) * x                                  # [R, T]
    aa = jnp.broadcast_to(a, x.shape)

    def comb(left, right):
        al, bl = left
        ar, br = right
        return al * ar, ar * bl + br

    a_cum, b_cum = lax.associative_scan(comb, (aa, b), axis=1)
    y = a_cum * y_prev[:, None] + b_cum
    y = jnp.where(mask[:, None], y, x)
    return jnp.where(mask, y[:, -1], y_prev), y
