"""Device-side wdsp variable-leak LMS noise reduction / auto-notch.

The reference runs this in the BROWSER (jsdsp/lib/ANR.c, Warren
Pratt's wdsp ANR via Teensy-ConvolutionSDR): an adaptive FIR predicts
the current sample from `taps` samples that are `delay` samples old.
Periodic content (tones, carriers, correlated noise) is predictable at
that lag; impulsive/white content is not.  ``notch`` mode outputs the
prediction ERROR (kills carriers/tones), NR mode outputs 4x the
PREDICTION (keeps the correlated part, drops hiss).

Server-side equivalent, batched [C, T] over the channel population as
an opt-in (``[input] nr = true`` with ``nr_algo = "lms"|"notch"``, per
client ``{"cmd":"nr","enabled":true}``): the per-sample recursion is a
lax.scan over T with every step vectorized over [C] (the same pattern
as the AGC gain scan, ops/agc.py).

Faithful to ANR.c:65-119 including its transcribed leak-index quirk:
upstream wdsp raises lidx when nev < nel and lowers it otherwise, but
the reference's translation nests the decrement in the increment's
else-branch (ANR.c:100-105), so a non-saturated update nets
+lincr - ldecr = -2 and lidx can never leave its 120.0 floor; the
leak ngamma is effectively constant at gamma * 120^4 * 6.25e-10.  The
expression is reproduced verbatim (and the oracle pins it) rather
than "fixed" -- browser listeners hear exactly this filter.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

LIDX_INIT = 120.0
LIDX_MIN = 120.0
LIDX_MAX = 200.0
NGAMMA_INIT = 0.001
DEN_MULT = 6.25e-10
LINCR = 1.0
LDECR = 3.0


class ANRParams(NamedTuple):
    taps: int       # 16..128 (ANR.c:26)
    delay: int      # 2..128, <= taps
    two_mu: float   # adaptation gain, 1e-7..8.192e-2
    gamma: float    # leakage, 1e-3..8192
    notch: bool     # True: output error (auto-notch); False: 4*y (NR)


class ANRState(NamedTuple):
    hist: jnp.ndarray    # [C, taps+delay] newest-first delay line
    w: jnp.ndarray       # [C, taps] adaptive weights
    lidx: jnp.ndarray    # [C] leak index (pinned at 120 by the quirk)
    ngamma: jnp.ndarray  # [C] leak term (previous sample's value feeds
    #                      the nev detector, ANR.c:96)


def make_anr_params(notch: bool = False, taps: int = 64, delay: int = 8,
                    two_mu: float = 1e-4, gamma: float = 0.1) -> ANRParams:
    return ANRParams(taps=int(taps), delay=int(delay),
                     two_mu=float(two_mu), gamma=float(gamma),
                     notch=bool(notch))


def init_anr_state(num_channels: int, params: ANRParams | None) -> ANRState:
    """All-zero carries except the scalar floors; with ``params=None``
    the delay line/weights are zero-width (pytree kept stable).

    The zero lidx/ngamma differ from the C's malloc-time 120/0.001,
    but the very first sample's update pins lidx to LIDX_MIN = 120 (the
    quirk's floor) and recomputes ngamma from it, so after one sample
    the states coincide; the pipeline's one-shot reset (all-zeros)
    therefore re-arms correctly."""
    c = num_channels
    nt = params.taps if params is not None else 0
    nd = params.delay if params is not None else 0
    return ANRState(
        hist=jnp.zeros((c, nt + nd), jnp.float32),
        w=jnp.zeros((c, nt), jnp.float32),
        lidx=jnp.full((c,), LIDX_INIT if params is not None else 0.0,
                      jnp.float32),
        ngamma=jnp.full((c,), NGAMMA_INIT if params is not None else 0.0,
                        jnp.float32),
    )


def anr_process(state: ANRState, params: ANRParams, x: jnp.ndarray
                ) -> tuple[ANRState, jnp.ndarray]:
    """Filter the stream x [C, T] -> same shape (streaming-continuous;
    all history carried in state)."""
    taps, delay = params.taps, params.delay
    two_mu = jnp.float32(params.two_mu)
    gamma = jnp.float32(params.gamma)

    def step(carry, xn):                       # xn: [C]
        hist, w, lidx, ngamma = carry
        hist = jnp.concatenate([xn[:, None], hist[:, :-1]], axis=1)
        win = hist[:, delay: delay + taps]     # x[n-delay-j]
        y = jnp.sum(w * win, axis=1)
        sigma = jnp.sum(win * win, axis=1)
        inv_sigp = 1.0 / (sigma + 1e-10)
        error = xn - y
        out = error if params.notch else 4.0 * y

        nel = jnp.abs(error * (1.0 - two_mu * sigma * inv_sigp))
        nev = jnp.abs(xn - (1.0 - two_mu * ngamma) * y
                      - two_mu * error * sigma * inv_sigp)
        # the reference's verbatim (quirky) leak-index update
        l1 = lidx + jnp.float32(LINCR)
        l2 = l1 - jnp.float32(LDECR)
        upd = jnp.where(l1 > LIDX_MAX, jnp.float32(LIDX_MAX),
                        jnp.where(l2 < LIDX_MIN, jnp.float32(LIDX_MIN),
                                  l2))
        lidx = jnp.where(nev < nel, upd, lidx)
        ngamma = gamma * (lidx * lidx) * (lidx * lidx) \
            * jnp.float32(DEN_MULT)

        c0 = (1.0 - two_mu * ngamma)[:, None]
        c1 = (two_mu * error * inv_sigp)[:, None]
        w = c0 * w + c1 * win
        return (hist, w, lidx, ngamma), out

    from . import unroll

    k = unroll.scan_unroll(x.shape[1], unroll.LMS_UNROLL)
    (hist, w, lidx, ngamma), outs = unroll.unrolled_scan(
        step, (state.hist, state.w, state.lidx, state.ngamma), x, k)
    return ANRState(hist=hist, w=w, lidx=lidx, ngamma=ngamma), outs
