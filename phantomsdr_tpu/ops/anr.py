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
client ``{"cmd":"nr","enabled":true}``).

Two implementations share the math:

- ``anr_process_exact`` -- the per-sample lax.scan, a 1:1 transcription
  of ANR.c:65-119 (every step vectorized over [C]).  This is the
  semantic anchor, pinned 1e-4-relative against tests/oracle_anr.py.
  At the production WBFM shape ([128, 36864]) the scan costs ~32 ms on
  TPU: the body is a handful of [C, taps] ops, so the run is dominated
  by scan-step overhead times T, and unrolling measured flat
  (PERF.md round 3).
- ``anr_process`` -- the SHIPPED block-LMS reformulation (round 4).
  Weights are held frozen across a block of B samples; the block's
  predictions become one batched matmul (``win [C,B,taps] . w [C,taps]``)
  and the block's accumulated weight update a second one, so the scan
  runs T/B iterations of MXU-friendly work instead of T tiny ones.

Why block-LMS is faithful here: the reference's transcribed leak-index
quirk makes the leak CONSTANT.  Upstream wdsp raises lidx when
nev < nel and lowers it otherwise, but the reference's translation
nests the decrement in the increment's else-branch (ANR.c:100-105), so
a triggered non-saturating update nets +lincr - ldecr = -2 and clamps
at the 120.0 floor; lidx therefore only ever holds its 120.0 init (or
a reset 0.0) and ANY triggered update sets it to exactly 120.0
(saturation at lidx_max = 200 would need lidx > 199, unreachable).
The leak ngamma is a two-state automaton -- 0 until the first
nev < nel trigger after a zero-reset, then gamma * 120^4 * 6.25e-10
forever -- not a per-sample recursion.  The expression is reproduced
verbatim (and the oracle pins it) rather than "fixed": browser
listeners hear exactly this filter.

Documented deviation of the block path from ANR.c (the per-sample
path has none): within a block the prediction uses the block-start
weights and the leak automaton advances once per block, so outputs
differ from the exact filter during adaptation transients (the
converged fixed point is identical -- same gradient zero).  The
deviation is pinned by tests/test_nr.py: the block path must pass the
same tone-SNR-gain and notch-depth gates as the exact path, track the
exact path within a bound after convergence, and reduce to the exact
path bit-for-bit at block=1.  Stability: a block accumulates B
normalized gradients at the old weights, so the effective step is
~B*two_mu; ``anr_process`` caps the block size at 0.5/two_mu to stay
well inside the NLMS stability region for any configured gain.
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

# default weight-update block (samples).  36864-sample WBFM steps give
# 144 scan iterations; the 0.5/two_mu stability cap shrinks it for
# aggressive gains (e.g. two_mu=1e-3 -> 256 still, 8.192e-2 -> 6).
BLOCK_DEFAULT = 256


class ANRParams(NamedTuple):
    taps: int       # 16..128 (ANR.c:26)
    delay: int      # 2..128, <= taps
    two_mu: float   # adaptation gain, 1e-7..8.192e-2
    gamma: float    # leakage, 1e-3..8192
    notch: bool     # True: output error (auto-notch); False: 4*y (NR)
    block: int      # weight-update block size (1 = exact per-sample)


class ANRState(NamedTuple):
    hist: jnp.ndarray    # [C, taps+delay] newest-first delay line
    w: jnp.ndarray       # [C, taps] adaptive weights
    lidx: jnp.ndarray    # [C] leak index (pinned at 120 by the quirk)
    ngamma: jnp.ndarray  # [C] leak term (previous sample's value feeds
    #                      the nev detector, ANR.c:96)


def make_anr_params(notch: bool = False, taps: int = 64, delay: int = 8,
                    two_mu: float = 1e-4, gamma: float = 0.1,
                    block: int = BLOCK_DEFAULT) -> ANRParams:
    return ANRParams(taps=int(taps), delay=int(delay),
                     two_mu=float(two_mu), gamma=float(gamma),
                     notch=bool(notch), block=int(block))


def init_anr_state(num_channels: int, params: ANRParams | None) -> ANRState:
    """All-zero carries except the scalar floors; with ``params=None``
    the delay line/weights are zero-width (pytree kept stable).

    A zero-reset row (the pipeline's slot-reuse mask) differs from the
    C's malloc-time lidx=120/ngamma=0.001 only in the leak automaton's
    unarmed phase: until the first nev < nel trigger the reset row runs
    leak-free (c0 = 1 instead of 1 - two_mu*gamma*0.1296, a 1.3e-6
    relative difference per weight update), after which both coincide
    exactly.  The filter output in that phase is dominated by the
    zeroed weights/history either way."""
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


def anr_process_exact(state: ANRState, params: ANRParams, x: jnp.ndarray
                      ) -> tuple[ANRState, jnp.ndarray]:
    """Per-sample reference path: filter x [C, T] -> same shape
    (streaming-continuous; all history carried in state).  1:1 with
    ANR.c:65-119; the oracle-parity anchor for ``anr_process``."""
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


def _block_body(params: ANRParams, bsz: int):
    """One frozen-weight block update: carry x [C, bsz] -> carry, out.

    Sample n of the block predicts y_n = sum_j w_j x[n-delay-j] with
    the block-start weights -- over the block that is win . w with
    win[c, i, j] = seg[c, taps-1-j+i], seg = (taps+delay-1 history
    samples ++ block), built from `taps` static shifted slices (no
    lane gathers, cf. the CLAUDE.md take_along_axis lesson).  The
    accumulated weight update sum_n c1_n win_n is the transposed
    matmul; the leak multiplies once as lambda^bsz (per-sample
    lambda = 1 - two_mu*ngamma differs from that by O((B*two_mu*
    ngamma)^2) ~ 1e-10 relative).  At bsz=1 every one of these
    collapses to the exact per-sample step (pinned by
    tests/test_nr.py::test_anr_block1_matches_exact)."""
    taps, delay = params.taps, params.delay
    two_mu = jnp.float32(params.two_mu)
    gamma = jnp.float32(params.gamma)
    lkeep = taps + delay - 1          # history needed by the block

    def body(carry, xb):              # xb: [C, bsz]
        hist, w, lidx, ngamma = carry
        tail = hist[:, :lkeep][:, ::-1]            # oldest-first
        seg = jnp.concatenate([tail, xb], axis=1)  # [C, lkeep+bsz]
        win = jnp.stack(
            [jax.lax.slice_in_dim(seg, taps - 1 - j, taps - 1 - j + bsz,
                                  axis=1) for j in range(taps)],
            axis=2)                                # [C, bsz, taps]
        y = jnp.einsum('cbt,ct->cb', win, w)
        sigma = jnp.sum(win * win, axis=2)
        inv_sigp = 1.0 / (sigma + 1e-10)
        error = xb - y
        out = error if params.notch else 4.0 * y

        # leak automaton, advanced once per block: ANY nev < nel
        # trigger sets lidx to exactly LIDX_MIN (see module docstring);
        # nev uses the block-start ngamma (the exact path's "previous
        # sample" value, ANR.c:96).
        nel = jnp.abs(error * (1.0 - two_mu * sigma * inv_sigp))
        nev = jnp.abs(xb - (1.0 - two_mu * ngamma)[:, None] * y
                      - two_mu * error * sigma * inv_sigp)
        lidx = jnp.where(jnp.any(nev < nel, axis=1),
                         jnp.float32(LIDX_MIN), lidx)
        ngamma = gamma * (lidx * lidx) * (lidx * lidx) \
            * jnp.float32(DEN_MULT)

        lam = 1.0 - two_mu * ngamma                # post-update, as in
        g = jnp.einsum('cb,cbt->ct',               # the exact path's c0
                       two_mu * error * inv_sigp, win)
        w = (lam ** bsz)[:, None] * w + g
        hist = seg[:, -(taps + delay):][:, ::-1]   # newest-first
        return (hist, w, lidx, ngamma), out

    return body


def anr_process(state: ANRState, params: ANRParams, x: jnp.ndarray
                ) -> tuple[ANRState, jnp.ndarray]:
    """Block-LMS path (shipped): filter x [C, T] -> same shape.

    T is split into floor(T/B) full blocks scanned with
    ``_block_body`` plus one remainder block (its own static size), so
    any T works; B = min(params.block, 0.5/two_mu) for stability (see
    module docstring).  Block boundaries restart at every call --
    per-step output therefore depends (far below audibility, and
    gate-pinned) on the step length, unlike the exact path."""
    c, t = x.shape
    if t == 0:
        return state, x
    bsz = max(1, min(int(params.block), t,
                     int(0.5 / max(params.two_mu, 1e-9))))
    carry = (state.hist, state.w, state.lidx, state.ngamma)
    nb, rem = divmod(t, bsz)
    outs = []
    if nb:
        xs = x[:, :nb * bsz].reshape(c, nb, bsz).swapaxes(0, 1)
        carry, o = jax.lax.scan(_block_body(params, bsz), carry, xs)
        outs.append(o.swapaxes(0, 1).reshape(c, nb * bsz))
    if rem:
        carry, o = _block_body(params, rem)(carry, x[:, nb * bsz:])
        outs.append(o)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return ANRState(*carry), out
