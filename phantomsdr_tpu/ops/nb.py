"""Device-side Wild noise blanker (impulse localization + LPC repair).

The reference runs this in the BROWSER (jsdsp/lib/NB.c, the
Teensy-ConvolutionSDR "Wild" blanker): per frame it fits an LPC model
of the voice via Levinson-Durbin on the frame's autocorrelation,
inverse-filters to whiten the speech, matched-filters to sharpen
impulses, thresholds against the residual variance to locate up to 20
impulse positions, and replaces +-PL samples around each with a
linear crossfade of forward and backward LPC predictions.

Server-side equivalent, batched [C, T] over the channel population as
an opt-in (``[input] nr = true`` with ``nr_algo = "nb"``):

- autocorrelation lags and the Levinson-Durbin recursion unroll over
  the static order (taps), every step vectorized over [C],
- the two FIR passes are one grouped conv each (per-channel
  coefficients, feature_group_count = C); arm_fir's per-call zero
  state (NB.c:156,167) is reproduced by zero left-padding,
- the sequential impulse search (skip-ahead by PL on detection,
  20-impulse cap) is a lax.scan over positions,
- repairs unroll over the 20 impulse slots, masked by the per-channel
  impulse count, sequentially -- a later impulse's prediction basis
  can include an earlier repair, exactly like the C's in-place writes.

Faithful-to-the-C quirks reproduced (oracle: tests/oracle_nb.py):
the R[0] * (1+1e-9) inflation, lpc_power summing only lpcs[0..order-1]
(NB.c:177 passes `order`), unbiased variance (arm_var_f32), and the
frame being whatever chunk the caller passes (the browser passes its
audio-buffer length; here one frame = one hop-batch stream, so the
threshold statistics adapt per step).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

N_IMPULSE_COUNT = 20


class NBParams(NamedTuple):
    thresh: float    # detection level in residual sigmas (~3..10)
    taps: int        # LPC order (<= 40, NB.c:19)
    impulse_len: int # samples replaced around an impulse (odd)


class NBState(NamedTuple):
    tail: jnp.ndarray   # [C, 2*order + 2*PL] previous frame's tail


def make_nb_params(thresh: float = 5.0, taps: int = 32,
                   samples: int = 11) -> NBParams:
    il = int(samples) | 1
    return NBParams(thresh=float(thresh), taps=int(taps), impulse_len=il)


def init_nb_state(num_channels: int, params: NBParams | None) -> NBState:
    order = params.taps if params is not None else 0
    pl = (params.impulse_len - 1) // 2 if params is not None else 0
    return NBState(tail=jnp.zeros((num_channels, 2 * order + 2 * pl),
                                  jnp.float32))


def _levinson(r: jnp.ndarray, order: int) -> jnp.ndarray:
    """Batched Levinson-Durbin exactly as transcribed (NB.c:120-148).
    r: [C, order+1] autocorrelation -> lpcs [C, order+1], lpcs[:,0]=1."""
    c = r.shape[0]
    r = r.at[:, 0].multiply(1.0 + 1.0e-9)
    lpcs = jnp.concatenate([jnp.ones((c, 1), jnp.float32),
                            jnp.zeros((c, order), jnp.float32)], axis=1)
    alfa = r[:, 0]
    for m in range(1, order + 1):
        s = jnp.zeros((c,), jnp.float32)
        for u in range(1, m):
            s = s + lpcs[:, u] * r[:, m - u]
        k = -(r[:, m] + s) / alfa
        if m > 1:
            upd = lpcs[:, 1:m] + k[:, None] * lpcs[:, 1:m][:, ::-1]
            lpcs = lpcs.at[:, 1:m].set(upd)
        lpcs = lpcs.at[:, m].set(k)
        alfa = alfa * (1.0 - k * k)
    return lpcs


def _fir_fresh(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """arm_fir_f32 with per-call zero state, per-channel coefficients.
    coeffs [C, NT] in CMSIS order (applied time-reversed):
    y[n] = sum_k coeffs[NT-1-k] * x[n-k].  x [C, T] -> [C, T]."""
    c, nt = coeffs.shape
    xp = jnp.pad(x, ((0, 0), (nt - 1, 0)))
    # conv correlates rhs over lhs: out[n] = sum_j rhs[j] * lhs[n+j]
    # with VALID padding; out[n] = sum_j rhs[j] x[n-(NT-1)+j], so
    # rhs = coeffs gives sum_k coeffs[NT-1-k] x[n-k] directly
    return jax.lax.conv_general_dilated(
        xp[None], coeffs[:, None, :], window_strides=(1,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=c,
    )[0]


def nb_process(state: NBState, params: NBParams, x: jnp.ndarray
               ) -> tuple[NBState, jnp.ndarray]:
    """Blank impulses in the stream x [C, T] -> same shape (streaming:
    the 2*order+2*PL tail is carried across calls)."""
    c, t = x.shape
    order = params.taps
    il = params.impulse_len
    pl = (il - 1) // 2

    wb = jnp.concatenate([state.tail, x], axis=1)   # [C, 2PL+2o+T]
    base = wb[:, order + pl: order + pl + t]

    # ---- autocorrelation lags (static unroll over order+1) ----
    r = jnp.stack([jnp.sum(base[:, : t - i] * base[:, i: t], axis=1)
                   for i in range(order + 1)], axis=1)
    lpcs = _levinson(r, order)
    rev = lpcs[:, ::-1]

    # ---- whiten + matched filter (fresh state per frame) ----
    temp = _fir_fresh(rev, base)
    temp = _fir_fresh(lpcs, temp)

    mean = jnp.mean(temp, axis=1, keepdims=True)
    sigma2 = jnp.sum((temp - mean) ** 2, axis=1) / jnp.float32(t - 1)
    lpc_power = jnp.sum(lpcs[:, :order] ** 2, axis=1)  # excl. lpcs[order]
    thr = jnp.float32(params.thresh) * jnp.sqrt(sigma2 * lpc_power)

    # ---- impulse search with skip-ahead, in two stages.  The
    # detection predicate |residual| > thr is static per frame, so
    # find the candidates first and run the sequential greedy pass
    # (select if past the skip-ahead point, then suppress the next PL
    # positions, cap 20 -- NB.c:193-200) over only the COMPACTED
    # earliest candidates: each selection suppresses at most PL
    # candidates, so the first 20*(PL+1) candidates per channel fully
    # determine every selection.  This turns the old per-sample scan
    # over all T positions (~36800 sequential steps, ~6 ms on TPU even
    # xs-sliced) into one [C, T] compare + top_k + a 120-step scan.
    pos_dom = jnp.arange(order + pl, t, dtype=jnp.int32)
    cand_pos = jnp.where(jnp.abs(temp[:, order + pl:]) > thr[:, None],
                         pos_dom[None, :], jnp.int32(t))     # t = "none"
    k_cand = min(N_IMPULSE_COUNT * (pl + 1), pos_dom.shape[0])
    neg_top, _ = jax.lax.top_k(-cand_pos, k_cand)
    cpos = -neg_top                    # [C, K] ascending candidate pos

    def search(carry, pos):
        nxt, count, positions = carry
        det = ((pos < t) & (pos >= nxt) & (count < N_IMPULSE_COUNT))
        onehot = (jnp.arange(N_IMPULSE_COUNT)[None, :]
                  == count[:, None]) & det[:, None]
        positions = jnp.where(onehot, (pos - order)[:, None], positions)
        nxt = jnp.where(det, pos + pl + 1, nxt)
        count = count + det.astype(jnp.int32)
        return (nxt, count, positions), None

    init = (jnp.full((c,), order + pl, jnp.int32),
            jnp.zeros((c,), jnp.int32),
            jnp.zeros((c, N_IMPULSE_COUNT), jnp.int32))
    (nxt, count, positions), _ = jax.lax.scan(search, init, cpos.T)

    # ---- prediction transfer functions (negated, NB.c:218-219) ----
    fwd = -rev[:, :order]          # [lpc_order .. lpc_1] negated
    bwd = -lpcs[:, 1: order + 1]   # [lpc_1 .. lpc_order] negated

    wbw = jnp.asarray(np.arange(il, dtype=np.float32) / (il - 1))
    wfw = wbw[::-1]
    rows = jnp.arange(c)[:, None]
    hi = jax.lax.Precision.HIGHEST

    # ---- per-frame prediction-coefficient matrices.  The C's il-step
    # forward/backward LPC recursions (NB.c:227-243) are LINEAR in
    # their order-sample basis, so each folds into an [il, order]
    # matrix built ONCE per frame (a single il-step scan over
    # [C, order, order] coefficient buffers) instead of re-running a
    # per-sample scan inside every one of the 20 repair slots:
    # fpred_j = Cf @ rfw_j and the backward patch = Cb_rev @ rbw_j.
    # This cuts the sequential chain from 20*(2*il) dependent steps to
    # 2*il + 20 and is the main part of the 58 -> <20 ms NB win.
    eye = jnp.broadcast_to(jnp.eye(order, dtype=jnp.float32),
                           (c, order, order))

    def fcoef(bmat, _):
        ci = jnp.einsum("co,cok->ck", fwd, bmat, precision=hi)
        return jnp.concatenate([bmat[:, 1:], ci[:, None, :]], axis=1), ci

    _, cf = jax.lax.scan(fcoef, eye, None, length=il)      # [il, C, order]
    coef_f = cf.transpose(1, 0, 2)                         # [C, il, order]

    def bcoef(bmat, _):
        ci = jnp.einsum("co,cok->ck", bwd, bmat, precision=hi)
        return jnp.concatenate([ci[:, None, :], bmat[:, :-1]], axis=1), ci

    _, cb = jax.lax.scan(bcoef, eye, None, length=il)
    coef_b_rev = cb[::-1].transpose(1, 0, 2)               # [C, il, order]

    # ---- ONE gather for every slot's whole working span.  For slot j
    # the forward basis wb[pos..pos+order), the repair window
    # wb[order+pos..order+pos+il) and the backward basis
    # wb[order+pos+il..order+pos+il+order) (= wb[order+pl+pos+pl+1+k],
    # NB.c:222-225) are CONTIGUOUS, so all 3*20 data-dependent gathers
    # from the big [C, T'] buffer collapse into one [C, 20, 2*order+il]
    # take_along_axis -- data-dependent lane gathers are the expensive
    # op on TPU (PERF.md), so none remain inside the chain.
    w_span = 2 * order + il
    idx_g = positions[:, :, None] + jnp.arange(w_span)[None, None, :]
    spans = jnp.take_along_axis(wb, idx_g.reshape(c, -1), axis=1)
    spans = spans.reshape(c, N_IMPULSE_COUNT, w_span)
    rfw_orig = spans[:, :, :order]                # [C, 20, order]
    orig_patch = spans[:, :, order: order + il]   # [C, 20, il]
    rbw_all = spans[:, :, order + il:]            # [C, 20, order]

    # Backward patches hoist entirely: positions are strictly
    # increasing, so an earlier repair (ending at order+pos_i+il-1 <
    # order+pos_j+il) can never reach a later slot's backward basis --
    # the C's sequential in-place reads there always see original
    # samples.
    bpatch_all = jnp.einsum("cio,cjo->cji", coef_b_rev, rbw_all,
                            precision=hi)                  # [C, 20, il]

    # ---- sequential repairs over the 20 slots, on SMALL windows only.
    # Only the FORWARD basis (the order samples immediately before a
    # repair window) can see earlier repaired samples -- the C's
    # in-place semantics (oracle-pinned).  The chain carries a sliding
    # [C, order+il] correction window acc = (repaired - original)
    # anchored at the current patch span: slide it by the position
    # delta, add its basis part to the original basis, predict, and
    # record this patch's correction.  No [C, T']-array op remains in
    # the chain; per step it is one [C, 43]-window shift-gather and one
    # [C, il, order] matvec.
    valid_all = (jnp.arange(N_IMPULSE_COUNT)[:, None]
                 < count[None, :])                         # [20, C]
    wk = jnp.arange(w_span - order)[None, :]               # [1, order+il]

    def repair(carry, inp):
        acc, prev_pos = carry                # [C, order+il], [C]
        pos, rfw0, opatch, bpatch, valid = inp
        shift = pos - prev_pos
        accp = jnp.concatenate(
            [acc, jnp.zeros_like(acc)], axis=1)            # [C, 2W]
        acc = jnp.take_along_axis(
            accp, jnp.clip(wk + shift[:, None], 0,
                           accp.shape[1] - 1), axis=1)
        rfw = rfw0 + acc[:, :order]
        fpred = jnp.einsum("cio,co->ci", coef_f, rfw, precision=hi)
        patch = wfw[None, :] * fpred + wbw[None, :] * bpatch
        corr = patch - opatch
        acc = acc.at[:, order:].set(
            jnp.where(valid[:, None], corr, acc[:, order:]))
        return (acc, pos), patch

    init_rep = (jnp.zeros((c, w_span - order), jnp.float32),
                positions[:, 0])
    _, patches = jax.lax.scan(
        repair, init_rep,
        (positions.T, rfw_orig.transpose(1, 0, 2),
         orig_patch.transpose(1, 0, 2), bpatch_all.transpose(1, 0, 2),
         valid_all))
    patches = patches.transpose(1, 0, 2)                   # [C, 20, il]

    # ---- ONE writeback scatter.  Sequential application order only
    # matters where repair windows overlap, and with strictly
    # increasing positions only the NEXT slot can overwrite part of a
    # patch (pos_{j+2} >= pos_{j+1} > truncation point), so truncating
    # each patch at the next valid slot's start leaves zero duplicate
    # targets; masked/invalid elements are sent out of range and
    # dropped.
    next_pos = jnp.concatenate(
        [positions[:, 1:], positions[:, -1:]], axis=1)     # [C, 20]
    next_valid = (jnp.arange(1, N_IMPULSE_COUNT + 1)[None, :]
                  < count[:, None])
    keep_len = jnp.where(next_valid,
                         jnp.minimum(il, next_pos - positions), il)
    keep = (valid_all.T[:, :, None]
            & (jnp.arange(il)[None, None, :] < keep_len[:, :, None]))
    idx_w = (order + positions)[:, :, None] + jnp.arange(il)[None, None]
    idx_w = jnp.where(keep, idx_w, wb.shape[1])            # OOB -> drop
    wb = wb.at[rows[:, None], idx_w].set(patches, mode="drop")

    out = wb[:, order + pl: order + pl + t]
    return NBState(tail=wb[:, t: t + 2 * order + 2 * pl]), out
