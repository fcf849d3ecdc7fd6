"""DC blocker and look-ahead AGC as carry-threaded, vectorizable ops.

Reference semantics:

- DC blocker (src/utils.h:139-169): two cascaded length-D moving
  averages; ``out[t] = x[t-D+1] - MA_D(MA_D(x))[t]`` where
  ``D = audio_max_sps / 750 * 2`` (integer division, src/signal.cpp:54).
  The double moving average is a triangular FIR; we compute it with
  cumulative sums over [carry_tail, block] instead of a per-sample
  circular buffer -- same numbers, fully vectorized.

- Look-ahead AGC (src/utils/audioprocessing.cpp:5-73, constructed with
  (0.2, 50ms, 300ms, 200ms, audio_max_sps) at src/signal.cpp:55):
  window W = lookahead_ms * sr / 1000 samples; once W samples have been
  pushed, ``out[t] = x[t-W+1] * gain[t]`` where
  ``peak[t] = max |x[t-W+1 .. t]|``, ``desired = 0.2 / (peak + 1e-10)``
  and gain follows attack/release first-order smoothing
  (attack when desired < gain).  Before W samples: output 0.
  The sliding max is computed with the block prefix/suffix-max trick
  (O(n), vectorized); only the scalar gain recursion stays a lax.scan.

Both carry their state explicitly so they live inside the jitted hop
function; state rows are per-channel.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- DC blocker

class DCBlockerState(NamedTuple):
    tail: jnp.ndarray  # [C, 2D-2] last inputs (zeros-initialized like the
    #                    reference's zero-filled circular buffers)


def dc_blocker_delay(audio_max_sps: int) -> int:
    """D = audio_max_sps / 750 * 2 with C++ integer division (signal.cpp:54)."""
    return (audio_max_sps // 750) * 2


def init_dc_state(num_channels: int, delay: int) -> DCBlockerState:
    return DCBlockerState(tail=jnp.zeros((num_channels, 2 * delay - 2), jnp.float32))


def _sliding_mean(y: jnp.ndarray, d: int) -> jnp.ndarray:
    """Mean over trailing window of d along last axis; output[i] is the
    mean of y[..., i-d+1 : i+1], defined for i >= d-1 (length L-d+1)."""
    c = jnp.cumsum(y, axis=-1)
    zero = jnp.zeros(y.shape[:-1] + (1,), y.dtype)
    c = jnp.concatenate([zero, c], axis=-1)  # c[i] = sum of first i
    return (c[..., d:] - c[..., :-d]) * (1.0 / d)


def dc_blocker(state: DCBlockerState, x: jnp.ndarray, delay: int
               ) -> tuple[DCBlockerState, jnp.ndarray]:
    """Apply the cascaded-MA DC blocker to a block x: [C, L]."""
    d = delay
    y = jnp.concatenate([state.tail, x], axis=-1)       # [C, 2D-2+L]
    ma1 = _sliding_mean(y, d)                            # [C, D-1+L], pos i ~ y idx d-1+i
    ma2 = _sliding_mean(ma1, d)                          # [C, L], pos i ~ y idx 2d-2+i
    # out[t] = oldest element of MA1 buffer = x[t - D + 1]  (utils.h:148)
    delayed = y[..., d - 1 : d - 1 + x.shape[-1]]
    out = delayed - ma2
    new_tail = y[..., -(2 * d - 2):]
    return DCBlockerState(tail=new_tail), out


# ----------------------------------------------------------------------- AGC

class AGCState(NamedTuple):
    tail: jnp.ndarray   # [C, W-1] last raw inputs
    gain: jnp.ndarray   # [C] smoothed gain (reset/init 0, audioprocessing.cpp:70)
    seen: jnp.ndarray   # [C] int32 samples pushed so far


class AGCParams(NamedTuple):
    window: int          # look-ahead samples
    attack_coeff: float
    release_coeff: float
    desired_level: float


def make_agc_params(sample_rate: int, desired_level: float = 0.2,
                    attack_ms: float = 50.0, release_ms: float = 300.0,
                    lookahead_ms: float = 200.0) -> AGCParams:
    """Coefficients per src/utils/audioprocessing.cpp:10-15."""
    w = int(lookahead_ms * sample_rate / 1000.0)
    att = 1.0 - np.exp(-1.0 / (attack_ms * 0.001 * sample_rate))
    rel = 1.0 - np.exp(-1.0 / (release_ms * 0.001 * sample_rate))
    return AGCParams(window=w, attack_coeff=float(att),
                     release_coeff=float(rel), desired_level=desired_level)


def init_agc_state(num_channels: int, window: int) -> AGCState:
    return AGCState(
        tail=jnp.zeros((num_channels, window - 1), jnp.float32),
        gain=jnp.zeros((num_channels,), jnp.float32),
        seen=jnp.zeros((num_channels,), jnp.int32),
    )


def _sliding_max_abs(y: jnp.ndarray, w: int, out_len: int) -> jnp.ndarray:
    """max |y[..., i : i+w]| for i in [0, out_len) via block prefix/suffix max.

    y: [..., M] with M >= out_len + w - 1.

    Two formulations, both exact; picked statically by shape:

    - w > out_len (the production case: AGC look-ahead w = 200 ms of
      audio >> out_len = one hop of samples): block by OUT_LEN.  The
      window [i, i+w) then always covers the tail of block 0
      (suffix-cummax over out_len lanes), a run of FULLY-covered
      interior blocks (plain per-block max + one tiny cummax over the
      block axis), and a partial final block k1 = (i+w-1)//out_len
      which takes at most two distinct values over i (prefix-cummax of
      those <=2 blocks; the per-i position (i+w-1) % out_len is a
      static lane rotation).  Lane-axis cummax work drops from
      O(nblocks*w) lanes to O(3*out_len): measured 15.4 -> sub-ms at
      [18*2048, 180] with w=2400 on a v5e (PERF.md round 4; the old
      blocking made the AGC the scaling bottleneck past 1024 channels).
    - w <= out_len: the original block-by-w prefix/suffix scheme.
    """
    a = jnp.abs(y)
    m = a.shape[-1]

    if w > out_len > 0:
        ln = out_len
        nblocks = -(-m // ln)
        pad = nblocks * ln - m
        if pad:
            neg = jnp.full(a.shape[:-1] + (pad,), -1.0, a.dtype)
            a = jnp.concatenate([a, neg], axis=-1)
        ab = a.reshape(a.shape[:-1] + (nblocks, ln))
        lastx = a.ndim - 1  # lax.cummax rejects negative axes
        suffix0 = jax.lax.cummax(ab[..., 0, ::-1], axis=lastx)[..., ::-1]
        block_max = jnp.max(ab, axis=-1)              # [..., nblocks]
        k1 = (np.arange(ln) + w - 1) // ln            # static, <=2 values
        shift = (w - 1) % ln
        out = suffix0
        for kv in np.unique(k1):
            pref = jax.lax.cummax(ab[..., int(kv), :], axis=lastx)
            pref_r = jnp.roll(pref, -shift, axis=-1)  # pref[(i+w-1) % ln]
            if kv >= 2:
                interior = jnp.max(block_max[..., 1:int(kv)], axis=-1,
                                   keepdims=True)
                cand = jnp.maximum(pref_r, interior)
            else:
                cand = pref_r
            out = jnp.where(jnp.asarray(k1 == kv), jnp.maximum(out, cand),
                            out)
        return out

    nblocks = -(-m // w)
    pad = nblocks * w - m
    neg = jnp.full(a.shape[:-1] + (pad,), -1.0, a.dtype)
    ab = jnp.concatenate([a, neg], axis=-1).reshape(a.shape[:-1] + (nblocks, w))
    last = ab.ndim - 1
    prefix = jax.lax.cummax(ab, axis=last)
    suffix = jax.lax.cummax(ab[..., ::-1], axis=last)[..., ::-1]
    prefix = prefix.reshape(a.shape[:-1] + (nblocks * w,))
    suffix = suffix.reshape(a.shape[:-1] + (nblocks * w,))
    # window [i, i+w): spans end of i's block (suffix[i]) and start of the
    # block containing i+w-1 (prefix[i+w-1])
    return jnp.maximum(suffix[..., :out_len], prefix[..., w - 1 : w - 1 + out_len])


def agc_process(state: AGCState, x: jnp.ndarray, params: AGCParams
                ) -> tuple[AGCState, jnp.ndarray]:
    """Apply the look-ahead AGC to block x: [C, L] -> [C, L] output."""
    w = params.window
    c, l = x.shape
    y = jnp.concatenate([state.tail, x], axis=-1)        # [C, W-1+L]
    peaks = _sliding_max_abs(y, w, l)                     # [C, L] peak over window ending at x[i]
    delayed = y[..., :l]                                  # x[t-W+1]
    full = (state.seen[:, None] + jnp.arange(1, l + 1)[None, :]) >= w  # [C, L]

    def body(gain, inputs):
        peak, dly, isfull = inputs                        # [C] each
        desired = params.desired_level / (peak + 1e-10)
        attack = gain - params.attack_coeff * (gain - desired)
        release = gain + params.release_coeff * (desired - gain)
        new_gain = jnp.where(desired < gain, attack, release)
        new_gain = jnp.where(isfull, new_gain, gain)
        out = jnp.where(isfull, dly * new_gain, 0.0)
        return new_gain, out

    gain, out_t = jax.lax.scan(
        body, state.gain, (peaks.T, delayed.T, full.T)
    )
    new_state = AGCState(
        tail=y[..., -(w - 1):],
        gain=gain,
        # clamp at the window: only "have we filled the look-ahead yet"
        # matters, and an unbounded int32 would wrap negative after
        # ~2^31 samples (~50 h at 12 kHz) and silence the channel
        seen=jnp.minimum(state.seen + l, w),
    )
    return new_state, out_t.T
