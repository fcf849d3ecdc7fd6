"""Unrolled per-sample ``lax.scan`` shared by the PLL/LMS recursions.

lax.scan costs ~0.25 us of scan-step overhead per iteration on TPU
regardless of body size (PERF.md), which dominates cheap per-sample
bodies.  ``unrolled_scan`` runs k samples inside each scan step: the k
updates execute in the same sequential order, so the math is
bit-identical to the per-sample scan (pinned by
tests/test_stereo.py::test_scan_unroll_bit_identical).  CPU measures
the opposite (~20% slower from the [k, C] slicing), so ``scan_unroll``
resolves to 1 there at trace time.

Used by ops/stereo.py (pilot PLL), ops/channelizer.py (AM carrier-sync
PLL) and ops/anr.py (wdsp LMS/notch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# per-sample PLL bodies are a handful of flops: overhead-dominated,
# deep unroll pays
PLL_UNROLL = 16
# the LMS body is [C, taps]-heavy, so scan overhead is a smaller
# fraction of the step
LMS_UNROLL = 8


def scan_unroll(t: int, k: int) -> int:
    """Effective unroll factor for a length-t per-sample scan: k on
    accelerators when it divides t, else 1 (also 1 on CPU)."""
    if t % k != 0 or jax.default_backend() == "cpu":
        return 1
    return k


def unrolled_scan(step, carry, xs, k: int):
    """Scan a per-sample recursion over the TIME axis of xs, k samples
    per lax.scan step.

    step(carry, x_i) -> (carry, out_i), where x_i is one [C] sample
    column (or a tuple of them when xs is a tuple of same-shaped [C, T]
    arrays) and out_i is a [C] output column.

    Returns (final_carry, outs [C, T]).
    """
    single = not isinstance(xs, (tuple, list))
    xs_t = (xs,) if single else tuple(xs)
    t = xs_t[0].shape[1]
    resh = tuple(x.T.reshape(t // k, k, -1) for x in xs_t)

    def body(carry, xk):
        outs = []
        for i in range(k):
            xi = xk[0][i] if single else tuple(x[i] for x in xk)
            carry, o = step(carry, xi)
            outs.append(o)
        return carry, jnp.stack(outs)

    carry, outs = jax.lax.scan(body, carry, resh)
    return carry, outs.reshape(t, -1).T
