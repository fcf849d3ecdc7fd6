"""Waterfall-pyramid formulation shootout on the real device.

The pyramid (reference src/fft_impl.cpp:45-61: per level, sum adjacent
power pairs, re-quantize with a decremented offset) is the largest
remaining device stage (4.68 ms of the 11.35 ms step at [18, 2^20],
PERF.md) vs a <1 ms HBM speed-of-light.  This tool measures candidate
formulations with the fori_loop slope harness (tools/profile.py) and
cross-checks their int8 output against the shipped one.

Variants:
  rw      -- shipped: per-level strided reduce_window + quantize
  mxu     -- pair-sums as [.., 128] @ [128, 64] 0/1-matrix matmuls
             (precision HIGHEST: each output bin is exactly one f32
             a+b, so bit-identical to the reference's pairwise chain),
             minor dim shrinking 128->64->...->1; coarse levels restart
             the chain after one tiny relayout
  mxu_cat -- same matmul idea but all 7 in-tile levels from ONE
             [128, 127] matmul from level 0 (NOT bit-exact: >2-term
             dot products accumulate in MXU order) -- measured for the
             speed bound only

Usage: python tools/pyr_bench.py [--hops 18] [--fft-log2 20] [--kbig 64]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile import slope, timed  # noqa: E402


def pair_matrix(n: int) -> np.ndarray:
    """[n, n//2] f32 0/1 matrix: y[j] = x[2j] + x[2j+1]."""
    m = np.zeros((n, n // 2), np.float32)
    m[np.arange(0, n, 2), np.arange(n // 2)] = 1.0
    m[np.arange(1, n, 2), np.arange(n // 2)] = 1.0
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fft-log2", type=int, default=20)
    ap.add_argument("--hops", type=int, default=18)
    ap.add_argument("--kbig", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from jax import lax

    from phantomsdr_tpu.ops.quantize import (
        waterfall_pyramid, pyramid_flat, quantize_power,
    )

    b = args.hops
    r = 1 << args.fft_log2
    levels = args.fft_log2 - 9          # down to 1024 wide: 11 at 2^20
    size_log2 = args.fft_log2

    print(f"# device={jax.devices()[0]} B={b} R=2^{args.fft_log2} "
          f"levels={levels}", file=sys.stderr, flush=True)

    power = jax.jit(
        lambda k: jax.random.uniform(k, (b, r), jnp.float32, 1e-9, 1e-2)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(power)

    # ---- shipped formulation ----
    def f_rw(p):
        return pyramid_flat(waterfall_pyramid(p, levels, size_log2))

    # ---- MXU pairwise chain (bit-exact) ----
    pms = {n: pair_matrix(n) for n in (128, 64, 32, 16, 8, 4, 2)}

    def _chain(p3, lev0_offset, n_levels, quantized):
        """p3: [B, T, 128] power; emits n_levels quantized halvings."""
        cur = p3
        n = 128
        for i in range(n_levels):
            cur = lax.dot_general(
                cur, pms[n], (((2,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST)
            n //= 2
            q = quantize_power(cur, lev0_offset - i - 1)
            quantized.append(q.reshape(q.shape[0], -1))
        return cur

    def f_mxu(p):
        q = [quantize_power(p, size_log2)]
        p3 = p.reshape(b, r // 128, 128)
        fine = min(7, levels - 1)
        last = _chain(p3, size_log2, fine, q)          # levels 1..fine
        rem = levels - 1 - fine
        if rem > 0:
            # last: [B, R/128, 128>>fine] -> restart chain on [B, *, 128]
            t = last.reshape(b, -1)
            last = _chain(t.reshape(b, t.shape[1] // 128, 128),
                          size_log2 - fine, rem, q)
        return jnp.concatenate(q, axis=-1)

    # ---- single concat matmul (speed bound, not bit-exact) ----
    blocks = []
    for i in range(1, 8):
        m = np.zeros((128, 128 >> i), np.float32)
        w = 1 << i
        for j in range(128 >> i):
            m[j * w:(j + 1) * w, j] = 1.0
        blocks.append(m)
    p_cat = np.concatenate(blocks, axis=1)  # [128, 127]

    def f_mxu_cat(p):
        q = [quantize_power(p, size_log2)]
        p3 = p.reshape(b, r // 128, 128)
        y = lax.dot_general(p3, p_cat, (((2,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
        o = 0
        fine = min(7, levels - 1)
        last = None
        for i in range(1, fine + 1):
            w = 128 >> i
            qi = y[..., o:o + w]
            q.append(quantize_power(qi, size_log2 - i).reshape(b, -1))
            if i == fine:
                last = qi
            o += w
        rem = levels - 1 - fine
        if rem > 0:
            t = last.reshape(b, -1)
            cur = t.reshape(b, t.shape[1] // 128, 128)
            n = 128
            for i in range(rem):
                cur = lax.dot_general(cur, pms[n], (((2,), (0,)), ((), ())),
                                      precision=lax.Precision.HIGHEST)
                n //= 2
                q.append(quantize_power(cur, size_log2 - fine - i - 1)
                         .reshape(b, -1))
        return jnp.concatenate(q, axis=-1)

    variants = {"rw": f_rw, "mxu": f_mxu, "mxu_cat": f_mxu_cat}

    # ---- correctness cross-check (device) ----
    ref = np.asarray(jax.jit(f_rw)(power))
    for name, fn in variants.items():
        out = np.asarray(jax.jit(fn)(power))
        neq = int((out != ref).sum())
        print(f"# {name}: shape={out.shape} mismatches_vs_rw={neq} "
              f"({neq / ref.size:.2e})", file=sys.stderr, flush=True)

    # ---- timing ----
    results = {}
    for name, fn in variants.items():
        t = slope(fn, lambda y: jnp.sum(y.astype(jnp.float32)),
                  power, args.kbig)
        results[name] = round(t * 1e3, 3)
        print(f"# {name}: {t * 1e3:.3f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
