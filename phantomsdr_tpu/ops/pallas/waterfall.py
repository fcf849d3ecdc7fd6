"""Pallas TPU kernel: fused int8-dB quantize + waterfall pyramid.

Replaces the reference's power_and_quantize / half_and_quantize kernel
chain (reference: src/fft_impl.cpp:24-61 CPU, src/fft_cuda.cu:101-130
CUDA): given the per-bin power of one hop batch, produce every pyramid
level's int8 row in ONE pass over HBM.

The XLA formulation materializes an f32 power array per level
(read 4(R + R/2 + ...) + write ~4R bytes of f32 intermediates); the
fused kernel reads each power tile into VMEM once and emits only the
int8 rows (~2R bytes total output), computing all in-tile pyramid
levels from registers/VMEM.  Levels coarser than one tile are finished
outside the kernel from the per-tile power sums it also emits (those
arrays are tiny: R / TILE elements).

Layout contract matches ops.quantize.waterfall_pyramid exactly:
level i has width R >> i and power offset size_log2 - i.

Status: semantics verified (interpret-mode golden tests); on the
current Mosaic toolchain the in-kernel adjacent-pair halving
(``reshape(b, t/2, 2)``: minor-most lane split) does not lower.  The
production XLA path (ops.quantize) was re-measured honestly in round 2
with the fori_loop slope harness (round-1's "~0.02 ms" timed async
dispatch): the lane-stride-2 formulation cost 16.3 ms for [18, 2^20]
x 11 levels and was replaced by strided ``reduce_window`` pair sums at
4.7 ms (direct-from-level-0 and single-fused-quantize variants measured
worse; see PERF.md).  The fused-kernel idea this file implements
remains the theoretical SOL (<1 ms) -- revisit if Mosaic gains
lane-minor reshapes or strided lane slices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantize import _DB_PER_OCTAVE, _LOG2_TO_DB, quantize_power


def _quantize_block(p, power_offset):
    db = jnp.log2(jnp.maximum(p, 1e-45)) * _LOG2_TO_DB + (
        127.0 + power_offset * _DB_PER_OCTAVE
    )
    db = jnp.where(p > 0, db, -128.0)
    return jnp.clip(jnp.trunc(db), -128.0, 127.0).astype(jnp.int8)


def _pyramid_kernel(power_ref, *out_refs, in_tile_levels: int,
                    size_log2: int):
    """Grid: (ntiles,).  power_ref: [B, T] f32 tile.  Outputs: one int8
    ref per in-tile level ([B, T >> l]) plus the power at the last
    in-tile resolution ([B, T >> (levels-1)] f32) for the coarse tail."""
    p = power_ref[...]
    b = p.shape[0]
    for lev in range(in_tile_levels):
        out_refs[lev][...] = _quantize_block(p, size_log2 - lev)
        if lev + 1 < in_tile_levels:
            t = p.shape[-1]
            p = p.reshape(b, t // 2, 2).sum(axis=-1)
    out_refs[in_tile_levels][...] = p


@functools.partial(jax.jit, static_argnames=("levels", "size_log2", "tile",
                                             "interpret"))
def fused_waterfall_pyramid(power: jnp.ndarray, levels: int, size_log2: int,
                            tile: int = 1 << 15,
                            interpret: bool = False) -> jnp.ndarray:
    """power: [B, R] f32 in display order -> [B, P] flat int8 pyramid."""
    b, r = power.shape
    tile = min(tile, r)
    ntiles = r // tile
    assert r % tile == 0, "fft_result_size must be a multiple of the tile"
    # Mosaic requires output block lane width >= 128 (or == full width):
    # stop in-tile halving at 128 lanes and finish the tail outside.
    max_in_tile = max(1, int(math.log2(tile)) - 7 + 1)
    in_tile_levels = min(levels, max_in_tile)
    last_w = tile >> (in_tile_levels - 1)     # narrowest in-tile width

    out_shapes = [
        jax.ShapeDtypeStruct((b, r >> lev), jnp.int8)
        for lev in range(in_tile_levels)
    ] + [jax.ShapeDtypeStruct((b, (r >> (in_tile_levels - 1))), jnp.float32)]

    out_specs = [
        pl.BlockSpec((b, tile >> lev), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
        for lev in range(in_tile_levels)
    ] + [pl.BlockSpec((b, last_w), lambda i: (0, i),
                      memory_space=pltpu.VMEM)]

    outs = pl.pallas_call(
        functools.partial(_pyramid_kernel, in_tile_levels=in_tile_levels,
                          size_log2=size_log2),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((b, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(power)

    rows = list(outs[:in_tile_levels])
    p = outs[in_tile_levels]                  # [B, r >> (itl-1)] f32

    # finish the coarse tail (tiny arrays, plain XLA)
    for lev in range(in_tile_levels, levels):
        p = p[..., 0::2] + p[..., 1::2]
        rows.append(quantize_power(p, size_log2 - lev))
    return jnp.concatenate(rows, axis=-1)
