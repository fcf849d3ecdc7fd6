"""Fused Pallas waterfall kernel vs the reference XLA formulation
(interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from phantomsdr_tpu.ops.quantize import (
    waterfall_pyramid, pyramid_flat,
)
from phantomsdr_tpu.ops.pallas.waterfall import fused_waterfall_pyramid


@pytest.mark.parametrize("r,levels,tile", [
    (1 << 12, 3, 1 << 10),   # multi-tile, shallow
    (1 << 12, 13, 1 << 10),  # all levels incl. width-1, coarse tail
    (1 << 14, 5, 1 << 14),   # single tile
])
def test_fused_pyramid_matches_xla(r, levels, tile):
    # interpret mode: validates semantics (see waterfall.py status note)
    rng = np.random.default_rng(r + levels)
    b = 3
    size_log2 = 12
    p = (10.0 ** rng.uniform(-12, 0, size=(b, r))).astype(np.float32)
    p[0, :7] = 0.0  # zero-power bins -> -128

    want = np.asarray(pyramid_flat(
        waterfall_pyramid(jnp.asarray(p), levels, size_log2)))
    got = np.asarray(fused_waterfall_pyramid(
        jnp.asarray(p), levels, size_log2, tile=tile, interpret=True))
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    # identical math modulo fp reassociation in the level sums
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
