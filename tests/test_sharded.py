"""Sharded pipeline on an 8-virtual-device CPU mesh: must match the
single-device pipeline exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy
from phantomsdr_tpu.parallel import ShardedHopPipeline, make_mesh


def make_cfg(n_dev):
    return config_from_dict({
        "input": {
            "sps": 192000,
            "frequency": 7000000,
            "fft_size": 2048,
            "signal": "iq",
            "audio_sps": 2000,
            "waterfall_size": 512,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 2 * n_dev, "max_channels": 2 * n_dev},
    })


def test_sharded_matches_single_device():
    n_dev = min(8, len(jax.devices()))
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    cfg = make_cfg(n_dev)
    mesh = make_mesh(n_dev)
    sp = ShardedHopPipeline(cfg, mesh)
    pipe = HopPipeline(cfg)

    c = cfg.max_channels
    r = np.random.default_rng(3)
    table = channels_from_numpy(
        l=r.integers(0, cfg.fft_result_size - 200, c),
        r=0,  # fixed below
        m_idx=0,
        mode=r.integers(0, 4, c),
        active=np.ones(c, bool),
    )
    l = np.asarray(table.l)
    width = r.integers(16, min(cfg.audio_fft_size, 120), c)
    table = channels_from_numpy(
        l=l, r=l + width, m_idx=l + width // 2,
        mode=np.asarray(table.mode), active=np.ones(c, bool),
    )

    b = cfg.hop_batch
    wph = pipe.wire_per_hop
    raw = r.integers(-20000, 20000, size=(b + 1) * wph * 2, dtype=np.int16)

    # single device
    st1 = pipe.init_state()
    outs1 = []
    for s in range(2):
        blk = raw[s * b * wph : (s + 1) * b * wph + wph]
        st1, o = pipe.step(st1, jnp.asarray(blk), table, waterfall="full")
        outs1.append(o)

    # sharded
    st8 = sp.init_state()
    outs8 = []
    for s in range(2):
        blk = raw[s * b * wph : (s + 1) * b * wph + wph]
        shards = sp.shard_raw(blk)
        assert shards.shape == (n_dev, sp.raw_shard_len)
        st8, o = sp.step(st8, jnp.asarray(shards), table)
        outs8.append(o)

    for o1, o8 in zip(outs1, outs8):
        # FFT rounding differs slightly between the two compilations;
        # allow 1-LSB flips at int8 truncation boundaries on <0.1% of bins
        p1 = np.asarray(o1.pyramid).astype(int)
        p8 = np.asarray(o8.pyramid).astype(int)
        assert np.abs(p1 - p8).max() <= 1
        assert (p1 != p8).mean() < 1e-3
        np.testing.assert_allclose(
            np.asarray(o1.avg_power), np.asarray(o8.avg_power),
            rtol=1e-5, atol=1e-8,
        )
        a1 = np.asarray(o1.audio).astype(int)
        a8 = np.asarray(o8.audio).astype(int)
        assert np.abs(a1 - a8).max() <= 1  # fp reduction-order wiggle
