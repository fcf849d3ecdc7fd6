"""WBFM profile (reference config.toml: 192 kHz audio_sps, WBFM
defaults): exercises the large audio_fft_size / large AGC window path
end-to-end at reduced scale."""

import numpy as np
import jax.numpy as jnp

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy


def test_wbfm_profile_pipeline():
    # scaled-down analogue of the shipped WBFM profile (20 MSPS / 1M fft
    # / 192k audio): 2 MSPS / 64k fft / 96k audio keeps CPU test time sane
    cfg = config_from_dict({
        "input": {
            "sps": 2_000_000, "frequency": 98_000_000, "fft_size": 65536,
            "signal": "iq", "audio_sps": 96000, "waterfall_size": 1024,
            "audio_compression": "flac",
            "driver": {"format": "u8"},
            "defaults": {"frequency": 98_300_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 2},
    })
    # WBFM default mode maps to FM with the 96 kHz offsets
    assert cfg.default_mode == "FM"
    off96 = 96000 * cfg.fft_result_size // cfg.sps
    assert cfg.default_r - cfg.default_l == 2 * off96

    pipe = HopPipeline(cfg)
    a = cfg.audio_fft_size
    assert a == int(np.ceil(96000 * 65536 / 2e6 / 4.0) * 4)  # 3148

    # FM carrier at the default mid
    m = int(cfg.default_m)
    table = channels_from_numpy(
        l=[cfg.default_l] * 2, r=[cfg.default_r] * 2, m_idx=[m] * 2,
        mode=[3] * 2, active=[True] * 2)

    rng = np.random.default_rng(0)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    raw = rng.integers(0, 256, n, dtype=np.uint8)
    state = pipe.init_state()
    state, out = pipe.step(state, jnp.asarray(raw), table, waterfall="views")
    audio = np.asarray(out.audio)
    assert audio.shape == (cfg.hop_batch, 2, a // 2)
    assert np.isfinite(np.asarray(out.avg_power)).all()
