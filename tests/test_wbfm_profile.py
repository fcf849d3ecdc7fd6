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


def test_device_opus_decimation_matches_host_reference():
    """Opus >48 kHz path: the device polyphase decimator (integrated
    into the hop pipeline, audio_from_spectra) must match host-side
    filtering of the full-rate audio with the same taps -- across step
    boundaries (filter tail carried in AudioState.dec)."""
    from phantomsdr_tpu.ops.polyphase import decimator_taps

    base = {
        "input": {
            "sps": 960_000, "frequency": 98_000_000, "fft_size": 16384,
            "signal": "iq", "audio_sps": 96000, "waterfall_size": 1024,
            "driver": {"format": "u8"},
            "defaults": {"frequency": 98_100_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 2},
    }
    cfg_o = config_from_dict({**base, "input": {**base["input"],
                                                "audio_compression": "opus"}})
    cfg_f = config_from_dict(base)  # flac: full-rate reference
    assert cfg_o.opus_decim == 2 and cfg_o.device_decim
    assert cfg_o.opus_rate == 48000
    assert not cfg_f.device_decim

    m = int(cfg_o.default_m)
    table = channels_from_numpy(
        l=[cfg_o.default_l] * 2, r=[cfg_o.default_r] * 2, m_idx=[m] * 2,
        mode=[3] * 2, active=[True] * 2)
    rng = np.random.default_rng(1)
    n = cfg_o.hop_size * (cfg_o.hop_batch + 1) * 2
    blocks = [rng.integers(0, 256, n, dtype=np.uint8) for _ in range(3)]

    pipe_o = HopPipeline(cfg_o)
    pipe_f = HopPipeline(cfg_f)
    half = cfg_o.audio_fft_size // 2
    st_o, st_f = pipe_o.init_state(), pipe_f.init_state()
    dec_out, full_out = [], []
    for blk in blocks:
        st_o, out_o = pipe_o.step(st_o, jnp.asarray(blk), table,
                                  waterfall="off")
        st_f, out_f = pipe_f.step(st_f, jnp.asarray(blk), table,
                                  waterfall="off")
        assert out_o.audio.shape == (2, cfg_o.hop_batch * half // 2)
        dec_out.append(np.asarray(out_o.audio))
        full_out.append(np.asarray(out_f.audio))

    got = np.concatenate(dec_out, axis=1)              # [C, T/2]
    full = np.concatenate(
        [f.transpose(1, 0, 2).reshape(2, -1) for f in full_out], axis=1)
    # host reference: same taps over the full-rate float audio
    taps = decimator_taps(2, taps_per_phase=12)
    scale = 65536.0 / 4.0
    for c in range(2):
        x = full[c].astype(np.float64) / scale          # ~float audio
        y = np.convolve(np.concatenate([np.zeros(taps.size - 1), x]),
                        taps[::-1][::-1], mode="valid")[::2]
        want = np.floor(y * scale + 32768.5) - 32768
        # full-rate int16 already quantized once (0.5 LSB); filtered
        # error bounded by sum|taps| -> allow 2 LSB
        assert np.abs(got[c].astype(np.int64)
                      - want[:got.shape[1]].astype(np.int64)).max() <= 2
