"""Round-2 correctness pins: atomic reset snapshots, AGC-only reset on
demodulation change, waterfall coordinate snapshots, u32 bit-exact
conversion, due-hop-restricted waterfall gathers, and the documented
NaN deviation (reference drops the frame, src/signal.cpp:266-271; we
zero the offending samples)."""

import numpy as np
import pytest
import jax.numpy as jnp

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops import convert
from phantomsdr_tpu.ops.quantize import pyramid_level_offsets
from phantomsdr_tpu.pipeline import (
    HopPipeline, channels_from_numpy, waterfall_due_positions,
)
from phantomsdr_tpu.runtime.registry import (
    ChannelRegistry, WaterfallRegistry, RESET_FULL, RESET_AGC,
)


def small_cfg(**tpu):
    return config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 4096,
            "signal": "iq", "audio_sps": 2000, "waterfall_size": 256,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 4, **tpu},
    })


# ------------------------------------------------------------- u32 convert

def test_u32_convert_bit_exact():
    # casting u32 to f32 BEFORE the recentre would round 0x80000001 to
    # 0.0; the reference XORs the sign bit in the integer domain first
    raw = np.array([0x80000001, 0x80000000, 0x7FFFFFFF, 0, 0xFFFFFFFF],
                   dtype=np.uint32)
    got = np.asarray(convert.to_float(jnp.asarray(raw), "u32"))
    want = ((raw.astype(np.int64) - 2**31).astype(np.float32)
            / np.float32(2**31))
    np.testing.assert_array_equal(got, want)
    assert got[0] == np.float32(2.0**-31)  # the rounding victim


# ------------------------------------------------- registry reset snapshots

def test_reset_pending_until_slot_active():
    cfg = small_cfg()
    reg = ChannelRegistry(cfg)
    slot = reg.acquire("u1")
    # fresh but inactive: reset must NOT be consumed yet, or the slot
    # runs >=1 silent step post-reset and the AGC gain ramps to ~2e9
    _, _, resets, _ = reg.snapshot()
    assert resets is None
    reg.retune(slot, 10, 15.0, 20)
    _, arrays, resets, _ = reg.snapshot()
    assert resets is not None and resets[slot.slot] == RESET_FULL
    assert arrays[4][slot.slot]  # active in the SAME snapshot
    _, _, resets, _ = reg.snapshot()
    assert resets is None  # one-shot


def test_release_clears_pending_reset():
    cfg = small_cfg()
    reg = ChannelRegistry(cfg)
    slot = reg.acquire("u1")
    reg.release(slot)
    slot2 = reg.acquire("u2")
    assert slot2.slot == slot.slot
    reg.retune(slot2, 10, 15.0, 20)
    _, _, resets, _ = reg.snapshot()
    assert resets[slot2.slot] == RESET_FULL


def test_demodulation_change_queues_agc_reset():
    cfg = small_cfg()
    reg = ChannelRegistry(cfg)
    slot = reg.acquire("u1")
    reg.retune(slot, 10, 15.0, 20)
    reg.snapshot()  # consume the connect reset
    assert reg.set_mode(slot, "FM")
    _, _, resets, _ = reg.snapshot()
    assert resets[slot.slot] == RESET_AGC
    # the reference resets the AGC even on an unrecognized mode string
    # (src/signal.cpp:315-328: agc.reset() runs unconditionally)
    assert not reg.set_mode(slot, "QAM4096")
    _, _, resets, _ = reg.snapshot()
    assert resets[slot.slot] == RESET_AGC
    # a full reset supersedes a simultaneous AGC reset
    reg.release(slot)
    s2 = reg.acquire("u2")
    reg.set_mode(s2, "AM")
    reg.retune(s2, 10, 15.0, 20)
    _, _, resets, _ = reg.snapshot()
    assert resets[s2.slot] == RESET_FULL


def test_agc_only_reset_keeps_demod_carries():
    cfg = small_cfg()
    pipe = HopPipeline(cfg)
    c = cfg.max_channels
    table = channels_from_numpy(
        l=[500] * c, r=[600] * c, m_idx=[550] * c, mode=[3] * c,
        active=[True] * c)
    r = np.random.default_rng(0)
    raw = jnp.asarray(r.integers(-20000, 20000,
                                 size=pipe.wire_per_hop * (cfg.hop_batch + 1),
                                 dtype=np.int16))
    half = cfg.audio_fft_size // 2

    def two_steps(reset2):
        st, _ = pipe.step(pipe.init_state(), raw, table, waterfall="off")
        st, _ = pipe.step(st, raw, table, waterfall="off", reset=reset2)
        return st

    mask = np.zeros(c, np.int32)
    mask[1] = RESET_AGC
    st_r = two_steps(jnp.asarray(mask))
    st_n = two_steps(None)
    # AGC state of slot 1 restarted (seen back to one step's samples)...
    assert int(st_r.audio.agc.seen[1]) == cfg.hop_batch * half
    assert int(st_r.audio.agc.seen[0]) == 2 * cfg.hop_batch * half
    # ...but the demod overlap-add + DC carries were NOT touched
    np.testing.assert_array_equal(np.asarray(st_r.audio.chan.cplx_prev[1]),
                                  np.asarray(st_n.audio.chan.cplx_prev[1]))
    np.testing.assert_array_equal(np.asarray(st_r.audio.dc.tail[1]),
                                  np.asarray(st_n.audio.dc.tail[1]))


# ---------------------------------------------- waterfall coordinate meta

def test_waterfall_snapshot_carries_coordinates():
    cfg = small_cfg()
    offs = pyramid_level_offsets(cfg.fft_result_size, cfg.downsample_levels)
    reg = WaterfallRegistry(cfg, offs, max_slots=2)
    cid, ws = reg.acquire()
    _, start, length, (l, r, lev) = reg.snapshot()
    assert (l[cid], r[cid], lev[cid]) == (ws.l, ws.r, ws.level)
    old = (ws.l, ws.r, ws.level)
    reg.retune(cid, ws, 100, 612)  # width 512 -> level 1 slice
    _, _, _, (l2, r2, lev2) = reg.snapshot()
    assert (l2[cid], r2[cid], lev2[cid]) == (ws.l, ws.r, ws.level)
    assert (l2[cid], r2[cid], lev2[cid]) != old


# --------------------------------------------- due-hop-restricted gather

def test_views_gather_only_due_hops():
    # skip_num > hop_batch: at most one hop per batch is due; the device
    # gather must be one row, selected by the host's due_idx
    cfg = config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 2000, "waterfall_size": 256,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 4},
    })
    assert cfg.skip_num > cfg.hop_batch
    pipe = HopPipeline(cfg)
    assert pipe.due_cap == 1
    assert waterfall_due_positions(cfg, 0) == [0]
    assert waterfall_due_positions(cfg, 2) == []
    assert waterfall_due_positions(cfg, cfg.skip_num - 1) == [1]

    from phantomsdr_tpu.pipeline import WaterfallViews
    offs = pyramid_level_offsets(cfg.fft_result_size, cfg.downsample_levels)
    views = WaterfallViews(start=jnp.asarray([offs[0]], jnp.int32),
                           length=jnp.asarray([256], jnp.int32))
    table = pipe.empty_channels()
    r = np.random.default_rng(0)
    raw = jnp.asarray(r.integers(-20000, 20000,
                                 size=pipe.wire_per_hop * (cfg.hop_batch + 1),
                                 dtype=np.int16))
    _, out_full = pipe.step(pipe.init_state(), raw, table, waterfall="full")
    for h in range(cfg.hop_batch):
        _, out_v = pipe.step(pipe.init_state(), raw, table, views, "views",
                             due_idx=jnp.asarray([h], jnp.int32))
        assert out_v.wf.shape[0] == 1
        np.testing.assert_array_equal(
            np.asarray(out_v.wf[0, 0, :256]),
            np.asarray(out_full.pyramid[h, offs[0]:offs[0] + 256]))


# ----------------------------------------------------- NaN deviation pin

def test_nan_input_zeroes_samples_not_frames():
    """Reference drops the whole frame on any NaN (signal.cpp:266-271);
    this build zeroes the offending samples instead (documented
    deviation, ops/channelizer.py)."""
    from phantomsdr_tpu.ops.channelizer import (
        demodulate, init_channel_state, ChannelTable)

    a = 64
    rsz = 512
    spec = np.zeros(rsz + a, np.complex64)
    spec[100:120] = np.nan + 1j * np.nan       # poisoned slice
    chans = ChannelTable(
        l=jnp.asarray([90, 300], jnp.int32),
        r=jnp.asarray([150, 360], jnp.int32),
        m_idx=jnp.asarray([100, 310], jnp.int32),
        mode=jnp.asarray([0, 0], jnp.int32),
        active=jnp.asarray([True, True]),
    )
    st = init_channel_state(2, a)
    st, audio, pwr = demodulate(
        jnp.asarray(spec), chans, st, jnp.int32(0),
        audio_fft_size=a, fft_result_size=rsz, base_idx=0, is_real=True)
    audio = np.asarray(audio)
    # channel 0 touched NaN bins -> its samples are zeroed, not NaN
    assert np.isfinite(audio).all()
    assert (audio[0] == 0).all()
    # channel 1 is clean and unaffected
    assert np.abs(audio[1]).sum() == 0  # zero spectrum -> zero audio


def test_inf_input_does_not_poison_agc():
    """A +-inf demod sample must be zeroed like NaN (isfinite guard):
    inf survives an isnan-only guard, the DC blocker's cumsum turns it
    into inf - inf = NaN, and the AGC gain carry goes NaN PERMANENTLY
    (its comparisons are all False for NaN) -- every later sample of
    that listener is garbage until a reset."""
    from phantomsdr_tpu.ops.channelizer import (
        demodulate, init_channel_state, ChannelTable)
    from phantomsdr_tpu.ops.agc import (
        dc_blocker, agc_process, make_agc_params, dc_blocker_delay,
        init_dc_state, init_agc_state)

    a = 64
    rsz = 512
    spec = np.zeros(rsz + a, np.complex64)
    spec[100:104] = np.inf                      # poisoned slice
    spec[300:360] = 1.0                         # clean channel content
    chans = ChannelTable(
        l=jnp.asarray([90, 300], jnp.int32),
        r=jnp.asarray([150, 360], jnp.int32),
        m_idx=jnp.asarray([100, 310], jnp.int32),
        mode=jnp.asarray([0, 0], jnp.int32),
        active=jnp.asarray([True, True]),
    )
    st = init_channel_state(2, a)
    st, audio, pwr = demodulate(
        jnp.asarray(spec), chans, st, jnp.int32(0),
        audio_fft_size=a, fft_result_size=rsz, base_idx=0, is_real=True)
    audio = np.asarray(audio)
    assert np.isfinite(audio).all()

    # and the full DC+AGC chain stays finite across SUBSEQUENT clean
    # blocks (the regression: gain carried NaN forever)
    params = make_agc_params(12000)
    d = dc_blocker_delay(12000)
    dc_st = init_dc_state(2, d)
    agc_st = init_agc_state(2, params.window)
    dc_st, y = dc_blocker(dc_st, jnp.asarray(audio), d)
    agc_st, y = agc_process(agc_st, y, params)
    rng = np.random.default_rng(0)
    for _ in range(5):
        clean = rng.standard_normal((2, a)).astype(np.float32) * 0.1
        dc_st, y = dc_blocker(dc_st, jnp.asarray(clean), d)
        agc_st, y = agc_process(agc_st, y, params)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(agc_st.gain)).all()


def test_am_sync_pll_phase_wrapped():
    """The AM-sync NCO phase must stay wrapped (liquid constrains it
    per step): an unbounded float32 phase accumulates ULP ~1 rad after
    days of uptime and the PLL unlocks."""
    from phantomsdr_tpu.ops.channelizer import am_sync_detect

    rng = np.random.default_rng(1)
    car = (rng.standard_normal((2, 4096)) +
           1j * rng.standard_normal((2, 4096))).astype(np.complex64)
    phase = jnp.asarray([1.0, 5.0], jnp.float32)
    freq = jnp.asarray([0.3, -0.2], jnp.float32)  # large offsets
    for _ in range(4):
        _, phase, freq = am_sync_detect(jnp.asarray(car), jnp.asarray(car),
                                        phase, freq)
    ph = np.asarray(phase)
    assert np.all(ph >= 0.0) and np.all(ph < 2 * np.pi + 1e-3), ph


def test_fft_size_must_be_power_of_two():
    from phantomsdr_tpu.config import config_from_dict

    with pytest.raises(ValueError, match="power of two"):
        config_from_dict({
            "input": {
                "sps": 1_000_000, "frequency": 7000000,
                "fft_size": 1_000_000, "signal": "iq",
                "audio_sps": 12000, "waterfall_size": 256,
                "driver": {"format": "s16"},
            },
            "tpu": {"hop_batch": 2, "max_channels": 2},
        })
