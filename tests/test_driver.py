"""Driver tests: sample-source halo logic, device loop pipelining,
no-client compute skip, EOF handling -- with a real (small) pipeline."""

import io
import threading
import time

import numpy as np

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.runtime.driver import DSPDriver, SampleSource
from phantomsdr_tpu.runtime.registry import ChannelRegistry, WaterfallRegistry
from phantomsdr_tpu.ops.quantize import pyramid_level_offsets


def make_cfg(**tpu):
    return config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 2000, "waterfall_size": 256,
            "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 4, **tpu},
    })


def test_sample_source_blocks_and_halo():
    cfg = make_cfg()
    wph = cfg.hop_size * 2
    total = wph * 7
    data = np.arange(total, dtype=np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    b1 = src.read_block()
    assert b1.shape[0] == (cfg.hop_batch + 1) * wph
    np.testing.assert_array_equal(b1[:wph], 0)            # initial halo
    np.testing.assert_array_equal(b1[wph:], data[:2 * wph])
    b2 = src.read_block()
    np.testing.assert_array_equal(b2[:wph], data[wph:2 * wph])  # halo = tail
    np.testing.assert_array_equal(b2[wph:], data[2 * wph:4 * wph])
    b3 = src.read_block()
    assert b3 is not None
    assert src.read_block() is None                        # EOF (partial left)


def test_driver_end_to_end_with_consumer():
    cfg = make_cfg()
    wph = cfg.hop_size * 2
    nblocks = 4
    rng = np.random.default_rng(0)
    data = rng.integers(-20000, 20000, size=wph * cfg.hop_batch * nblocks,
                        dtype=np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))

    channels = ChannelRegistry(cfg)
    offs = pyramid_level_offsets(cfg.fft_result_size, cfg.downsample_levels)
    wf = WaterfallRegistry(cfg, offs, max_slots=4)
    slot = channels.acquire("test")
    channels.retune(slot, 100, 150.0, 200)
    cid, ws = wf.acquire()

    got = []
    done = threading.Event()

    def consumer(frame0, audio, pwr, wfviews, due, wf_meta, audio_meta,
                 rds=None):
        got.append((frame0, audio.shape, None if wfviews is None
                    else wfviews.shape, list(due)))
        if len(got) >= nblocks:
            done.set()

    drv = DSPDriver(cfg, src, channels, consumer,
                    waterfall_registry=wf,
                    waterfall_active=lambda: wf.count > 0,
                    audio_active=lambda: channels.count > 0)
    drv.start()
    assert done.wait(timeout=120), f"only {len(got)} batches arrived"
    drv.stop()

    frames = [g[0] for g in got]
    assert frames == sorted(frames)
    assert frames[0] == 0 and frames[1] == cfg.hop_batch
    b, c, half = got[0][1]
    assert (b, c, half) == (cfg.hop_batch, cfg.max_channels,
                            cfg.audio_fft_size // 2)
    # skip_num (18) > hop_batch (2) at this config: only the frame0=0
    # batch has a due hop; later batches carry no waterfall at all
    # (the due-restricted gather ships zero wf bytes for them)
    assert cfg.skip_num > cfg.hop_batch
    assert got[0][2] is not None
    assert got[0][2][1] == 4  # max wf slots
    assert got[0][3] == [0]   # exact due positions
    assert got[1][2] is None and got[1][3] == []
    assert drv.metrics.eof
    assert drv.metrics.device_errors == 0


def test_driver_idle_skip_without_clients():
    cfg = make_cfg()
    wph = cfg.hop_size * 2
    data = np.zeros(wph * cfg.hop_batch * 3, np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    channels = ChannelRegistry(cfg)
    calls = []
    drv = DSPDriver(cfg, src, channels, lambda *a: calls.append(a),
                    waterfall_active=lambda: False,
                    audio_active=lambda: False)
    drv.start()
    t0 = time.monotonic()
    while (drv.metrics.idle_frames < 3 * cfg.hop_batch
           and time.monotonic() - t0 < 60):
        time.sleep(0.1)
    drv.stop()
    assert drv.metrics.idle_frames == 3 * cfg.hop_batch
    assert drv.metrics.eof
    assert calls == []


def test_channel_bucketing_grow_and_shrink():
    """Active-channel bucketing: the driver runs the step at the small
    table width while the population fits, grows immediately when a
    higher slot activates, and shrinks back after the quiet streak."""
    cfg = make_cfg(max_channels=8, channel_bucket=2, hop_batch=2)
    wph = cfg.hop_size * 2
    nblocks = 40
    rng = np.random.default_rng(1)
    data = rng.integers(-20000, 20000, size=wph * cfg.hop_batch * nblocks,
                        dtype=np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    channels = ChannelRegistry(cfg)
    s0 = channels.acquire("a")
    channels.retune(s0, 100, 110.0, 120)  # width <= audio_fft_size (24)

    widths = []
    grown = threading.Event()
    done = threading.Event()
    high = {}

    def consumer(frame0, audio, pwr, wfviews, due, wf_meta, audio_meta,
                 rds=None):
        widths.append(audio.shape[1])
        # grow mid-run: activate slots 1 and 2 (slot 2 >= bucket 2)
        if len(widths) == 3:
            for name in ("b", "c"):
                s = channels.acquire(name)
                channels.retune(s, 100, 110.0, 120)
                high[name] = s
        # release them again: population back inside the bucket
        if len(widths) == 10:
            for s in high.values():
                channels.release(s)
        if len(widths) >= nblocks - 2:
            done.set()

    drv = DSPDriver(cfg, src, channels, consumer,
                    waterfall_active=lambda: False,
                    audio_active=lambda: channels.count > 0)
    drv.shrink_after = 3
    drv.start()
    assert done.wait(timeout=120), f"only {len(widths)} batches"
    drv.stop()
    assert drv.metrics.device_errors == 0
    assert widths[0] == 2                      # starts at the bucket
    assert 8 in widths                         # grew for slot 2
    assert widths[-1] == 2                     # shrank after the streak
    # growth is immediate: no step ran at width 2 with slot 2 active
    first8 = widths.index(8)
    assert all(w == 2 for w in widths[:first8])


def test_bucket_resize_preserves_carries():
    """resize_channel_rows: shrinking then growing back must leave the
    retained rows' audio bit-identical to a run that never resized."""
    import jax.numpy as jnp

    from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

    cfg = make_cfg(max_channels=4, hop_batch=2)
    pipe = HopPipeline(cfg)
    rng = np.random.default_rng(2)
    wph = cfg.hop_size * 2
    blocks = [rng.integers(-20000, 20000, size=(cfg.hop_batch + 1) * wph,
                           dtype=np.int16) for _ in range(4)]

    def table(k):
        l = np.full(k, 100)
        return channels_from_numpy(l=l, r=l + 20, m_idx=l + 10,
                                   mode=np.arange(k) % 4,
                                   active=np.ones(k, bool))

    # reference: always full width
    st = pipe.init_state()
    ref = []
    for blk in blocks:
        st, o = pipe.step(st, jnp.asarray(blk), table(4), waterfall="off")
        ref.append(np.asarray(o.audio)[:, :2])

    # bucketed: steps 0-1 at k=2, grow to 4, then shrink back to 2
    st = pipe.resize_channel_rows(pipe.init_state(), 2)
    got = []
    for i, blk in enumerate(blocks):
        k = 4 if i == 2 else 2
        st = pipe.resize_channel_rows(st, k)
        st, o = pipe.step(st, jnp.asarray(blk), table(k), waterfall="off")
        got.append(np.asarray(o.audio)[:, :2])

    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_device_error_recovery():
    """A device-step failure must be surfaced in metrics, the donated
    state rebuilt, and serving must CONTINUE (SURVEY section 5 failure
    detection) -- the reference's analogue is that a bad frame never
    kills the fft_task thread."""
    cfg = make_cfg()
    wph = cfg.hop_size * 2
    nblocks = 8
    rng = np.random.default_rng(3)
    data = rng.integers(-20000, 20000, size=wph * cfg.hop_batch * nblocks,
                        dtype=np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    channels = ChannelRegistry(cfg)
    slot = channels.acquire("t")
    channels.retune(slot, 100, 150.0, 200)

    got = []
    done = threading.Event()

    def consumer(frame0, audio, pwr, wf, due, wf_meta, audio_meta,
                 rds=None):
        got.append(frame0)
        if len(got) >= 3:
            done.set()

    drv = DSPDriver(cfg, src, channels, consumer,
                    waterfall_active=lambda: False,
                    audio_active=lambda: True)
    real_step = drv.pipe.step
    fails = {"n": 0}

    def flaky_step(*a, **k):
        if fails["n"] == 0:
            fails["n"] = 1
            raise RuntimeError("injected device failure")
        return real_step(*a, **k)

    drv.pipe.step = flaky_step
    drv.start()
    assert done.wait(timeout=120), f"only {len(got)} batches after error"
    drv.stop()
    assert fails["n"] == 1
    assert drv.metrics.device_errors == 1
    assert "injected device failure" in drv.metrics.last_device_error
    # the failed step's frames still advanced; later steps kept serving
    assert len(got) >= 3
    assert got == sorted(got)


def test_device_error_flushes_pending_step():
    """One-step-in-flight means a completed step is usually held in
    `pending` when the NEXT step raises.  The error path must deliver
    that already-computed batch instead of dropping it -- a transient
    device error costs exactly one step of audio, not two."""
    cfg = make_cfg()
    wph = cfg.hop_size * 2
    nblocks = 8
    rng = np.random.default_rng(7)
    data = rng.integers(-20000, 20000, size=wph * cfg.hop_batch * nblocks,
                        dtype=np.int16)
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    channels = ChannelRegistry(cfg)
    slot = channels.acquire("t")
    channels.retune(slot, 100, 150.0, 200)

    got = []
    done = threading.Event()

    def consumer(frame0, audio, pwr, wf, due, wf_meta, audio_meta,
                 rds=None):
        got.append(frame0)
        if len(got) >= 3:
            done.set()

    drv = DSPDriver(cfg, src, channels, consumer,
                    waterfall_active=lambda: False,
                    audio_active=lambda: True)
    real_step = drv.pipe.step
    calls = {"n": 0}

    def flaky_step(*a, **k):
        # warmup also calls pipe.step (no kwargs); count only the
        # serving loop's calls (they pass reset/due_idx kwargs)
        if "due_idx" in k:
            calls["n"] += 1
            if calls["n"] == 2:  # step 0 succeeded and is pending
                raise RuntimeError("injected device failure")
        return real_step(*a, **k)

    drv.pipe.step = flaky_step
    drv.start()
    assert done.wait(timeout=120), f"only {len(got)} batches after error"
    drv.stop()
    assert drv.metrics.device_errors == 1
    # the pre-error step's outputs were delivered, not discarded
    assert got[0] == 0, got
    assert got == sorted(got)
