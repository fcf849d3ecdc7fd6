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

    def consumer(frame0, audio, pwr, wfviews, due, wf_meta, audio_meta):
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
