"""Mesh server mode ([tpu] mesh_devices = N): the production driver and
the full websocket serving flow running over the time+channel-sharded
engine on the 8-virtual-device CPU mesh (VERDICT round 1, item 1).

The reference's serving loops (src/websocket.cpp:156-236) have no
distributed analogue; here the SAME server runs on 1 chip or a mesh by
a config switch."""

import asyncio
import io
import json
import threading

import numpy as np
import pytest

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops.quantize import pyramid_level_offsets
from phantomsdr_tpu.runtime.driver import DSPDriver, SampleSource
from phantomsdr_tpu.runtime.registry import ChannelRegistry, WaterfallRegistry


def make_cfg(mesh=1, **inp):
    base = {
        "sps": 192000, "frequency": 7000000, "fft_size": 2048,
        "signal": "iq", "audio_sps": 12000, "waterfall_size": 256,
        "driver": {"format": "s16"},
    }
    base.update(inp)
    return config_from_dict({
        "input": base,
        "tpu": {"hop_batch": 8, "max_channels": 8, "mesh_devices": mesh},
    })


def run_driver(cfg, data, nblocks):
    """Run a DSPDriver over `data` and collect consumer batches."""
    src = SampleSource(cfg, io.BytesIO(data.tobytes()))
    channels = ChannelRegistry(cfg)
    offs = pyramid_level_offsets(cfg.fft_result_size, cfg.downsample_levels)
    wf = WaterfallRegistry(cfg, offs, max_slots=4)
    slot = channels.acquire("t")
    channels.retune(slot, 100, 150.0, 200)
    cid, ws = wf.acquire()
    got = []
    done = threading.Event()

    def consumer(frame0, audio, pwr, wfviews, due, wf_meta, audio_meta,
                 rds=None):
        got.append((frame0, audio.copy(), pwr.copy(),
                    None if wfviews is None else wfviews.copy(), list(due)))
        if len(got) >= nblocks:
            done.set()

    drv = DSPDriver(cfg, src, channels, consumer,
                    waterfall_registry=wf,
                    waterfall_active=lambda: True,
                    audio_active=lambda: True)
    drv.start()
    ok = done.wait(timeout=180)
    drv.stop()
    assert ok, f"only {len(got)} batches (mesh={cfg.mesh_devices})"
    assert drv.metrics.device_errors == 0, drv.metrics.last_device_error
    return got


def test_mesh_driver_matches_single_device():
    """The mesh-mode driver (halo over ICI, channel-sharded demod,
    per-shard due gathers) must produce the same serving outputs as the
    single-device driver on an identical stream."""
    nblocks = 3
    cfg1 = make_cfg(mesh=1)
    cfg4 = make_cfg(mesh=4)
    wph = cfg1.hop_size * 2
    rng = np.random.default_rng(7)
    data = rng.integers(-20000, 20000,
                        size=wph * cfg1.hop_batch * (nblocks + 1),
                        dtype=np.int16)
    got1 = run_driver(cfg1, data, nblocks)
    got4 = run_driver(cfg4, data, nblocks)
    for (f1, a1, p1, w1, d1), (f4, a4, p4, w4, d4) in zip(got1, got4):
        assert f1 == f4 and d1 == d4
        assert np.abs(a1.astype(int) - a4.astype(int)).max() <= 1
        np.testing.assert_allclose(p1, p4, rtol=1e-5, atol=1e-8)
        if w1 is None:
            assert w4 is None
        else:
            assert w1.shape == w4.shape
            assert np.abs(w1.astype(int) - w4.astype(int)).max() <= 1


def test_mesh_websocket_end_to_end():
    """Full serving flow over the mesh engine: synthetic IQ capture with
    a known carrier -> mesh DSPDriver -> websocket /audio FLAC stream
    decodes to the expected tone; /waterfall peak lands on the carrier."""
    from aiohttp.test_utils import TestClient, TestServer
    from phantomsdr_tpu.main import build
    from tests.test_codecs import decode_flac
    from tests.test_server import decode_cbor

    cfg = make_cfg(mesh=4)
    sps, fft = cfg.sps, cfg.fft_size
    # carrier at +30 kHz from band start; display bin = offset * R / sps
    # minus 1 (the reference's base_idx = fft/2 + 1 IQ roll quirk,
    # src/fft_impl.cpp:148-153)
    f_off = 30000
    bin_c = f_off * cfg.fft_result_size // sps - 1        # 319
    n = cfg.hop_size * cfg.hop_batch * 6
    t = np.arange(n)
    iq = 0.5 * np.exp(2j * np.pi * (f_off - sps / 2) * t / sps)
    wire = np.empty(2 * n, np.int16)
    wire[0::2] = np.round(iq.real * 20000)
    wire[1::2] = np.round(iq.imag * 20000)

    async def flow():
        server, driver = build(cfg, io.BytesIO(wire.tobytes()),
                               loop_file=True, throttle=cfg.sps)
        ts = TestServer(server.app)
        client = TestClient(ts)
        await client.start_server()
        driver.start()
        try:
            ws = await client.ws_connect("/audio")
            info = json.loads((await ws.receive()).data)
            assert info["fft_result_size"] == cfg.fft_result_size
            # USB with m 1 kHz below the carrier -> ~1 kHz audio tone
            bins_1k = round(1000 * fft / sps)              # ~11 bins
            m = bin_c - bins_1k
            await ws.send_str(json.dumps(
                {"cmd": "window", "l": m, "m": float(m),
                 "r": m + cfg.audio_fft_size}))
            await ws.send_str(json.dumps(
                {"cmd": "demodulation", "demodulation": "USB"}))
            flac = b""
            for _ in range(400):
                try:
                    msg = await ws.receive(timeout=0.1)
                except asyncio.TimeoutError:
                    continue
                if msg.type.name == "BINARY":
                    flac += bytes(decode_cbor(msg.data)["data"])
                    if len(flac) > 6000:
                        break
            sr, samples = decode_flac(flac)
            assert sr == cfg.audio_sps
            x = samples[len(samples) // 2:].astype(np.float64)
            assert x.size > 2000
            spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
            freqs = np.fft.rfftfreq(x.size, 1.0 / sr)
            peak = freqs[np.argmax(spec[5:]) + 5]
            expect = bins_1k * sps / fft
            assert abs(peak - expect) < 40, (peak, expect)
            await ws.close()

            wsw = await client.ws_connect("/waterfall")
            json.loads((await wsw.receive()).data)
            import zstandard
            d = zstandard.ZstdDecompressor().decompressobj()
            row = None
            for _ in range(400):
                try:
                    msg = await wsw.receive(timeout=0.1)
                except asyncio.TimeoutError:
                    continue
                if msg.type.name == "BINARY":
                    p = decode_cbor(d.decompress(msg.data))
                    row = p
                    break
            assert row is not None, "no waterfall rows"
            rdata = np.frombuffer(bytes(row["data"]), np.int8)
            scale = (row["r"] - row["l"]) // rdata.size
            peak_bin = int(np.argmax(rdata)) * scale + row["l"]
            assert abs(peak_bin - bin_c) <= 2 * scale, (peak_bin, bin_c)
            await wsw.close()
        finally:
            driver.stop()
            await client.close()

    asyncio.run(flow())
