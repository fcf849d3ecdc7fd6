"""Serving-edge protocol tests: handshake, commands, audio/waterfall
packet formats, events, backpressure registry behavior -- all against
the real aiohttp app with a synthetic dispatch (no device needed)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.runtime.server import SpectrumServer
from phantomsdr_tpu.runtime import cbor as cbor_enc
from tests.test_codecs import decode_flac


def make_cfg(**over):
    inp = {
        "sps": 192000,
        "frequency": 7166000,
        "fft_size": 32768,
        "signal": "iq",
        "audio_sps": 12000,
        "waterfall_size": 1024,
        "driver": {"format": "s16"},
    }
    inp.update(over.pop("input", {}))
    return config_from_dict({
        "input": inp,
        "tpu": {"hop_batch": 4, "max_channels": 8},
        **over,
    })


def decode_cbor(data: bytes):
    # ONE decoder for the server's nlohmann-compatible wire format:
    # tools/verify/client.py's (also used by tools/stress.py) -- a
    # second hand-rolled copy here silently diverged on extensions
    from tools.verify.client import cbor_decode

    return cbor_decode(data)


def async_test(f):
    # pytest-asyncio is not available in this image; plain asyncio.run
    import functools

    @functools.wraps(f)
    def wrapper(*a, **k):
        asyncio.run(f(*a, **k))
    return wrapper


@pytest.fixture
def cfg():
    return make_cfg()


async def run_app(server):
    ts = TestServer(server.app)
    client = TestClient(ts)
    await client.start_server()
    return client


def synth_outputs(cfg, server, frame0=0):
    """Synthesize what the device would output: audio + waterfall views
    gathered from a synthetic pyramid via the registry view table."""
    from phantomsdr_tpu.pipeline import waterfall_due_positions

    b = cfg.hop_batch
    c = cfg.max_channels
    half = cfg.audio_fft_size // 2
    rng = np.random.default_rng(frame0)
    audio = (rng.standard_normal((b, c, half)) * 3000).astype(np.int16)
    pwr = np.abs(rng.standard_normal((b, c))).astype(np.float32)
    p = sum(cfg.fft_result_size >> i for i in range(cfg.downsample_levels))
    pyr = rng.integers(-128, 127, size=(b, p), dtype=np.int8)
    due = waterfall_due_positions(cfg, frame0)
    _, start, length, _meta = server.waterfalls.snapshot()
    w = start.shape[0]
    cap = server.waterfalls.view_cap
    wf = np.zeros((len(due), w, cap), np.int8)
    for d, h in enumerate(due):
        for i in range(w):
            n = int(length[i])
            wf[d, i, :n] = pyr[h, start[i]:start[i] + n]
    return audio, pwr, wf, due, pyr


@async_test
async def test_audio_handshake_and_stream(cfg):
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        info = json.loads((await ws.receive()).data)
        assert info["sps"] == cfg.sps
        assert info["fft_result_size"] == cfg.fft_result_size
        assert info["audio_max_fft"] == cfg.audio_max_fft_size
        assert info["defaults"]["modulation"] == cfg.default_mode_str
        assert info["audio_compression"] == "flac"
        # default slice registered
        assert server.channels.count == 1
        slot = next(iter(server.channels.slots.values()))
        assert (slot.l, slot.r) == (cfg.default_l, cfg.default_r)

        # retune
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 100, "m": 150.5, "r": 300}))
        await asyncio.sleep(0.05)
        assert slot.l == 100 and slot.r == 300 and slot.mid == 150.5
        # invalid retunes are ignored (src/signal.cpp:300-314)
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": -1, "m": 1.0, "r": 300}))
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 0, "m": 1.0,
             "r": cfg.audio_fft_size + 100}))
        await ws.send_str("garbage {{{")
        await asyncio.sleep(0.05)
        assert slot.l == 100 and slot.r == 300

        await ws.send_str(json.dumps(
            {"cmd": "demodulation", "demodulation": "FM"}))
        await asyncio.sleep(0.05)
        assert slot.mode == "FM"

        # dispatch a few batches; slot should receive CBOR+FLAC
        flac = b""
        metas = []
        for s in range(30):
            audio, pwr, wf, due, _pyr = synth_outputs(cfg, server, s)
            server.dispatch(s * cfg.hop_batch, audio, pwr, wf, due)
            while True:
                try:
                    msg = await ws.receive(timeout=0.05)
                except asyncio.TimeoutError:
                    break
                if msg.type.name == "BINARY":
                    p = decode_cbor(msg.data)
                    metas.append(p)
                    flac += bytes(p["data"])
        assert metas, "no audio packets received"
        m0 = metas[0]
        assert m0["l"] == 0 and m0["r"] == 200 and m0["m"] == 150.5
        sr, samples = decode_flac(flac)
        assert sr == cfg.audio_sps
        assert len(samples) > 0
        await ws.close()
        await asyncio.sleep(0.05)
        assert server.channels.count == 0
    finally:
        await client.close()


@async_test
async def test_waterfall_stream_and_level_selection(cfg):
    import zstandard

    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall")
        json.loads((await ws.receive()).data)
        slot = next(iter(server.waterfalls.clients.values()))
        # default: full span at coarsest level
        assert slot.level == cfg.downsample_levels - 1
        assert (slot.l, slot.r) == (0, cfg.waterfall_size)

        # full-span window -> picks the level closest to waterfall_size
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 0, "r": cfg.fft_result_size}))
        await asyncio.sleep(0.05)
        assert slot.r - slot.l == cfg.waterfall_size

        audio, pwr, wf, due, pyr = synth_outputs(cfg, server)
        server.dispatch(0, audio, pwr, wf, due)
        d = zstandard.ZstdDecompressor().decompressobj()
        got = []
        while True:
            try:
                msg = await ws.receive(timeout=0.1)
            except asyncio.TimeoutError:
                break
            if msg.type.name == "BINARY":
                got.append(decode_cbor(d.decompress(msg.data)))
        assert got
        p0 = got[0]
        assert p0["l"] == slot.l << slot.level
        assert p0["r"] == slot.r << slot.level
        row = np.frombuffer(bytes(p0["data"]), np.int8)
        # row content matches the pyramid slice for that level
        off = server.level_offsets[slot.level]
        frame = p0["frame_num"]
        np.testing.assert_array_equal(
            row, pyr[frame, off + slot.l: off + slot.r])
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_waterfall_deflate_switch(cfg):
    """{"cmd":"compression","waterfall":"deflate"} (extension for the
    built-in html/ frontend): the conn acks with a {"type":
    "compression"} text frame, and everything after it is ONE raw-
    deflate stream carrying the same CBOR rows the zstd path would."""
    import zlib

    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall")
        info = json.loads((await ws.receive()).data)
        assert info["waterfall_deflate_available"] is True
        slot = next(iter(server.waterfalls.clients.values()))
        await ws.send_str(json.dumps(
            {"cmd": "compression", "waterfall": "deflate"}))
        # ack rides the affine worker -> loop; poke the loop until seen
        acked = False
        for _ in range(40):
            try:
                msg = await ws.receive(timeout=0.05)
            except asyncio.TimeoutError:
                continue
            if msg.type.name == "TEXT":
                d = json.loads(msg.data)
                if d.get("type") == "compression":
                    assert d["waterfall"] == "deflate"
                    acked = True
                    break
        assert acked
        audio, pwr, wf, due, pyr = synth_outputs(cfg, server)
        server.dispatch(0, audio, pwr, wf, due)
        dec = zlib.decompressobj(-15)
        got = []
        while True:
            try:
                msg = await ws.receive(timeout=0.1)
            except asyncio.TimeoutError:
                break
            if msg.type.name == "BINARY":
                got.append(decode_cbor(dec.decompress(msg.data)))
        assert got
        p0 = got[0]
        row = np.frombuffer(bytes(p0["data"]), np.int8)
        off = server.level_offsets[slot.level]
        np.testing.assert_array_equal(
            row, pyr[p0["frame_num"], off + slot.l: off + slot.r])
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_waterfall_deflate_switch_mid_stream(cfg):
    """Switching compression AFTER zstd rows already flowed: the rows
    before the {"type":"compression"} ack stay zstd (one continuous
    stream), everything after it is ONE FRESH deflate stream -- the
    client-side contract the built-in frontend relies on (drop binary
    until ack, then start a new decompressor)."""
    import zlib

    import zstandard

    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall")
        json.loads((await ws.receive()).data)
        slot = next(iter(server.waterfalls.clients.values()))

        pyrs = {}  # step frame0 -> that step's pyramid

        async def pump(n, frame0, sink):
            for st in range(n):
                audio, pwr, wf, due, pyr = synth_outputs(cfg, server,
                                                         frame0 + st)
                f0 = (frame0 + st) * cfg.hop_batch
                pyrs[f0] = pyr
                server.dispatch(f0, audio, pwr, wf, due)
                while True:
                    try:
                        msg = await ws.receive(timeout=0.05)
                    except asyncio.TimeoutError:
                        break
                    sink.append(msg)

        pre, post = [], []
        await pump(3, 0, pre)
        zstd_rows = [m for m in pre if m.type.name == "BINARY"]
        assert zstd_rows
        zd = zstandard.ZstdDecompressor().decompressobj()
        for m in zstd_rows:  # continuous zstd stream pre-switch
            decode_cbor(zd.decompress(m.data))

        await ws.send_str(json.dumps(
            {"cmd": "compression", "waterfall": "deflate"}))
        await asyncio.sleep(0.05)
        await pump(3, 3, post)
        acked = False
        dec = zlib.decompressobj(-15)
        got = []
        for m in post:
            if m.type.name == "TEXT":
                if json.loads(m.data).get("type") == "compression":
                    acked = True
            elif acked:  # fresh deflate stream strictly after the ack
                got.append(decode_cbor(dec.decompress(m.data)))
        assert acked and got
        off = server.level_offsets[slot.level]
        fn = got[0]["frame_num"]
        f0 = (fn // cfg.hop_batch) * cfg.hop_batch
        row = np.frombuffer(bytes(got[0]["data"]), np.int8)
        np.testing.assert_array_equal(
            row, pyrs[f0][fn - f0, off + slot.l: off + slot.r])
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_events_and_metrics(cfg):
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws_a = await client.ws_connect("/audio")
        await ws_a.receive()
        ws_e = await client.ws_connect("/events")
        st = json.loads((await ws_e.receive()).data)
        assert st["signal_clients"] == 1
        assert len(st["signal_changes"]) == 1
        uid, lmr = next(iter(st["signal_changes"].items()))
        assert lmr == [cfg.default_l, cfg.default_m, cfg.default_r]

        # a retune shows up in the next 1 Hz tick
        await ws_a.send_str(json.dumps(
            {"cmd": "window", "l": 10, "m": 20.0, "r": 30}))
        msg = await ws_e.receive(timeout=2.5)
        upd = json.loads(msg.data)
        assert upd["signal_changes"][uid] == [10, 20.0, 30]

        resp = await client.get("/metrics")
        m = await resp.json()
        assert m["audio_clients"] == 1
        await ws_a.close()
        await ws_e.close()
    finally:
        await client.close()


@async_test
async def test_sendqueue_backpressure_accounting():
    """The 50 kB slow-client gate (src/websocket.cpp:174,222) now rides
    the per-connection _SendQueue's outstanding-byte counter instead of
    aiohttp-private transport internals."""
    from phantomsdr_tpu.runtime.server import _SendQueue, BACKPRESSURE_LIMIT

    class StubWS:
        closed = False

        def __init__(self):
            self.sent = []
            self.gate = asyncio.Event()

        async def send_bytes(self, b):
            await self.gate.wait()
            self.sent.append(b)

        async def send_str(self, s):
            await self.gate.wait()
            self.sent.append(s)

    ws = StubWS()
    q = _SendQueue(ws)
    assert not q.backlogged
    chunk = b"x" * 10_000
    for _ in range(6):  # 60 kB queued while the peer stalls
        assert q.send_nowait(chunk)
    await asyncio.sleep(0.01)
    assert q.outstanding_bytes > BACKPRESSURE_LIMIT
    assert q.backlogged
    ws.gate.set()  # peer drains
    for _ in range(100):
        await asyncio.sleep(0.01)
        if not q.backlogged:
            break
    assert not q.backlogged and q.outstanding_bytes == 0
    assert len(ws.sent) == 6
    q.close()


@async_test
async def test_dispatch_uses_submitted_waterfall_coordinates(cfg):
    """A retune between step submit and dispatch must not relabel the
    already-gathered rows with the new l/r (ADVICE round 1)."""
    import zstandard

    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall")
        json.loads((await ws.receive()).data)
        slot = next(iter(server.waterfalls.clients.values()))
        audio, pwr, wf, due, pyr = synth_outputs(cfg, server)
        _, _, _, meta = server.waterfalls.snapshot()
        submitted = (slot.l, slot.r, slot.level)
        # retune AFTER the step was (conceptually) submitted
        server.waterfalls.retune(0, slot, 100, 612)
        assert (slot.l, slot.r, slot.level) != submitted
        server.dispatch(0, audio, pwr, wf, due, wf_meta=meta)
        d = zstandard.ZstdDecompressor().decompressobj()
        msg = await ws.receive(timeout=1.0)
        p = decode_cbor(d.decompress(msg.data))
        # packet labeled with the coordinates at submit time
        assert p["l"] == submitted[0] << submitted[2]
        assert p["r"] == submitted[1] << submitted[2]
        await ws.close()
    finally:
        await client.close()


def test_apply_cluster_state_diffs(cfg):
    """Multi-host /events derivation: remote users' changes come from
    diffing the replicated table; disconnects attribute via the old uid
    map; local slots are never double-reported."""
    server = SpectrumServer(cfg)
    c = cfg.max_channels
    l = np.zeros(c, np.int32); r = np.zeros(c, np.int32)
    mid = np.zeros(c, np.float64); act = np.zeros(c, bool)
    # remote slot 5 appears
    l[5], r[5], mid[5], act[5] = 100, 200, 150.0, True
    server.apply_cluster_state(l.copy(), r.copy(), mid.copy(), act.copy(),
                               {"5": "uidA"}, wf_clients=3)
    assert server.signal_changes["uidA"] == (100, 150.0, 200)
    assert server._event_counts() == {"waterfall_clients": 3,
                                      "signal_clients": 1}
    # initial state lists the remote user
    st = json.loads(server.initial_state_info())
    assert st["signal_changes"]["uidA"] == [100, 150.0, 200]
    server.signal_changes.clear()
    # unchanged table -> no new change
    server.apply_cluster_state(l.copy(), r.copy(), mid.copy(), act.copy(),
                               {"5": "uidA"}, 3)
    assert server.signal_changes == {}
    # retune
    l[5], mid[5] = 300, 350.0
    server.apply_cluster_state(l.copy(), r.copy(), mid.copy(), act.copy(),
                               {"5": "uidA"}, 3)
    assert server.signal_changes["uidA"] == (300, 350.0, 200)
    server.signal_changes.clear()
    # disconnect: uid gone from the new map, attributed via the old one
    act[5] = False
    server.apply_cluster_state(l.copy(), r.copy(), mid.copy(), act.copy(),
                               {}, 0)
    assert server.signal_changes["uidA"] == (-1, -1.0, -1)
    assert server._event_counts()["signal_clients"] == 0


@async_test
async def test_unknown_path_static_404(cfg):
    """Custom 404 page parity (src/http.cpp:61-76): an HTML body naming
    the missing resource -- with the path HTML-escaped (documented
    deviation: the reference reflects it raw)."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        resp = await client.get("/nonexistent-file.js")
        assert resp.status == 404
        body = await resp.text()
        assert "Error 404" in body
        assert "/nonexistent-file.js" in body
        # reflected-XSS guard: markup in the path must arrive escaped
        resp = await client.get('/<script>x</script>')
        assert resp.status == 404
        body = await resp.text()
        assert "<script>" not in body and "&lt;script&gt;" in body
    finally:
        await client.close()


@async_test
async def test_mute_skips_encode_jobs(cfg):
    """{"cmd":"mute"} actually mutes (deviation from the stored-but-
    unused flag, src/client.cpp:127): while muted, dispatch submits no
    audio ENCODE job for the conn -- but one data-less packet per step
    still carries the live signal power so the listener's S-meter/
    squelch display doesn't freeze; unmuting resumes the stream."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        json.loads((await ws.receive()).data)

        async def pump(n, frame0):
            pkts = []
            for s in range(n):
                audio, pwr, wf, due, _ = synth_outputs(cfg, server,
                                                       frame0 + s)
                server.dispatch((frame0 + s) * cfg.hop_batch, audio,
                                pwr, wf, due)
                while True:
                    try:
                        msg = await ws.receive(timeout=0.05)
                    except asyncio.TimeoutError:
                        break
                    if msg.type.name == "BINARY":
                        pkts.append(decode_cbor(msg.data))
            return pkts

        assert any(p["data"] for p in await pump(5, 0))
        await ws.send_str(json.dumps({"cmd": "mute", "mute": True}))
        await asyncio.sleep(0.05)
        muted = await pump(5, 5)
        assert muted, "muted conn lost its power telemetry"
        assert all(p["data"] == b"" for p in muted)
        assert all("pwr" in p for p in muted)
        await ws.send_str(json.dumps({"cmd": "mute", "mute": False}))
        await asyncio.sleep(0.05)
        assert any(p["data"] for p in await pump(5, 10))
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_am_sync_command_flips_column(cfg):
    """{"cmd":"am_sync","enabled":false} opts the listener out of the
    default PLL detection into envelope (the am_env registry column);
    re-enabling clears it.  basic_info advertises the default."""
    assert cfg.am_sync  # reference-with-liquid parity default
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        info = json.loads((await ws.receive()).data)
        assert info["am_sync"] is True
        slot = next(iter(server.channels.slots.values()))
        assert not server.channels.am_env[slot.slot]
        await ws.send_str(json.dumps({"cmd": "am_sync",
                                      "enabled": False}))
        await asyncio.sleep(0.05)
        assert server.channels.am_env[slot.slot]
        assert slot.am_env
        # consume any pending resets, then re-enable: the PLL carries
        # froze while on envelope, so the toggle back must queue a full
        # carry reset (stale carrier_prev/pll_phase = audible pop)
        server.channels.snapshot()
        await ws.send_str(json.dumps({"cmd": "am_sync", "enabled": True}))
        await asyncio.sleep(0.05)
        assert not server.channels.am_env[slot.slot]
        from phantomsdr_tpu.runtime.registry import RESET_FULL
        _, _, mask, _ = server.channels.snapshot()
        assert mask is not None and mask[slot.slot] == RESET_FULL
        # the column clears when the slot is released to a new user
        await ws.send_str(json.dumps({"cmd": "am_sync",
                                      "enabled": False}))
        await ws.close()
        await asyncio.sleep(0.05)
        assert not server.channels.am_env.any()
    finally:
        await client.close()


@async_test
async def test_signal_changes_cleared_without_event_subscribers(cfg):
    """The 1 Hz event timer must clear the change map even with zero
    /events subscribers (the reference clears it unconditionally each
    tick, src/events.cpp): per-uid entries otherwise accumulate forever
    under client churn and the first subscriber gets a stale backlog."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        assert cfg.otherusers
        for i in range(5):
            server.broadcast_signal_change(f"uid{i}", 1, 2.0, 3)
        assert len(server.signal_changes) == 5
        await asyncio.sleep(1.3)  # one timer tick, no /events conns
        assert server.signal_changes == {}
    finally:
        await client.close()


@async_test
async def test_slot_exhaustion(cfg):
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        conns = []
        for _ in range(cfg.max_channels):
            ws = await client.ws_connect("/audio")
            await ws.receive()
            conns.append(ws)
        assert server.channels.count == cfg.max_channels
        # one more: handshake then immediate close (no free slot)
        ws = await client.ws_connect("/audio")
        await ws.receive()  # basic_info still sent
        msg = await ws.receive(timeout=2)
        assert msg.type.name in ("CLOSE", "CLOSED", "CLOSING")
        for c in conns:
            await c.close()
    finally:
        await client.close()


@async_test
async def test_opus_audio_path():
    cfg = make_cfg(input={"audio_compression": "opus"})
    assert cfg.audio_compression == "opus"
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        info = json.loads((await ws.receive()).data)
        assert info["audio_compression"] == "opus"
        pkts = []
        for s in range(40):
            audio, pwr, wf, due, _ = synth_outputs(cfg, server, s)
            server.dispatch(s * cfg.hop_batch, audio, pwr, wf, due)
            while True:
                try:
                    msg = await ws.receive(timeout=0.02)
                except asyncio.TimeoutError:
                    break
                if msg.type.name == "BINARY":
                    pkts.append(decode_cbor(msg.data))
        # 40 batches * 4 hops * (audio_fft/2) samples at 12k -> opus 20ms
        # frames of 240 samples each -> many packets
        assert len(pkts) > 20
        assert all(len(p["data"]) > 1 for p in pkts)
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_dispatch_uses_submitted_audio_coordinates(cfg):
    """Audio packets must carry the (mid, width) the PCM was demodulated
    at, not post-retune values (same rule as wf_meta)."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        json.loads((await ws.receive()).data)
        slot = next(iter(server.channels.slots.values()))
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 100, "m": 150.5, "r": 300}))
        await asyncio.sleep(0.05)
        _, _, _, audio_meta = server.channels.snapshot()
        submitted = (150.5, 200)
        # retune AFTER the step was (conceptually) submitted
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 400, "m": 500.0, "r": 700}))
        await asyncio.sleep(0.05)
        assert slot.mid == 500.0
        audio, pwr, wf, due, _ = synth_outputs(cfg, server)
        for s in range(10):
            server.dispatch(s * cfg.hop_batch, audio, pwr, None, [],
                            audio_meta=audio_meta)
        got = None
        for _ in range(100):  # ~5 s budget: encode runs on pool workers
            try:
                msg = await ws.receive(timeout=0.05)
            except asyncio.TimeoutError:
                continue
            if msg.type.name == "BINARY":
                got = decode_cbor(msg.data)
                break
        assert got is not None
        assert got["m"] == submitted[0] and got["r"] == submitted[1]
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_opus_device_decimated_dispatch():
    """Opus >48 kHz: the device ships [C, T] decimated streams; dispatch
    feeds them straight to a 48 kHz encoder (no host convolve)."""
    cfg = make_cfg(input={"audio_compression": "opus", "audio_sps": 96000,
                          "sps": 960000, "fft_size": 16384})
    assert cfg.opus_decim == 2 and cfg.device_decim
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        json.loads((await ws.receive()).data)
        conn = next(iter(server.audio_conns.values()))
        assert conn.encoder.rate == 48000
        assert conn.encoder._decim == 1  # host decimation NOT engaged
        b, c = cfg.hop_batch, cfg.max_channels
        t = b * (cfg.audio_fft_size // 2) // 2
        rng = np.random.default_rng(0)
        pkts = []
        for s in range(30):
            audio = (rng.standard_normal((c, t)) * 3000).astype(np.int16)
            pwr = np.abs(rng.standard_normal((b, c))).astype(np.float32)
            server.dispatch(s * b, audio, pwr, None, [])
            while True:
                try:
                    msg = await ws.receive(timeout=0.02)
                except asyncio.TimeoutError:
                    break
                if msg.type.name == "BINARY":
                    pkts.append(decode_cbor(msg.data))
        assert len(pkts) > 5
        frames = [p["frame_num"] for p in pkts]
        assert frames == sorted(frames)
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_gzip_static(cfg, tmp_path):
    cfg.html_root = str(tmp_path)
    (tmp_path / "index.html").write_text("<html>" + "x" * 5000 + "</html>")
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        resp = await client.get("/", headers={"Accept-Encoding": "gzip"})
        assert resp.status == 200
        body = await resp.text()
        assert body.startswith("<html>")
        assert resp.headers.get("Cache-Control") == "max-age=30"
    finally:
        await client.close()


@async_test
async def test_limits_enforced():
    cfg = make_cfg(limits={"audio": 2, "waterfall": 1, "events": 1})
    assert cfg.limit_audio == 2
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        a1 = await client.ws_connect("/audio"); await a1.receive()
        a2 = await client.ws_connect("/audio"); await a2.receive()
        a3 = await client.ws_connect("/audio")
        await a3.receive()  # basic_info
        msg = await a3.receive(timeout=2)
        assert msg.type.name in ("CLOSE", "CLOSED", "CLOSING")
        e1 = await client.ws_connect("/events"); await e1.receive()
        e2 = await client.ws_connect("/events")
        msg = await e2.receive(timeout=2)
        assert msg.type.name in ("CLOSE", "CLOSED", "CLOSING")
        for ws in (a1, a2, e1):
            await ws.close()
    finally:
        await client.close()


@async_test
async def test_av1_waterfall_path():
    from phantomsdr_tpu.runtime import av1 as av1mod
    if not av1mod.av1_available():
        import pytest
        pytest.skip(f"libaom unavailable: {av1mod._Aom.failure()}")
    from tests.test_av1 import parse_obus, OBU_METADATA

    cfg = make_cfg(input={"waterfall_compression": "av1"})
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall", max_msg_size=1 << 22)
        info = json.loads((await ws.receive()).data)
        assert info["waterfall_compression"] == "av1"
        frames = []
        for s in range(40):
            audio, pwr, wf, due, _ = synth_outputs(cfg, server, s)
            server.dispatch(s * cfg.hop_batch, audio, pwr, wf, due)
            while True:
                try:
                    msg = await ws.receive(timeout=0.02)
                except asyncio.TimeoutError:
                    break
                if msg.type.name == "BINARY":
                    frames.append(msg.data)
        assert frames, "no AV1 frames received"
        obus = parse_obus(frames[0])
        assert OBU_METADATA in [t for t, _ in obus]
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_traversal_guard_sibling_prefix(cfg, tmp_path):
    root = tmp_path / "html"
    root.mkdir()
    (root / "index.html").write_text("ok")
    sib = tmp_path / "html_private"
    sib.mkdir()
    (sib / "secret.txt").write_text("secret")
    cfg.html_root = str(root)
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        resp = await client.get("/index.html")
        assert resp.status == 200
        # sibling dir shares the path prefix; must NOT be served
        resp = await client.get("/..%2Fhtml_private%2Fsecret.txt")
        assert resp.status in (403, 404)
        resp = await client.get("/../html_private/secret.txt")
        assert resp.status in (403, 404)
    finally:
        await client.close()


@async_test
async def test_default_range_at_result_size_boundary():
    # WBFM defaults can clamp r to exactly fft_result_size; the command
    # validation would reject that, but defaults must still activate
    # (the reference applies defaults via set_audio_range directly)
    cfg = make_cfg(input={
        "sps": 192000,
        "defaults": {"frequency": 7166000 + 96000, "modulation": "WBFM"},
        "audio_sps": 48000,
    })
    assert cfg.default_r >= cfg.fft_result_size - 1
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        await ws.receive()
        await asyncio.sleep(0.05)
        slot = next(iter(server.channels.slots.values()))
        assert server.channels.active[slot.slot], "default slice must activate"
        # this WBFM-at-48k config's default is wider than the demod
        # buffer, so the width safety cap binds (the reference has no
        # such cap and would overrun its audio buffer); r stops at
        # l + audio_fft_size, inside the band
        assert slot.r == min(cfg.fft_result_size,
                             slot.l + cfg.audio_fft_size)
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_default_range_reaches_result_size():
    """Reference parity: a default slice whose width FITS may sit
    exactly at r == fft_result_size (the reference applies defaults
    unvalidated, websocket.cpp:145; on_window_message would reject
    r == R).  The device handles r == R via the DC-wrap extension."""
    cfg = make_cfg(input={
        "sps": 192000,
        # USB tuned at the very top edge of the band
        "defaults": {"frequency": 7166000 - 96000 + 191990,
                     "modulation": "USB"},
        "audio_sps": 12000,
    })
    assert cfg.default_r == cfg.fft_result_size
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        await ws.receive()
        await asyncio.sleep(0.05)
        slot = next(iter(server.channels.slots.values()))
        assert server.channels.active[slot.slot]
        assert slot.r == cfg.fft_result_size
        assert slot.r - slot.l <= cfg.audio_fft_size
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_command_fuzz_survival(cfg):
    """Seeded fuzz over the command surface: random JSON fragments,
    pathological numbers (NaN/Infinity literals json.loads accepts,
    huge ints, wrong types), unknown commands, oversized messages and
    raw binary frames on both endpoints.  The server must neither
    crash a handler task nor corrupt the registries: after the storm a
    fresh client still gets a handshake and dispatched audio."""
    import random

    rng = random.Random(1234)
    server = SpectrumServer(cfg)
    client = await run_app(server)

    def fuzz_msg():
        kind = rng.randrange(7)
        if kind == 6:  # valid JSON whose top level is not an object --
            # json.loads succeeds, then .get() must not AttributeError
            # the handler out of its read loop (round-5 fix)
            return rng.choice(["null", "123", '"x"', "[1,2]", "true"])
        if kind == 0:  # random bytes pretending to be text
            return "".join(chr(rng.randrange(32, 0x2FF))
                           for _ in range(rng.randrange(1, 80)))
        if kind == 1:  # valid JSON, random structure
            return json.dumps({
                rng.choice(["cmd", "l", "x"]): rng.choice(
                    ["window", "demodulation", "nr", "rds", "mute",
                     "userid", "nonsense", 7, None, [1, 2]])})
        if kind == 2:  # window with pathological numbers
            return json.dumps({"cmd": "window",
                               "l": rng.choice([-5, 0, 10, 2**62]),
                               "m": rng.choice([150.0, -1.0, 3e9, -3e9,
                                                float(2**62)]),
                               "r": rng.choice([-9, 100, 2**62])})
        if kind == 3:  # NaN / Infinity literals (json.loads accepts)
            return ('{"cmd":"window","l":1,"m":' +
                    rng.choice(["NaN", "Infinity", "-Infinity"]) +
                    ',"r":20}')
        if kind == 4:  # oversized message (truncated at 1024 by server)
            return json.dumps({"cmd": "userid",
                               "userid": "x" * rng.randrange(2000, 6000)})
        return json.dumps({"cmd": rng.choice(
            ["demodulation", "nr", "rds"]),
            "demodulation": rng.choice(["FM", "QAM", 17, None]),
            "enabled": rng.choice([True, "yes", 3])})

    try:
        for endpoint in ("/audio", "/waterfall"):
            ws = await client.ws_connect(endpoint)
            await ws.receive()  # handshake
            # deterministic non-object JSON probes (not just fuzz
            # luck), then a valid retune that must land on the SAME
            # connection -- an AttributeError would have killed this
            # handler silently and only a fresh client would still work
            for scalar in ("null", "[1]", "123", '"x"'):
                await ws.send_str(scalar)
            await ws.send_str(json.dumps(
                {"cmd": "window", "l": 11, "m": 20.0, "r": 31}))
            await asyncio.sleep(0.1)
            if endpoint == "/audio":
                slot = next(iter(server.channels.slots.values()))
                assert (slot.l, slot.r) == (11, 31)
            else:
                wslot = next(iter(server.waterfalls.clients.values()))
                assert (wslot.l, wslot.r) == (11, 31)
            for _ in range(120):
                m = fuzz_msg()
                if rng.random() < 0.15:
                    await ws.send_bytes(m.encode())
                else:
                    await ws.send_str(m)
            await asyncio.sleep(0.2)
            await ws.close()
        await asyncio.sleep(0.1)
        assert server.channels.count == 0
        assert server.waterfalls.count == 0

        # the server still serves a well-behaved client
        ws = await client.ws_connect("/audio")
        info = json.loads((await ws.receive()).data)
        assert info["sps"] == cfg.sps
        await asyncio.sleep(0.05)
        audio, pwr, wf, due, _ = synth_outputs(cfg, server)
        server.dispatch(0, audio, pwr, wf, due)
        got = False
        for _ in range(40):
            try:
                msg = await ws.receive(timeout=0.1)
            except asyncio.TimeoutError:
                break
            if msg.type.name == "BINARY":
                got = True
                break
        assert got, "no audio after the fuzz storm"
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_dual_stack_listen():
    """make_site on the default 0.0.0.0 binds one IPv6 dual-stack
    socket (reference: src/spectrumserver.cpp:239-243 tries IPv6 then
    falls back to IPv4): the same listener must serve a v4 loopback
    client AND a v6 loopback client; an explicit host stays a plain
    v4 bind."""
    import aiohttp
    from aiohttp import web as aioweb
    from phantomsdr_tpu.main import make_site

    app = aioweb.Application()

    async def ping(request):
        return aioweb.Response(text="pong")

    app.router.add_get("/ping", ping)
    runner = aioweb.AppRunner(app)
    await runner.setup()
    # ephemeral port: bind a throwaway socket to find a free one
    import socket as pysock
    probe = pysock.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    site, disp = make_site(runner, "0.0.0.0", port)
    has_v6 = disp == "[::]"
    await site.start()
    try:
        async with aiohttp.ClientSession() as s:
            async with s.get(f"http://127.0.0.1:{port}/ping") as r:
                assert await r.text() == "pong"
            if has_v6:
                async with s.get(f"http://[::1]:{port}/ping") as r:
                    assert await r.text() == "pong"
    finally:
        await runner.cleanup()

    # explicit host: honored verbatim (no dual-stack rewrite)
    runner2 = aioweb.AppRunner(app)
    await runner2.setup()
    site2, disp2 = make_site(runner2, "127.0.0.1", port)
    assert disp2 == "127.0.0.1"
    await site2.start()
    try:
        async with aiohttp.ClientSession() as s:
            async with s.get(f"http://127.0.0.1:{port}/ping") as r:
                assert r.status == 200
    finally:
        await runner2.cleanup()


@async_test
async def test_events_backpressure_gate(cfg):
    """A stalled /events reader gets the same 50 kB gate as every other
    endpoint (src/websocket.cpp:174,222): the 1 Hz timer must stop
    enqueueing for a backlogged connection instead of growing its
    _SendQueue by one JSON blob per tick forever."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws_e = await client.ws_connect("/events")
        await ws_e.receive()  # initial state
        q = next(iter(server.event_conns.values()))
        # pin the backpressure signal high (in-memory test transports
        # never block, so simulate the stalled-reader state directly)
        q.outstanding_bytes += 100_000
        with pytest.raises(asyncio.TimeoutError):
            await ws_e.receive(timeout=2.5)  # >2 ticks: all gated
        q.outstanding_bytes -= 100_000       # reader drained; resume
        msg = await ws_e.receive(timeout=2.5)
        assert "signal_clients" in json.loads(msg.data)
        await ws_e.close()
    finally:
        await client.close()


@async_test
async def test_retune_huge_finite_mid(cfg):
    """Any finite m is accepted like the reference (its bin-copy
    intersection just yields silence when m is outside the slice,
    src/signal.cpp:106-137), including values beyond int32: the device
    table entry is clamped instead of raising OverflowError mid-update
    and killing the /audio handler."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/audio")
        await ws.receive()  # basic_info
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 10, "m": 3e9, "r": 30}))
        await asyncio.sleep(0.05)
        slot = next(iter(server.channels.slots.values()))
        assert (slot.l, slot.r) == (10, 30)
        assert slot.mid == 3e9
        assert server.channels.m_idx[slot.slot] == 2**31 - 1
        # the handler survived: a followup command still lands
        await ws.send_str(json.dumps(
            {"cmd": "window", "l": 5, "m": 15.0, "r": 25}))
        await asyncio.sleep(0.05)
        assert (slot.l, slot.r) == (5, 25)
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_waterfall_retune_out_of_spectrum_ignored(cfg):
    """Waterfall window requests beyond fft_result_size are rejected
    like the audio side's (signal.cpp:300-314 analogue): before the
    round-5 bound, a request with l and r both past the spectrum never
    beat the level-search init, so the raw level-0 coordinates clamped
    to a ZERO-WIDTH view and the client's waterfall silently went
    blank."""
    server = SpectrumServer(cfg)
    client = await run_app(server)
    try:
        ws = await client.ws_connect("/waterfall")
        await ws.receive()  # basic_info
        cid = next(iter(server.waterfalls.clients))
        slot = server.waterfalls.clients[cid]
        before = (slot.level, slot.l, slot.r)
        R = cfg.fft_result_size
        # asserted per message: later probes that clamp back to the
        # default view must not mask an earlier zero-width corruption
        for l, r in ((R * 100, R * 200), (0, R * 3000), (5, R + 1)):
            await ws.send_str(json.dumps({"cmd": "window", "l": l, "r": r}))
            await asyncio.sleep(0.05)
            assert (slot.level, slot.l, slot.r) == before, (l, r)
            assert server.waterfalls.length[cid] > 0
        # a legitimate full-spectrum request still lands
        await ws.send_str(json.dumps({"cmd": "window", "l": 0, "r": R}))
        await asyncio.sleep(0.05)
        assert slot.r > slot.l
        assert server.waterfalls.length[cid] > 0
        await ws.close()
    finally:
        await client.close()


@async_test
async def test_conn_ctor_failure_leaks_no_sender_task():
    """A failing codec constructor must not leave a pending _SendQueue
    sender task behind: the queue (and its task) is created only after
    the fallible codec ctor succeeds."""
    from phantomsdr_tpu.runtime import server as srvmod

    cfg = make_cfg(input={"audio_compression": "opus"})
    server = SpectrumServer(cfg)
    slot = server.channels.acquire("leak-test")

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("codec unavailable")

    real = srvmod.OpusChunkEncoder
    srvmod.OpusChunkEncoder = Boom
    try:
        before = {t for t in asyncio.all_tasks() if not t.done()}
        with pytest.raises(RuntimeError, match="codec unavailable"):
            srvmod.AudioConn(server, None, slot)
        after = {t for t in asyncio.all_tasks() if not t.done()}
        assert after == before  # no orphaned sender task
    finally:
        srvmod.OpusChunkEncoder = real
        server.channels.release(slot)


def test_submit_control_never_shed_under_saturation():
    """Data jobs are droppable under pool saturation, but control ops
    (compression swaps) carry a protocol ack the client waits on -- a
    control submit must survive a full queue."""
    import threading as th

    from phantomsdr_tpu.runtime.server import EncodePool

    pool = EncodePool(1)
    gate = th.Event()
    done = th.Event()
    assert pool.submit(0, gate.wait)   # park the single worker
    while pool.submit(0, lambda: None):
        pass                           # fill the queue to Full
    assert pool.dropped >= 1           # data path sheds as designed
    pool.submit_control(0, done.set)   # control path must not
    gate.set()
    assert done.wait(5), "control op was shed under saturation"
    pool.stop()
