"""Multi-host runtime validation: CPU-cluster dryruns
(tools/multihost_dryrun.py) and real N-process server clusters.

Covers: jax.distributed bootstrap (N processes x 2 virtual devices, one
2N-device mesh, gloo collectives across process boundaries), DCN raw-
row feeding over real TCP links, replicated control-block distribution,
follower-side retunes flowing upstream (incl. CONCURRENT retunes from
two followers -- the merge_rows fan-in), per-host channel-range audio
extraction, bit-identity against the single-process pipeline, live
listeners served on every host of a 3-process cluster, and fault
injection (follower SIGKILL in 2- and 3-process topologies, EOF)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def test_control_codec_roundtrip():
    """pack_control/unpack_control must stay in lockstep (every column
    of the channel table, incl. the nr/rds/am_env opt-ins, plus views,
    wf meta and the optional reset mask survive the wire)."""
    from phantomsdr_tpu.parallel.multihost import (
        pack_control, unpack_control,
    )

    rng = np.random.default_rng(0)
    c, w = 8, 5
    tbl = (rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 1000, c).astype(np.int32),
           rng.integers(0, 4, c).astype(np.int32),
           rng.integers(0, 2, c).astype(bool),
           rng.integers(0, 2, c).astype(bool),
           rng.integers(0, 2, c).astype(bool),
           rng.integers(0, 2, c).astype(bool))
    mid = rng.standard_normal(c)
    views = (rng.integers(0, 99, w).astype(np.int32),
             rng.integers(0, 99, w).astype(np.int32))
    wfm = tuple(rng.integers(0, 99, w).astype(np.int32) for _ in range(3))
    for reset in (None, rng.integers(0, 3, c).astype(np.int32)):
        hdr, blob = pack_control(tbl, mid, views, wfm, reset)
        tbl2, mid2, views2, wfm2, reset2 = unpack_control(hdr, blob)
        for a, b in zip(tbl, tbl2):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(mid, mid2)
        for a, b in zip(views + wfm, views2 + wfm2):
            np.testing.assert_array_equal(a, b)
        if reset is None:
            assert reset2 is None
        else:
            np.testing.assert_array_equal(reset, reset2)


def test_host_update_codec_roundtrip():
    """pack_host_update/unpack_host_update lockstep: the follower's
    9 channel-range arrays (incl. mid, nr, rds, am_env), reset mask,
    and the waterfall range's 5 view arrays."""
    from phantomsdr_tpu.parallel.multihost import (
        pack_host_update, unpack_host_update,
    )

    rng = np.random.default_rng(1)
    c, w = 4, 3
    ctbl = (rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 99, c).astype(np.int32),
            rng.integers(0, 4, c).astype(np.int32),
            rng.integers(0, 2, c).astype(bool),
            rng.standard_normal(c),
            rng.integers(0, 2, c).astype(bool),
            rng.integers(0, 2, c).astype(bool),
            rng.integers(0, 2, c).astype(bool))
    wrows = tuple(rng.integers(0, 99, w).astype(np.int32)
                  for _ in range(5))
    for resets in (None, rng.integers(0, 3, c).astype(np.int32)):
        hdr, blob = pack_host_update(2, c, ctbl, resets, 1, w, wrows)
        tbl2, resets2, wrows2 = unpack_host_update(hdr, blob)
        assert hdr["chan_offset"] == 2 and hdr["wf_offset"] == 1
        for a, b in zip(ctbl, tbl2):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(wrows, wrows2):
            np.testing.assert_array_equal(a, b)
        if resets is None:
            assert resets2 is None
        else:
            np.testing.assert_array_equal(resets, resets2)


def test_multihost_cluster_pipelined_acks(tmp_path):
    """The REAL MultihostDriver as a 2-process cluster, with a 1.5 s
    one-way latency injected on every step_done ack
    (PHANTOM_MH_TEST_ACK_DELAY).  The one-step-in-flight barrier (wait
    for ack N-2 before shipping N) must hide that latency: observed
    step cadence ~= RTT/2, where the old lockstep barrier (ack N-1)
    pinned it at >= RTT.  Also the first CI coverage of main.py's
    --coordinator/--link-port cluster path end to end."""
    import json
    import os
    import time
    import urllib.request

    delay = 1.5
    raw = np.random.default_rng(0).integers(
        -20000, 20000, size=192000 * 2, dtype=np.int16)
    capture = tmp_path / "capture.s16"
    raw.tofile(capture)
    cfg_text = """
[server]
port={port}

[input]
sps=192000
fft_size=2048
frequency=7166000
signal="iq"
audio_sps=12000
waterfall_size=256

[input.driver]
name="stdin"
format="s16"

[tpu]
hop_batch=8
max_channels=8
"""
    for pid, port in ((0, 19021), (1, 19022)):
        (tmp_path / f"config{pid}.toml").write_text(
            cfg_text.format(port=port))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PHANTOM_MH_TEST_ACK_DELAY=str(delay))
    common = [sys.executable, "-m", "phantomsdr_tpu",
              "--platform", "cpu", "--cpu-devices", "2",
              "--coordinator", "127.0.0.1:29655", "--num-processes", "2",
              "--input-file", str(capture), "--loop"]
    procs = []
    try:
        logs = [open(tmp_path / f"s{i}.log", "wb") for i in range(2)]
        procs.append(subprocess.Popen(
            common + ["-c", str(tmp_path / "config0.toml"),
                      "--process-id", "0", "--link-port", "28755"],
            env=env, stdout=logs[0], stderr=subprocess.STDOUT,
            cwd="/root/repo"))
        procs.append(subprocess.Popen(
            common + ["-c", str(tmp_path / "config1.toml"),
                      "--process-id", "1",
                      "--link-addr", "127.0.0.1:28755"],
            env=env, stdout=logs[1], stderr=subprocess.STDOUT,
            cwd="/root/repo", stdin=subprocess.DEVNULL))

        def metrics():
            with urllib.request.urlopen(
                    "http://127.0.0.1:19021/metrics", timeout=2) as r:
                return json.loads(r.read())

        deadline = time.monotonic() + 90
        m = None
        while time.monotonic() < deadline:
            assert all(p.poll() is None for p in procs), (
                (tmp_path / "s0.log").read_text()[-2000:]
                + (tmp_path / "s1.log").read_text()[-2000:])
            try:
                m = metrics()
                if m["frames"] >= 3 * 8:  # past the warm-up steps
                    break
            except OSError:
                pass
            time.sleep(0.5)
        assert m is not None and m["frames"] >= 3 * 8, m
        t0 = time.monotonic()
        f0 = m["frames"]
        time.sleep(9.0)
        m1 = metrics()
        dt = time.monotonic() - t0
        steps = (m1["frames"] - f0) / 8
        assert steps >= 2, (m, m1)
        cadence = dt / steps
        # lockstep would be >= delay (1.5 s); pipelined ~= delay/2
        assert cadence < delay * 0.8, (
            f"step cadence {cadence:.2f}s still bounded by the "
            f"{delay}s ack latency", m, m1)
        assert m1["device_errors"] == 0, m1
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def _spawn_cluster(tmp_path, ports, coordinator, link_port, loop=True,
                   capture_blocks=400, env_extra=None):
    """Start the real N-process cluster (N = len(ports): 1 ingest +
    N-1 followers); returns (procs, metrics_fn).  Caller terminates."""
    import os

    n_proc = len(ports)
    n_dev = 2 * n_proc
    raw = np.random.default_rng(0).integers(
        -20000, 20000, size=16384 * capture_blocks, dtype=np.int16)
    capture = tmp_path / "capture.s16"
    raw.tofile(capture)
    cfg_text = """
[server]
port={port}

[input]
sps=192000
fft_size=2048
frequency=7166000
signal="iq"
audio_sps=12000
waterfall_size=256

[input.driver]
name="stdin"
format="s16"

[tpu]
hop_batch={hop}
max_channels={chans}
"""
    # hop_batch/max_channels must divide over the mesh (sharded.py);
    # the historical 2-proc shape is 8/8
    hop = 8 if n_dev == 4 else 2 * n_dev
    chans = 8 if n_dev == 4 else 2 * n_dev
    for pid, port in enumerate(ports):
        (tmp_path / f"config{pid}.toml").write_text(
            cfg_text.format(port=port, hop=hop, chans=chans))
    env = dict(os.environ, JAX_PLATFORMS="cpu", **(env_extra or {}))
    common = [sys.executable, "-m", "phantomsdr_tpu",
              "--platform", "cpu", "--cpu-devices", "2",
              "--coordinator", f"127.0.0.1:{coordinator}",
              "--num-processes", str(n_proc),
              "--input-file", str(capture)] + (["--loop"] if loop else [])
    logs = [open(tmp_path / f"s{i}.log", "wb") for i in range(n_proc)]
    procs = [subprocess.Popen(
        common + ["-c", str(tmp_path / "config0.toml"),
                  "--process-id", "0", "--link-port", str(link_port)],
        env=env, stdout=logs[0], stderr=subprocess.STDOUT,
        cwd="/root/repo")]
    for pid in range(1, n_proc):
        procs.append(subprocess.Popen(
            common + ["-c", str(tmp_path / f"config{pid}.toml"),
                      "--process-id", str(pid),
                      "--link-addr", f"127.0.0.1:{link_port}"],
            env=env, stdout=logs[pid], stderr=subprocess.STDOUT,
            cwd="/root/repo", stdin=subprocess.DEVNULL))

    def metrics(which=0):
        import json
        import urllib.request

        with urllib.request.urlopen(
                f"http://127.0.0.1:{ports[which]}/metrics",
                timeout=2) as r:
            return json.loads(r.read())

    return procs, metrics


def _wait_metrics(procs, metrics, pred, deadline_s, tmp_path, which=0):
    import time

    deadline = time.monotonic() + deadline_s
    m = None
    while time.monotonic() < deadline:
        try:
            m = metrics(which)
            if pred(m):
                return m
        except OSError:
            pass
        # the polled process must stay up; its peer may legitimately be
        # dead (the fault being injected)
        assert procs[which].poll() is None, (
            (tmp_path / f"s{which}.log").read_text()[-2000:])
        time.sleep(0.3)
    raise AssertionError(f"metrics predicate not met in {deadline_s}s: {m}")


def test_multihost_follower_death(tmp_path):
    """Fault injection (VERDICT r3 item 5a): SIGKILL the follower
    mid-stream.  The jitted step is a collective over every process's
    devices, so the cluster CANNOT keep stepping without it (the next
    collective would hang all hosts) -- the contract under test is
    _fail_cluster's: the ingest host detects the dropped link
    promptly (reader-thread link-loss signal, not the 60 s ack
    timeout), surfaces the loss in /metrics (device_errors +
    last_device_error), stops issuing steps, and its serving edge
    stays up.  Reference analogue: per-client try/catch + backpressure
    drop (signal.cpp:295-297, websocket.cpp:174) -- scaled to the
    cluster, where 'drop the client' becomes 'fail the cluster
    loudly for the supervisor'."""
    import time

    procs, metrics = _spawn_cluster(
        tmp_path, ports=(19031, 19032), coordinator=29656,
        link_port=28756, loop=True)
    try:
        _wait_metrics(procs, metrics, lambda m: m["frames"] >= 3 * 8,
                      90, tmp_path)
        procs[1].kill()                       # follower dies mid-stream
        t_kill = time.monotonic()
        m = _wait_metrics(procs, metrics,
                          lambda m: m["device_errors"] >= 1,
                          30, tmp_path)
        detect_s = time.monotonic() - t_kill
        assert "cluster failed" in m["last_device_error"], m
        # prompt detection: the dropped link, not the 60 s ack barrier
        assert detect_s < 20, f"detection took {detect_s:.1f}s"
        # ingest stops issuing steps (frames freeze) but keeps serving
        f0 = metrics()["frames"]
        time.sleep(2.0)
        m2 = metrics()
        assert m2["frames"] == f0, (f0, m2)
        assert procs[0].poll() is None
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_multihost_eof_propagates_shutdown(tmp_path):
    """Fault injection (VERDICT r3 item 5b): input EOF at the ingest
    host propagates a CLEAN shutdown to the follower -- both hosts end
    with eof=true and zero device_errors in /metrics (the eof link
    message, parallel/multihost.py _run_ingest/_run_follower; the
    reader threads must treat the post-eof link close as orderly
    teardown, not follower loss), and both serving edges stay up for
    still-connected listeners (reference: stdin EOF isn't even
    handled, SURVEY section 5 -- this is a deliberate improvement)."""
    procs, metrics = _spawn_cluster(
        tmp_path, ports=(19033, 19034), coordinator=29657,
        link_port=28757, loop=False, capture_blocks=60)
    try:
        m0 = _wait_metrics(procs, metrics, lambda m: m["eof"], 120,
                           tmp_path, which=0)
        m1 = _wait_metrics(procs, metrics, lambda m: m["eof"], 30,
                           tmp_path, which=1)
        assert m0["device_errors"] == 0, m0
        assert m1["device_errors"] == 0, m1
        # all 60 blocks were stepped (or skipped) on both hosts
        assert m0["frames"] == m1["frames"] == 60 * 8, (m0, m1)
        assert procs[0].poll() is None and procs[1].poll() is None
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_multihost_three_process_serving(tmp_path):
    """First N>2 run of the real cluster (VERDICT r4 item 2): 1 ingest
    + 2 followers (6 devices), one live audio listener on EVERY host.
    The two follower listeners allocate slots in their hosts' ranges
    and their window commands flow UP the two links concurrently
    (merge_rows fan-in, the path a pod deployment hits first); every
    listener must then receive decodable audio packets served from its
    host's LOCAL channel shard, and the ingest host's /events must
    report the CLUSTER-WIDE listener count (3) via the replicated
    control block."""
    import asyncio
    import json as _json

    procs, metrics = _spawn_cluster(
        tmp_path, ports=(19061, 19062, 19063), coordinator=29661,
        link_port=28761, loop=True)
    hop = 12  # 3-proc cluster config (2*6 devices)
    try:
        for which in range(3):
            _wait_metrics(procs, metrics, lambda m: m["frames"] >= 3 * hop,
                          180, tmp_path, which=which)

        async def drive():
            import aiohttp

            async def listen(port):
                async with aiohttp.ClientSession() as s:
                    url = f"http://127.0.0.1:{port}"
                    async with s.ws_connect(url + "/audio",
                                            max_msg_size=1 << 22) as ws:
                        info = _json.loads((await ws.receive()).data)
                        m = info["fft_result_size"] // 2
                        await ws.send_str(_json.dumps(
                            {"cmd": "window", "l": m - 32, "m": m,
                             "r": m + 32}))
                        await ws.send_str(_json.dumps(
                            {"cmd": "demodulation",
                             "demodulation": "AM"}))
                        pkts = 0
                        deadline = (asyncio.get_event_loop().time()
                                    + 30)
                        while pkts < 3:
                            timeout = deadline - \
                                asyncio.get_event_loop().time()
                            assert timeout > 0, \
                                f"port {port}: {pkts} audio pkts only"
                            msg = await ws.receive(timeout=timeout)
                            if msg.type == aiohttp.WSMsgType.BINARY:
                                pkts += 1
                        # hold the slot while the others sync so the
                        # events probe sees all three listeners
                        async with s.ws_connect(
                                "http://127.0.0.1:19061/events") as ev:
                            deadline = (asyncio.get_event_loop().time()
                                        + 20)
                            while True:
                                msg = await ev.receive(
                                    timeout=deadline
                                    - asyncio.get_event_loop().time())
                                st = _json.loads(msg.data)
                                if st.get("signal_clients") == 3:
                                    break
                        # still inside the audio ws: this host must be
                        # serving ITS listener from its local shard
                        async with s.get(
                                f"http://127.0.0.1:{port}/metrics") as r:
                            st["local"] = _json.loads(await r.text())
                        return st
                return None

            return await asyncio.gather(*(listen(p) for p in
                                          (19061, 19062, 19063)))

        states = asyncio.run(drive())
        assert all(st and st["signal_clients"] == 3 for st in states), \
            states
        for st in states:  # each host served its listener locally
            assert st["local"]["audio_clients"] == 1, st["local"]
            assert st["local"]["device_errors"] == 0, st["local"]
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_multihost_one_follower_death_among_several(tmp_path):
    """SIGKILL ONE follower of two (VERDICT r4 item 2).  The jitted
    step is a collective over every process's devices, so the designed
    outcome is a LOUD whole-cluster failure, not silent degradation:
    the ingest host detects the dropped link promptly, fails the
    cluster, and closes every link -- which unblocks the SURVIVING
    follower's recv() so it surfaces the failure too; both survivors'
    serving edges stay up for an external supervisor to restart."""
    import time

    procs, metrics = _spawn_cluster(
        tmp_path, ports=(19064, 19065, 19066), coordinator=29662,
        link_port=28762, loop=True)
    hop = 12
    try:
        _wait_metrics(procs, metrics, lambda m: m["frames"] >= 3 * hop,
                      180, tmp_path)
        procs[2].kill()                   # one of two followers dies
        t_kill = time.monotonic()
        m = _wait_metrics(procs, metrics,
                          lambda m: m["device_errors"] >= 1,
                          30, tmp_path)
        assert "cluster failed" in m["last_device_error"], m
        assert time.monotonic() - t_kill < 20
        # the SURVIVING follower is unblocked and reports too
        m1 = _wait_metrics(procs, metrics,
                           lambda m: m["device_errors"] >= 1,
                           30, tmp_path, which=1)
        assert "cluster failed" in m1["last_device_error"], m1
        # both survivors stopped stepping but their edges serve on
        f0, f1 = metrics(0)["frames"], metrics(1)["frames"]
        time.sleep(2.0)
        assert metrics(0)["frames"] == f0
        assert metrics(1)["frames"] == f1
        assert procs[0].poll() is None and procs[1].poll() is None
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_multihost_dryrun_two_processes(tmp_path):
    tool = Path(__file__).resolve().parent.parent / "tools" / "multihost_dryrun.py"
    res = subprocess.run(
        [sys.executable, str(tool), "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=280,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_DRYRUN_OK" in res.stdout, res.stdout + res.stderr
    # the comparison itself printed per-host zero-error lines
    assert "max |err| = 0" in res.stdout


def test_multihost_dryrun_three_processes(tmp_path):
    """Bit-identity of the 1-ingest + 2-follower topology against the
    single-device pipeline, with BOTH followers retuning concurrently
    in the same step (multi-link table_update fan-in)."""
    tool = Path(__file__).resolve().parent.parent / "tools" / "multihost_dryrun.py"
    res = subprocess.run(
        [sys.executable, str(tool), "--out", str(tmp_path),
         "--n-proc", "3"],
        capture_output=True, text=True, timeout=380,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_DRYRUN_OK" in res.stdout, res.stdout + res.stderr
    assert res.stdout.count("max |err| = 0") == 3, res.stdout


def test_serve_links_survives_rogue_peers():
    """Cluster formation hardening: a TCP peer that connects without a
    valid hello (health check, scanner, crashed follower) must neither
    wedge the accept loop nor occupy a follower slot; a duplicate or
    out-of-range pid must not replace (and leak) a live link."""
    import socket
    import threading

    from phantomsdr_tpu.parallel.multihost import (Link, connect_link,
                                                   serve_links)

    port = 28799
    result = {}

    def _serve():
        result["links"] = serve_links(port, 1, host="127.0.0.1")

    th = threading.Thread(target=_serve, daemon=True)
    th.start()
    # rogue 1: connects and sends garbage (recv raises immediately);
    # retry until the listener thread is actually bound (startup race)
    import time as _time
    deadline = _time.monotonic() + 10
    while True:
        try:
            rogue = socket.create_connection(("127.0.0.1", port),
                                             timeout=5)
            break
        except OSError:
            if _time.monotonic() > deadline:
                raise
            _time.sleep(0.05)
    rogue.sendall(b"\x00" * 16)
    # rogue 2: valid framing, out-of-range pid
    bad = connect_link(f"127.0.0.1:{port}", pid=7)
    # the real follower
    good = connect_link(f"127.0.0.1:{port}", pid=1)
    th.join(timeout=30)
    assert not th.is_alive(), "serve_links wedged on a rogue peer"
    assert set(result["links"]) == {1}
    rogue.close()
    bad.close()
    for ln in result["links"].values():
        ln.close()


def test_opus_decim_covers_sub48k_rates():
    """opus_decim_factor must search for sub-48 kHz rates too: 32000
    decimates by 2 to a legal 16000 -- the old early return rejected a
    servable config with a wrong error."""
    from phantomsdr_tpu.config import OPUS_RATES, opus_decim_factor

    for sps, want in ((48000, 1), (12000, 1), (32000, 2), (36000, 3),
                      (40000, 5), (192000, 4)):
        assert opus_decim_factor(sps) == want, sps
        assert sps // opus_decim_factor(sps) in OPUS_RATES
    assert opus_decim_factor(44100) == 1  # genuinely unreachable
