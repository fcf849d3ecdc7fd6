"""N-process CPU-cluster dryrun of the multi-host runtime.

Proves, without a TPU pod, that the multi-host path is real code end to
end (VERDICT round 1, item 2; N>2 topologies VERDICT round 4, item 2):

- `jax.distributed` bootstrap, N processes x 2 virtual CPU devices
  -> one 2N-device mesh (collectives cross process boundaries via gloo),
- the ingest host (process 0) reads the sample stream and ships each
  follower ONLY its time-shard raw rows over a real TCP link (the DCN
  path), plus the replicated control block (channel table, views, due
  layout, frame counter),
- EVERY follower retunes one of its own slots concurrently, and all the
  retunes flow BACK over the links (table_update) into the global table
  for a later step -- the N>2 case exercises the multi-link fan-in,
- each host runs the same jitted sharded step and extracts the audio of
  ITS channel slots from local device memory only,
- the concatenated per-host audio is compared against the single-device
  HopPipeline on the identical stream: must match within 1 LSB, and the
  replicated waterfall rows must be identical on every host.

Run:  python tools/multihost_dryrun.py             (orchestrates 2 procs)
      python tools/multihost_dryrun.py --n-proc 3  (1 ingest + 2 followers)
      python tools/multihost_dryrun.py --pid N ... (one cluster process)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEV_PER_PROC = 2
COORD_PORT = 29610
LINK_PORT = 28710
STEPS = 4
RETUNE_STEP = 2  # followers retune their slot before this step


def make_cfg(nprocs: int):
    from phantomsdr_tpu.config import config_from_dict

    n = nprocs * DEV_PER_PROC
    return config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 2000, "waterfall_size": 256,
            "driver": {"format": "s16"},
        },
        # divisibility over the mesh (sharded.py): keep the historical
        # 2-proc shape (8/4) and scale it for wider clusters
        "tpu": {"hop_batch": 2 * n, "max_channels": n},
    })


def make_stream(cfg):
    rng = np.random.default_rng(11)
    wph = cfg.hop_size * 2
    return rng.integers(-20000, 20000, size=wph * cfg.hop_batch * STEPS,
                        dtype=np.int16)


def base_table(cfg):
    c = cfg.max_channels
    l = np.linspace(10, cfg.fft_result_size - 200, c).astype(np.int32)
    return [l, l + 64, l + 32, np.arange(c, dtype=np.int32) % 4,
            np.ones(c, bool), np.zeros(c, bool),
            np.zeros(c, bool),
            np.zeros(c, bool)]  # active, nr, rds, am_env


def retuned_row(pid: int):
    """Follower `pid`'s retune of its first own slot (applied before
    RETUNE_STEP).  Each follower owns DEV_PER_PROC slots starting at
    pid*DEV_PER_PROC (cpd=1 in this config), so slot choices never
    collide -- the ingest host must merge ALL of them."""
    slot = pid * DEV_PER_PROC
    return {"slot": slot, "l": 400 + 20 * pid, "r": 500 + 20 * pid,
            "m_idx": 450 + 20 * pid, "mode": (pid + 1) % 4}


def views_for(cfg):
    from phantomsdr_tpu.ops.quantize import pyramid_level_offsets

    offs = pyramid_level_offsets(cfg.fft_result_size, cfg.downsample_levels)
    start = np.asarray([offs[0] + 64, offs[1] + 16], np.int32)
    length = np.asarray([200, 100], np.int32)
    meta = (np.asarray([64, 16], np.int32), np.asarray([264, 116], np.int32),
            np.asarray([0, 1], np.int32))
    return start, length, meta


def cluster_main(pid: int, outdir: str, nprocs: int):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from phantomsdr_tpu.parallel.multihost import (
        bootstrap, serve_links, connect_link, pack_control, unpack_control,
        MultihostRuntime,
    )

    bootstrap(f"127.0.0.1:{COORD_PORT}", nprocs, pid,
              cpu_devices=DEV_PER_PROC)
    cfg = make_cfg(nprocs)
    rt = MultihostRuntime(cfg)
    import jax.numpy as jnp

    views_start, views_length, wf_meta = views_for(cfg)
    from phantomsdr_tpu.pipeline import WaterfallViews

    views_dev = WaterfallViews(start=jnp.asarray(views_start),
                               length=jnp.asarray(views_length))
    state = rt.sp.init_state()
    audio_out, wf_out = [], []

    if pid == 0:
        stream = make_stream(cfg)
        wph = cfg.hop_size * 2
        blk_w = cfg.hop_batch * wph
        table = base_table(cfg)
        links = serve_links(LINK_PORT, nprocs - 1, host="127.0.0.1")
        for s in range(STEPS):
            # lockstep: wait for EVERY follower's previous step-done
            # ack, applying any table updates each pushed first (a
            # follower retune is sent BEFORE its step_done, so TCP
            # ordering makes the per-link merge deterministic; links
            # are drained one by one, exercising the N-link fan-in)
            if s > 0:
                for follower in links.values():
                    while True:
                        hdr, _ = follower.recv()
                        if hdr.get("type") == "table_update":
                            u = hdr["row"]
                            table[0][u["slot"]] = u["l"]
                            table[1][u["slot"]] = u["r"]
                            table[2][u["slot"]] = u["m_idx"]
                            table[3][u["slot"]] = u["mode"]
                        elif hdr.get("type") == "step_done":
                            assert hdr["seq"] == s - 1
                            break

            frame0 = s * cfg.hop_batch
            idx, counts = rt.sp.due_layout(frame0)
            due = [i * rt.sp.hops_per_shard + int(idx[i, j])
                   for i in range(rt.n) for j in range(counts[i])]
            block = stream[s * blk_w:(s + 1) * blk_w]
            rows = rt.sp.shard_raw(block)
            mids = table[2].astype(np.float64)  # metadata only
            meta, cblob = pack_control(table, mids,
                                       (views_start, views_length),
                                       wf_meta, None)
            for fpid, link in links.items():
                their = [i for i in range(rt.n)
                         if i // DEV_PER_PROC == fpid]
                rbytes = rows[their].tobytes()
                link.send({"seq": s, "frame0": frame0, "due": due,
                           "idx": idx.tolist(), "counts": counts,
                           "control": meta, "nrows": len(their)},
                          cblob + rbytes)
            my_rows = rows[rt.local_shards]
            state, out = run_step(rt, state, my_rows, table, views_dev,
                                  idx, due, cfg)
            audio_out.append(rt.local_audio(out))
            wf_out.append(rt.local_wf(out))
        # drain the FINAL step's acks before exiting: unread data in the
        # receive buffer would make process exit RST the links, and a
        # follower whose last step_done send races that RST dies with
        # EPIPE (a load-dependent flake seen in CI)
        for follower in links.values():
            while True:
                hdr, _ = follower.recv()
                if (hdr.get("type") == "step_done"
                        and hdr["seq"] == STEPS - 1):
                    break
    else:
        link = connect_link(f"127.0.0.1:{LINK_PORT}", pid)
        for s in range(STEPS):
            hdr, blob = link.recv()
            assert hdr["seq"] == s
            rows_bytes = hdr["nrows"] * rt.sp.raw_shard_len * 2
            table_arrays, _mids, views_np, wfm, reset = unpack_control(
                hdr["control"], blob[: len(blob) - rows_bytes])
            rows = np.frombuffer(blob[len(blob) - rows_bytes:],
                                 np.int16).reshape(hdr["nrows"],
                                                   rt.sp.raw_shard_len)
            idx = np.asarray(hdr["idx"], np.int32)
            state, out = run_step(rt, state, rows, list(table_arrays),
                                  views_dev, idx, hdr["due"], cfg)
            audio_out.append(rt.local_audio(out))
            wf_out.append(rt.local_wf(out))
            # a follower-side retune rides upstream BEFORE step_done so
            # the ingest host's next control block includes it; every
            # follower retunes concurrently in the same step
            if s + 1 == RETUNE_STEP:
                link.send({"type": "table_update", "row": retuned_row(pid)})
            link.send({"type": "step_done", "seq": s})

    np.save(f"{outdir}/audio_pid{pid}.npy",
            np.concatenate([a[None] for a in audio_out]))
    wfs = [w for w in wf_out if w is not None]
    np.save(f"{outdir}/wf_pid{pid}.npy",
            np.stack(wfs) if wfs else np.zeros((0,), np.int8))
    # chan range marker for the orchestrator
    with open(f"{outdir}/range_pid{pid}.json", "w") as f:
        json.dump({"offset": rt.chan_offset, "count": rt.chan_count,
                   "due_caps": rt.sp.due_cap_local}, f)
    print(f"pid {pid} done: chans [{rt.chan_offset},"
          f"{rt.chan_offset + rt.chan_count})", flush=True)


def run_step(rt, state, my_rows, table, views_dev, idx, due, cfg):
    import jax.numpy as jnp
    from phantomsdr_tpu.pipeline import channels_from_numpy

    raw = rt.global_raw(my_rows)
    tbl = channels_from_numpy(*table)
    mode = "views" if due else "off"
    return rt.sp.step(state, raw, tbl, views_dev, mode,
                      due_idx=jnp.asarray(idx))


def orchestrate(outdir: str, nprocs: int):
    """Spawn the N-process cluster, then check against single-device."""
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--pid", str(pid),
             "--out", outdir, "--n-proc", str(nprocs)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fail = False
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        sys.stdout.write(out.decode())
        if p.returncode != 0:
            fail = True
    if fail:
        print("MULTIHOST_DRYRUN_FAIL: cluster process error")
        sys.exit(1)

    # ---- single-device reference on the identical stream ----
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from phantomsdr_tpu.pipeline import (
        HopPipeline, WaterfallViews, channels_from_numpy,
    )

    cfg = make_cfg(nprocs)
    stream = make_stream(cfg)
    table = base_table(cfg)
    views_start, views_length, _ = views_for(cfg)
    pipe = HopPipeline(cfg)
    wph = cfg.hop_size * 2
    blk_w = cfg.hop_batch * wph
    halo = np.zeros(wph, np.int16)
    st = pipe.init_state()
    ref_audio = []
    for s in range(STEPS):
        if s == RETUNE_STEP:
            for fpid in range(1, nprocs):
                u = retuned_row(fpid)
                table[0][u["slot"]] = u["l"]
                table[1][u["slot"]] = u["r"]
                table[2][u["slot"]] = u["m_idx"]
                table[3][u["slot"]] = u["mode"]
        blk = stream[s * blk_w:(s + 1) * blk_w]
        st, o = pipe.step(st, jnp.asarray(np.concatenate([halo, blk])),
                          channels_from_numpy(*table), waterfall="off")
        halo = blk[-wph:]
        ref_audio.append(np.asarray(o.audio))
    ref = np.concatenate([a[None] for a in ref_audio])  # [S, B, C, half]

    # ---- compare each host's channel range ----
    max_err = 0
    for pid in range(nprocs):
        rng_info = json.load(open(f"{outdir}/range_pid{pid}.json"))
        got = np.load(f"{outdir}/audio_pid{pid}.npy")  # [S, B, C_loc, half]
        o, c = rng_info["offset"], rng_info["count"]
        want = ref[:, :, o:o + c]
        err = np.abs(got.astype(int) - want.astype(int)).max()
        max_err = max(max_err, err)
        print(f"pid {pid}: channels [{o},{o + c}) max |err| = {err}")
    # every host must also hold identical replicated waterfall rows
    wf0 = np.load(f"{outdir}/wf_pid0.npy")
    wf_equal = all(
        (w := np.load(f"{outdir}/wf_pid{pid}.npy")).shape == wf0.shape
        and np.array_equal(w, wf0) for pid in range(1, nprocs))
    print(f"waterfall replicas equal: {wf_equal} (shape {wf0.shape})")
    if max_err <= 1 and wf_equal:
        print("MULTIHOST_DRYRUN_OK")
    else:
        print("MULTIHOST_DRYRUN_FAIL")
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--out", default="/tmp/phantomsdr_multihost")
    ap.add_argument("--n-proc", type=int, default=2,
                    help="cluster processes (1 ingest + n-1 followers)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.pid is None:
        orchestrate(args.out, args.n_proc)
    else:
        cluster_main(args.pid, args.out, args.n_proc)


if __name__ == "__main__":
    main()
