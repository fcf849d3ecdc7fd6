"""Long-run serving soak with resource bounds (VERDICT r4 item 4).

Launches the server on the CPU backend with a looping file capture,
churns audio + waterfall clients against it for --secs (default 1 h),
and samples every --sample-secs:

  - server RSS (/proc/<pid>/status VmRSS)
  - /metrics step_ms_p50, encode queue depth/drops, device errors
  - client packet delivery + decode integrity (tools/stress.py
    machinery: every Nth client fully decodes its stream)

Pass criteria (asserted, exit nonzero on violation):
  - RSS growth after the warmup window < --rss-budget-pct per hour
    (default 5%): every unbounded-in-principle structure (per-conn
    encoder stashes, _gzip_cache, events change maps, _SendQueue)
    must actually be bounded in steady state
  - latency stays flat: final-third step_ms_p50 <= 1.5x first-third
    (post-warmup)
  - zero device errors, zero client errors, zero decode errors

Writes SOAK.json (samples + verdict).  CI runs a short smoke via
tests/test_soak.py (marker `soak` gates the full hour).

Usage:
  python tools/soak.py --secs 3600 --audio 24 --wf 8 --out SOAK.json
"""

from __future__ import annotations

import argparse
import asyncio
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def rss_kb(pid: int) -> int:
    for line in open(f"/proc/{pid}/status"):
        if line.startswith("VmRSS:"):
            return int(line.split()[1])
    return 0


async def soak(args) -> dict:
    import aiohttp

    from tools.stress import audio_client, wf_client

    out = Path(args.dir)
    port = args.port
    subprocess.run(
        [sys.executable, "tools/verify/captures.py", "--variant", "tone",
         "--out", str(out), "--port", str(port)],
        check=True, cwd=REPO, capture_output=True)
    log = open(out / "server.log", "w")
    srv = subprocess.Popen(
        [sys.executable, "-m", "phantomsdr_tpu", "-c",
         str(out / "config.toml"), "--input-file",
         str(out / "capture.s16"), "--loop", "--throttle",
         "--platform", "cpu"],
        stdout=log, stderr=log, cwd=REPO)
    url = f"http://127.0.0.1:{port}"
    stats = dict(audio_pkts=0, audio_bytes=0, wf_pkts=0, wf_bytes=0,
                 audio_errors=0, wf_errors=0, audio_closed=0,
                 wf_closed=0, retunes=0, reconnects=0, rds_frames=0,
                 rds_synced=0, decoded_audio_samples=0,
                 decoded_wf_rows=0, decode_errors=0, deflate_acks=0)
    samples = []
    stop = asyncio.Event()
    try:
        async with aiohttp.ClientSession(
                connector=aiohttp.TCPConnector(limit=0)) as s:
            deadline = time.monotonic() + 120
            while True:  # wait for serving
                try:
                    async with s.get(url + "/metrics") as r:
                        if json.loads(await r.text())["frames"] > 0:
                            break
                except Exception:
                    pass
                if time.monotonic() > deadline:
                    raise RuntimeError("server never served")
                await asyncio.sleep(1.0)
            tasks = [asyncio.create_task(audio_client(
                s, f"ws://127.0.0.1:{port}", i, stats, stop,
                churn_secs=args.churn, decode=i % 8 == 0))
                for i in range(args.audio)]
            tasks += [asyncio.create_task(wf_client(
                s, f"ws://127.0.0.1:{port}", i, stats, stop,
                deflate=i % 2 == 0, decode=i % 4 == 0))
                for i in range(args.wf)]
            t0 = time.monotonic()
            while time.monotonic() - t0 < args.secs:
                await asyncio.sleep(
                    min(args.sample_secs, args.secs / 10))
                try:
                    async with s.get(url + "/metrics") as r:
                        m = json.loads(await r.text())
                except Exception as e:
                    m = {"error": repr(e)}
                samples.append({
                    "t": round(time.monotonic() - t0, 1),
                    "rss_kb": rss_kb(srv.pid),
                    "step_ms_p50": m.get("step_ms_p50"),
                    "frames": m.get("frames"),
                    "encode_queue_depth": m.get("encode_queue_depth"),
                    "encode_dropped": m.get("encode_dropped"),
                    "device_errors": m.get("device_errors"),
                    "audio_pkts": stats["audio_pkts"],
                    "decode_errors": stats["decode_errors"],
                })
                if srv.poll() is not None:
                    raise RuntimeError("server died mid-soak")
            stop.set()
            for t in tasks:
                t.cancel()
            # drain cancellations BEFORE reading stats: per-session
            # decode-integrity finallys run during cancellation (same
            # race stress.py main() fixes)
            await asyncio.gather(*tasks, return_exceptions=True)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
        log.close()

    # ---- verdict -------------------------------------------------------
    n = len(samples)
    warm = max(1, n // 5)          # discard the first fifth as warmup
    post = samples[warm:]
    hours = max((post[-1]["t"] - post[0]["t"]) / 3600.0, 1e-6)
    rss0, rss1 = post[0]["rss_kb"], post[-1]["rss_kb"]
    rss_pct_per_h = 100.0 * (rss1 - rss0) / rss0 / hours
    lat = [p["step_ms_p50"] for p in post
           if isinstance(p.get("step_ms_p50"), (int, float))
           and p["step_ms_p50"] > 0]
    third = max(1, len(lat) // 3)
    lat_early = sum(lat[:third]) / third
    lat_late = sum(lat[-third:]) / third
    # cumulative server counters: take the max over samples so a failed
    # final /metrics fetch (None) can't mask errors accumulated earlier
    dev_errors = max((p["device_errors"] for p in samples
                      if isinstance(p.get("device_errors"), int)),
                     default=0)
    enc_dropped = max((p["encode_dropped"] for p in samples
                       if isinstance(p.get("encode_dropped"), int)),
                      default=0)
    verdict = {
        "secs": args.secs,
        "clients": {"audio": args.audio, "wf": args.wf,
                    "churn_secs": args.churn},
        "rss_kb_first_postwarmup": rss0,
        "rss_kb_final": rss1,
        "rss_pct_per_hour": round(rss_pct_per_h, 2),
        "rss_budget_pct_per_hour": args.rss_budget_pct,
        "step_ms_p50_early": round(lat_early, 2),
        "step_ms_p50_late": round(lat_late, 2),
        "lat_factor": args.lat_factor,
        "audio_pkts": stats["audio_pkts"],
        "wf_pkts": stats["wf_pkts"],
        "reconnects": stats["reconnects"],
        "decoded_audio_samples": stats["decoded_audio_samples"],
        "decoded_wf_rows": stats["decoded_wf_rows"],
        "decode_errors": stats["decode_errors"],
        "client_errors": stats["audio_errors"] + stats["wf_errors"],
        "device_errors": dev_errors,
        "encode_dropped": enc_dropped,
        "pass": (rss_pct_per_h < args.rss_budget_pct
                 and lat_late <= args.lat_factor * lat_early
                 and stats["decode_errors"] == 0
                 and stats["audio_errors"] + stats["wf_errors"] == 0
                 and dev_errors == 0),
    }
    return {"samples": samples, "verdict": verdict}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=3600)
    ap.add_argument("--sample-secs", type=float, default=30)
    ap.add_argument("--audio", type=int, default=24)
    ap.add_argument("--wf", type=int, default=8)
    ap.add_argument("--churn", type=float, default=45,
                    help="audio clients reconnect every ~N s")
    ap.add_argument("--rss-budget-pct", type=float, default=5.0)
    ap.add_argument("--lat-factor", type=float, default=1.5,
                    help="final-third step p50 must be <= factor x "
                         "first-third (looser for short smokes)")
    ap.add_argument("--port", type=int, default=19610)
    ap.add_argument("--dir", default="/tmp/phantom_soak")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = asyncio.run(soak(args))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=1))
    print(json.dumps(res["verdict"], indent=1))
    return 0 if res["verdict"]["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
