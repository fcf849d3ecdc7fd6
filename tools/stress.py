"""Serving stress: N audio + M waterfall websocket clients against a
running server; reports packet rates and server metrics.

Usage:
  python tools/stress.py --url ws://127.0.0.1:19002 --audio 50 --wf 50 --secs 20
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp


async def audio_client(session, url, idx, stats, stop, churn_secs=0.0,
                       rds=False, same_window=False):
    """One audio listener; churn_secs > 0 makes it live-cycle: connect,
    listen, retune mid-life, disconnect, reconnect -- exercising slot
    reuse, one-shot resets, AGC resets and the events stream under load.
    rds=True opts every client into server-side RDS (FM mode, shared
    default window so all listeners sit on the modulated carrier) and
    counts the {"type":"rds"} text frames."""
    import random

    rng = random.Random(idx)
    while not stop.is_set():
        try:
            async with session.ws_connect(url + "/audio",
                                          max_msg_size=1 << 22) as ws:
                info = json.loads((await ws.receive()).data)
                rsize = info["fft_result_size"]
                a = info["audio_max_fft"]
                l = (idx * 131) % max(rsize - a - 1, 1)
                width = min(a, 300)
                if same_window:
                    l, width = (rsize - a) // 2, a
                await ws.send_str(json.dumps({
                    "cmd": "window", "l": l, "m": l + width / 2,
                    "r": l + width}))
                await ws.send_str(json.dumps({
                    "cmd": "demodulation",
                    "demodulation": "FM" if rds else
                    ["USB", "LSB", "AM", "FM"][idx % 4]}))
                if rds:
                    await ws.send_str(json.dumps({"cmd": "rds",
                                                  "enabled": True}))
                deadline = (time.monotonic()
                            + rng.uniform(0.5, 2.0) * churn_secs
                            if churn_secs else None)
                while not stop.is_set():
                    if deadline and time.monotonic() > deadline:
                        break  # disconnect + reconnect (churn)
                    try:
                        msg = await ws.receive(timeout=1)
                    except asyncio.TimeoutError:
                        if churn_secs and rng.random() < 0.3:
                            l2 = rng.randrange(max(rsize - a - 1, 1))
                            await ws.send_str(json.dumps({
                                "cmd": "window", "l": l2,
                                "m": l2 + width / 2, "r": l2 + width}))
                            stats["retunes"] += 1
                        continue  # server may still be compiling
                    if msg.type == aiohttp.WSMsgType.BINARY:
                        stats["audio_pkts"] += 1
                        stats["audio_bytes"] += len(msg.data)
                    elif msg.type == aiohttp.WSMsgType.TEXT:
                        d = json.loads(msg.data)
                        if d.get("type") == "rds":
                            stats["rds_frames"] += 1
                            if d.get("synced"):
                                stats["rds_synced"] += 1
                    elif msg.type in (aiohttp.WSMsgType.CLOSE,
                                      aiohttp.WSMsgType.CLOSED,
                                      aiohttp.WSMsgType.ERROR):
                        stats["audio_closed"] += 1
                        return
            if not churn_secs:
                return
            stats["reconnects"] += 1
        except Exception:
            stats["audio_errors"] += 1
            if not churn_secs:
                return
            await asyncio.sleep(0.5)


async def wf_client(session, url, idx, stats, stop):
    try:
        async with session.ws_connect(url + "/waterfall", max_msg_size=1 << 22) as ws:
            info = json.loads((await ws.receive()).data)
            rsize = info["fft_result_size"]
            span = rsize >> (idx % 3)
            l = (idx * 977) % max(rsize - span, 1)
            await ws.send_str(json.dumps({"cmd": "window", "l": l, "r": l + span}))
            while not stop.is_set():
                try:
                    msg = await ws.receive(timeout=5)
                except asyncio.TimeoutError:
                    continue
                if msg.type == aiohttp.WSMsgType.BINARY:
                    stats["wf_pkts"] += 1
                    stats["wf_bytes"] += len(msg.data)
                elif msg.type in (aiohttp.WSMsgType.CLOSE,
                                  aiohttp.WSMsgType.CLOSED,
                                  aiohttp.WSMsgType.ERROR):
                    stats["wf_closed"] += 1
                    return
    except Exception:
        stats["wf_errors"] += 1


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="ws://127.0.0.1:19002")
    ap.add_argument("--audio", type=int, default=50)
    ap.add_argument("--wf", type=int, default=50)
    ap.add_argument("--secs", type=float, default=20)
    ap.add_argument("--churn", type=float, default=0.0,
                    help="audio clients reconnect every ~N s and retune "
                         "randomly (slot-reuse/reset/AGC churn)")
    ap.add_argument("--rds", action="store_true",
                    help="every audio client tunes FM on the default "
                         "window and opts into server-side RDS")
    args = ap.parse_args()

    stats = dict(audio_pkts=0, audio_bytes=0, wf_pkts=0, wf_bytes=0,
                 audio_errors=0, wf_errors=0, audio_closed=0, wf_closed=0,
                 retunes=0, reconnects=0, rds_frames=0, rds_synced=0)
    stop = asyncio.Event()
    async with aiohttp.ClientSession(
            connector=aiohttp.TCPConnector(limit=0)) as session:
        tasks = [asyncio.create_task(audio_client(
            session, args.url, i, stats, stop, args.churn,
            rds=args.rds, same_window=args.rds))
                 for i in range(args.audio)]
        tasks += [asyncio.create_task(wf_client(session, args.url, i, stats, stop))
                  for i in range(args.wf)]
        t0 = time.monotonic()
        await asyncio.sleep(args.secs)
        stop.set()
        dt = time.monotonic() - t0
        for t in tasks:
            t.cancel()
        http_url = args.url.replace("ws://", "http://")
        try:
            async with session.get(http_url + "/metrics") as resp:
                metrics = await resp.json()
        except Exception:
            metrics = {}
    print(json.dumps({
        "secs": round(dt, 1),
        "audio_pkts_per_s": round(stats["audio_pkts"] / dt, 1),
        "audio_MBps": round(stats["audio_bytes"] / dt / 1e6, 2),
        "wf_pkts_per_s": round(stats["wf_pkts"] / dt, 1),
        "wf_MBps": round(stats["wf_bytes"] / dt / 1e6, 2),
        "errors": stats["audio_errors"] + stats["wf_errors"],
        "rds_frames": stats["rds_frames"],
        "rds_synced": stats["rds_synced"],
        "retunes": stats["retunes"],
        "reconnects": stats["reconnects"],
        "closed": stats["audio_closed"] + stats["wf_closed"],
        "server_metrics": metrics,
    }, indent=1))


if __name__ == "__main__":
    asyncio.run(main())
