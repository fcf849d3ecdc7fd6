"""Serving stress: N audio + M waterfall websocket clients against a
running server; reports packet rates and server metrics.

Usage:
  python tools/stress.py --url ws://127.0.0.1:19002 --audio 50 --wf 50 --secs 20

Mixed-codec load (VERDICT r4 item 3): the audio codec follows the
server's config (flac or opus, like the reference's server-wide
[input] audio_compression, spectrumserver.cpp:163-170), and the
waterfall codec is zstd/av1 per the server config plus the per-conn
deflate extension -- `--wf-deflate-frac 0.5` makes half the waterfall
clients opt into deflate on a zstd server, loading BOTH codec paths on
one encode pool.  `--decode-every N` makes every Nth client of each
kind fully DECODE its stream (flac via the from-spec decoder, opus via
libopus, zstd/deflate/av1 rows via the same decoders the verify client
uses) and report integrity: decoded samples/rows and decode_errors.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from pathlib import Path

import aiohttp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _decode_flac_count(chunks):
    """Decode one audio session's FLAC stream with the from-spec
    decoder (runs in an executor: it is pure Python and slow).
    Returns (samples, errors)."""
    from tests.test_codecs import decode_flac

    try:
        _, samples = decode_flac(b"".join(chunks))
        return int(samples.size), 0
    except Exception:
        return 0, 1


async def audio_client(session, url, idx, stats, stop, churn_secs=0.0,
                       rds=False, same_window=False, decode=False):
    """One audio listener; churn_secs > 0 makes it live-cycle: connect,
    listen, retune mid-life, disconnect, reconnect -- exercising slot
    reuse, one-shot resets, AGC resets and the events stream under load.
    rds=True opts every client into server-side RDS (FM mode, shared
    default window so all listeners sit on the modulated carrier) and
    counts the {"type":"rds"} text frames."""
    import random

    rng = random.Random(idx)
    loop = asyncio.get_event_loop()
    cbor_decode = None
    if decode:  # hoisted out of the per-packet hot loop
        from tools.verify.client import cbor_decode
    while not stop.is_set():
        chunks = None
        opus_dec = None
        try:
            async with session.ws_connect(url + "/audio",
                                          max_msg_size=1 << 22) as ws:
                info = json.loads((await ws.receive()).data)
                if decode:
                    comp = info.get("audio_compression", "flac")
                    if comp == "opus":
                        from phantomsdr_tpu.runtime.codecs import (
                            OpusChunkDecoder,
                        )

                        opus_dec = OpusChunkDecoder(
                            48000, info.get("audio_channels", 1))
                    else:
                        chunks = []
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
                        if decode:
                            try:
                                d = bytes(cbor_decode(msg.data)["data"])
                                if opus_dec is not None:
                                    if d:
                                        stats["decoded_audio_samples"] += \
                                            int(opus_dec.decode(d).size)
                                elif chunks is not None:
                                    chunks.append(d)
                            except Exception:
                                stats["decode_errors"] += 1
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
        finally:
            # decode integrity of this session's stream (FLAC can only
            # be decoded from the stream start, so per session)
            if chunks:
                try:
                    n, e = await loop.run_in_executor(
                        None, _decode_flac_count, chunks)
                except asyncio.CancelledError:
                    # end-of-run task cancellation: still verify the
                    # stream (no-churn sessions only ever end here)
                    n, e = _decode_flac_count(chunks)
                stats["decoded_audio_samples"] += n
                stats["decode_errors"] += e
            if opus_dec is not None:
                opus_dec.close()


async def wf_client(session, url, idx, stats, stop, deflate=False,
                    decode=False):
    """One waterfall listener.  deflate=True opts the connection into
    the per-conn raw-deflate extension ({"cmd":"compression"}) -- mixing
    zstd and deflate encoders on the same server/encode pool.
    decode=True fully decodes the stream (zstd / deflate / av1) and
    counts rows; any codec error counts as decode_errors."""
    av1_dec = None
    try:
        async with session.ws_connect(url + "/waterfall", max_msg_size=1 << 22) as ws:
            info = json.loads((await ws.receive()).data)
            rsize = info["fft_result_size"]
            codec = info.get("waterfall_compression", "zstd")
            span = rsize >> (idx % 3)
            l = (idx * 977) % max(rsize - span, 1)
            await ws.send_str(json.dumps({"cmd": "window", "l": l, "r": l + span}))
            if deflate and codec == "zstd":
                await ws.send_str(json.dumps(
                    {"cmd": "compression", "waterfall": "deflate"}))
            dfl = None  # becomes the per-conn deflate stream on ack
            dec = cbor_decode = None
            if decode:
                from tools.verify.client import cbor_decode
                if codec == "av1":
                    from phantomsdr_tpu.runtime.av1 import AV1Decoder

                    av1_dec = AV1Decoder()
                else:
                    import zstandard

                    dec = zstandard.ZstdDecompressor().decompressobj()
            while not stop.is_set():
                try:
                    msg = await ws.receive(timeout=5)
                except asyncio.TimeoutError:
                    continue
                if msg.type == aiohttp.WSMsgType.BINARY:
                    stats["wf_pkts"] += 1
                    stats["wf_bytes"] += len(msg.data)
                    if not decode:
                        continue
                    try:
                        if av1_dec is not None:
                            for frame in av1_dec.decode(msg.data):
                                stats["decoded_wf_rows"] += \
                                    int(frame.shape[0])
                        elif dfl is not None:
                            cbor_decode(dfl.decompress(msg.data))
                            stats["decoded_wf_rows"] += 1
                        else:
                            cbor_decode(dec.decompress(msg.data))
                            stats["decoded_wf_rows"] += 1
                    except Exception:
                        stats["decode_errors"] += 1
                elif msg.type == aiohttp.WSMsgType.TEXT:
                    d = json.loads(msg.data)
                    if d.get("type") == "compression" \
                            and d.get("waterfall") == "deflate":
                        # ack: ONE fresh deflate stream starts now
                        if decode:
                            import zlib

                            dfl = zlib.decompressobj(-15)
                        stats["deflate_acks"] += 1
                elif msg.type in (aiohttp.WSMsgType.CLOSE,
                                  aiohttp.WSMsgType.CLOSED,
                                  aiohttp.WSMsgType.ERROR):
                    stats["wf_closed"] += 1
                    return
    except Exception:
        stats["wf_errors"] += 1
    finally:
        if av1_dec is not None:
            av1_dec.close()


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
    ap.add_argument("--wf-deflate-frac", type=float, default=0.0,
                    help="fraction of waterfall clients opting into the "
                         "per-conn deflate extension (zstd server only): "
                         "mixes both wf codecs on one encode pool")
    ap.add_argument("--decode-every", type=int, default=0,
                    help="every Nth client of each kind fully decodes "
                         "its stream (integrity under load); 0 = off")
    args = ap.parse_args()

    stats = dict(audio_pkts=0, audio_bytes=0, wf_pkts=0, wf_bytes=0,
                 audio_errors=0, wf_errors=0, audio_closed=0, wf_closed=0,
                 retunes=0, reconnects=0, rds_frames=0, rds_synced=0,
                 decoded_audio_samples=0, decoded_wf_rows=0,
                 decode_errors=0, deflate_acks=0)
    stop = asyncio.Event()
    de = args.decode_every
    async with aiohttp.ClientSession(
            connector=aiohttp.TCPConnector(limit=0)) as session:
        tasks = [asyncio.create_task(audio_client(
            session, args.url, i, stats, stop, args.churn,
            rds=args.rds, same_window=args.rds,
            decode=bool(de) and i % de == 0))
                 for i in range(args.audio)]
        tasks += [asyncio.create_task(wf_client(
            session, args.url, i, stats, stop,
            deflate=args.wf_deflate_frac > 0
            and i < args.wf * args.wf_deflate_frac,
            decode=bool(de) and i % de == 0))
                  for i in range(args.wf)]
        t0 = time.monotonic()
        await asyncio.sleep(args.secs)
        stop.set()
        dt = time.monotonic() - t0
        for t in tasks:
            t.cancel()
        # drain the cancellations BEFORE reading stats: the per-session
        # decode-integrity finallys run during cancellation, and without
        # this await they race process exit (decoded counts read as 0)
        await asyncio.gather(*tasks, return_exceptions=True)
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
        "decoded_audio_samples": stats["decoded_audio_samples"],
        "decoded_wf_rows": stats["decoded_wf_rows"],
        "decode_errors": stats["decode_errors"],
        "deflate_acks": stats["deflate_acks"],
        "server_metrics": metrics,
    }, indent=1))


if __name__ == "__main__":
    asyncio.run(main())
