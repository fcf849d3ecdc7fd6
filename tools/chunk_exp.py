"""One-off: locate the 1024->2048-channel super-linearity knee in the
demod/AGC stages (PERF.md round-4 scaling table) and test whether
chunking the channel axis (lax.map over <=K-channel chunks, smaller
live intermediates) recovers linear scaling.

    python tools/chunk_exp.py [--platform cpu] [--kbig 128]

Uses profile.py's fori_loop slope method (relay-RTT-immune).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile import slope  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kbig", type=int, default=128)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--channels", type=int, nargs="*",
                    default=[1024, 1536, 2048])
    ap.add_argument("--chunks", type=int, nargs="*", default=[0, 1024, 512],
                    help="0 = unchunked")
    ap.add_argument("--out", default="/tmp/chunk_exp.json")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from phantomsdr_tpu.config import config_from_dict
    from phantomsdr_tpu.ops.channelizer import (
        demodulate_batch, extend_spectrum, ChannelTable, ChannelState,
    )
    from phantomsdr_tpu.ops.agc import (
        dc_blocker, agc_process, make_agc_params, dc_blocker_delay,
        init_dc_state, init_agc_state,
    )

    results = {}
    for c in args.channels:
        cfg = config_from_dict({
            "input": {
                "sps": 35_000_000, "frequency": 100_000_000,
                "fft_size": 1 << 20, "signal": "iq", "audio_sps": 12000,
                "waterfall_size": 1024, "driver": {"format": "u8"},
            },
            "tpu": {"hop_batch": 18, "max_channels": c},
        })
        b = cfg.hop_batch
        r, a = cfg.fft_result_size, cfg.audio_max_fft_size
        half = a // 2
        spec = jax.jit(lambda k: jax.lax.complex(
            jax.random.normal(k, (b, r)), jax.random.normal(k, (b, r)))
            )(jax.random.PRNGKey(1)) * 1e-3
        jax.block_until_ready(spec)

        l = np.linspace(1000, r - 2000, c).astype(np.int32)
        width = np.full(c, min(a, 300), np.int32)
        table = ChannelTable(l=l, r=(l + width).astype(np.int32),
                             m_idx=(l + width // 2).astype(np.int32),
                             mode=(np.arange(c) % 4).astype(np.int32),
                             active=np.ones(c, bool))
        st = ChannelState(
            ssb_prev=np.zeros((c, half), np.float32),
            cplx_prev=np.zeros((c, half), np.complex64),
            fm_prev=np.zeros((c,), np.complex64),
            carrier_prev=np.zeros((c, half), np.complex64),
            pll_phase=np.zeros((c,), np.float32),
            pll_freq=np.zeros((c,), np.float32),
        )

        def tbl_slice(i0, n):
            return (ChannelTable(*[None if x is None else x[i0:i0 + n]
                                   for x in table]),
                    ChannelState(*[x[i0:i0 + n] for x in st]))

        for chunk in args.chunks:
            if chunk and chunk >= c:
                continue

            if not chunk:
                def s_demod(s, tb=table, cs=st):
                    se = extend_spectrum(s, cfg.is_real, r, a)
                    _, audio, _ = demodulate_batch(
                        se, tb, cs, jnp.int32(0), audio_fft_size=a,
                        fft_result_size=r, base_idx=cfg.base_idx,
                        is_real=cfg.is_real)
                    return audio
            else:
                n_chunks = c // chunk
                tbs = [tbl_slice(i * chunk, chunk) for i in range(n_chunks)]
                # stack chunked tables -> lax.map over the chunk axis
                tb_stack = ChannelTable(
                    *[None if getattr(tbs[0][0], f) is None
                      else np.stack([getattr(t[0], f) for t in tbs])
                      for f in ChannelTable._fields])
                st_stack = ChannelState(*[np.stack([getattr(t[1], f)
                                                    for t in tbs])
                                          for f in ChannelState._fields])

                def s_demod(s, tbs_=tb_stack, sts_=st_stack):
                    se = extend_spectrum(s, cfg.is_real, r, a)

                    def one(args_):
                        tb, cs = args_
                        _, audio, _ = demodulate_batch(
                            se, tb, cs, jnp.int32(0), audio_fft_size=a,
                            fft_result_size=r, base_idx=cfg.base_idx,
                            is_real=cfg.is_real)
                        return audio

                    out = jax.lax.map(one, (tbs_, sts_))  # [n, B, ck, A/2]
                    return jnp.moveaxis(out, 0, 1).reshape(
                        b, c, half)

                s_demod.__name__ = f"s_demod_chunk{chunk}"

            t = slope(s_demod, lambda y: jnp.sum(y), spec, args.kbig)
            key = f"demod_c{c}_chunk{chunk}"
            results[key] = round(t * 1e3, 3)
            print(key, results[key], flush=True)

        # dc/agc: unchunked vs chunked
        agc_params = make_agc_params(cfg.audio_sps)
        dc_delay = dc_blocker_delay(cfg.audio_sps)
        audio_blk = jax.jit(lambda k: jax.random.normal(k, (b, c, half)))(
            jax.random.PRNGKey(2))
        jax.block_until_ready(audio_blk)

        def dcagc_one(ab, nch):
            def hop_body(carry, x):
                dc_st, agc_st = carry
                dc_st, y = dc_blocker(dc_st, x, dc_delay)
                agc_st, y = agc_process(agc_st, y, agc_params)
                return (dc_st, agc_st), y

            _, out = jax.lax.scan(
                hop_body, (init_dc_state(nch, dc_delay),
                           init_agc_state(nch, agc_params.window)), ab)
            return out

        for chunk in args.chunks:
            if chunk and chunk >= c:
                continue
            if not chunk:
                fn = lambda ab: dcagc_one(ab, c)  # noqa: E731
            else:
                n_chunks = c // chunk

                def fn(ab, ck=chunk, n=n_chunks):
                    abs_ = jnp.moveaxis(
                        ab.reshape(b, n, ck, half), 1, 0)  # [n, B, ck, half]
                    out = jax.lax.map(lambda z: dcagc_one(z, ck), abs_)
                    return jnp.moveaxis(out, 0, 1).reshape(b, c, half)

            t = slope(fn, lambda y: jnp.sum(y), audio_blk, args.kbig)
            key = f"dcagc_c{c}_chunk{chunk}"
            results[key] = round(t * 1e3, 3)
            print(key, results[key], flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
