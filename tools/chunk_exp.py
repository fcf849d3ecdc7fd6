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
    ap.add_argument("--sub", action="store_true",
                    help="measure demod SUB-stages (gather / irfft / "
                         "ifft / rest) instead of chunk variants")
    ap.add_argument("--barrier", action="store_true",
                    help="measure composed demod with fusion_barriers "
                         "False vs True")
    ap.add_argument("--dcagc", action="store_true",
                    help="measure the dc+agc stage with/without a "
                         "barrier between the two and around peaks")
    ap.add_argument("--slice", action="store_true",
                    help="gather formulations: per-element index "
                         "gather (production) vs vmapped dynamic_slice "
                         "(contiguity visible to XLA)")
    ap.add_argument("--split", action="store_true",
                    help="two-DISPATCH demod: jit(gather_channel_bins) "
                         "then jit(demodulate_from_bins) vs the "
                         "composed one-jit stage (VERDICT r4 item 6: "
                         "the last ~10%% of the >1024-channel fusion "
                         "penalty)")
    ap.add_argument("--iters", type=int, default=30,
                    help="--split timing iterations")
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

        if args.split:
            # Two-dispatch split at the gather->demod seam.  Timed with
            # the async-queue method (enqueue N chained dispatches, ONE
            # device->host fetch at the end fences them all) so the
            # one-jit baseline and the two-jit chain are measured the
            # same way -- the slope method cannot hold two dispatches.
            import time as _time
            from phantomsdr_tpu.ops.channelizer import (
                gather_channel_bins, demodulate_from_bins,
            )

            j_comp = jax.jit(lambda s: demodulate_batch(
                extend_spectrum(s, cfg.is_real, r, a), table, st,
                jnp.int32(0), audio_fft_size=a, fft_result_size=r,
                base_idx=cfg.base_idx, is_real=cfg.is_real)[1])
            j_gather = jax.jit(lambda s: gather_channel_bins(
                extend_spectrum(s, cfg.is_real, r, a), table,
                audio_fft_size=a, fft_result_size=r,
                base_idx=cfg.base_idx))
            j_demod = jax.jit(lambda sb, cb, ap_: demodulate_from_bins(
                sb, cb, ap_, table, st, jnp.int32(0), audio_fft_size=a,
                is_real=cfg.is_real)[1])

            def fence(x):
                np.asarray(jax.device_get(x[0, 0, :1]))

            def run_comp():
                out = None
                for _ in range(args.iters):
                    out = j_comp(spec)
                return out

            def run_split():
                out = None
                for _ in range(args.iters):
                    sb, cb, ap_ = j_gather(spec)
                    out = j_demod(sb, cb, ap_)
                return out

            for name, fn in (("composed", run_comp), ("split", run_split)):
                fence(fn())               # compile + warm
                t0 = _time.perf_counter()
                out = fn()
                fence(out)
                ms = 1e3 * (_time.perf_counter() - t0) / args.iters
                key = f"demod_c{c}_{name}_2dispatch"
                results[key] = round(ms, 3)
                print(key, results[key], flush=True)
            continue

        if args.barrier:
            for fb in (False, True):
                def s_demod(s, fb_=fb):
                    se = extend_spectrum(s, cfg.is_real, r, a)
                    _, audio, _ = demodulate_batch(
                        se, table, st, jnp.int32(0), audio_fft_size=a,
                        fft_result_size=r, base_idx=cfg.base_idx,
                        is_real=cfg.is_real, fusion_barriers=fb_)
                    return audio

                t = slope(s_demod, lambda y: jnp.sum(y), spec, args.kbig)
                key = f"demod_c{c}_barrier{int(fb)}"
                results[key] = round(t * 1e3, 3)
                print(key, results[key], flush=True)
            continue

        if args.slice:
            # Hypothesis: demod's gathers are contiguous slices hidden
            # behind arbitrary [C, K] index matrices; a batched
            # dynamic_slice exposes the contiguity.
            k = half + 1
            start = ((table.l + cfg.base_idx) % r).astype(np.int32)
            m_rel = (table.m_idx - table.l).astype(np.int32)
            audio_r = (table.r - table.l).astype(np.int32)
            usb_rel = m_rel[:, None] + np.arange(k, dtype=np.int32)
            valid = (usb_rel >= 0) & (usb_rel < audio_r[:, None])
            offsets = start + m_rel  # [C]

            def s_gather(s):
                se = extend_spectrum(s, cfg.is_real, r, a)
                safe = jnp.clip(jnp.asarray(start)[:, None]
                                + jnp.asarray(usb_rel), 0,
                                se.shape[-1] - 1)
                vals = se[:, safe]
                return jnp.where(jnp.asarray(valid)[None], vals,
                                 jnp.zeros((), se.dtype))

            def s_slice(s):
                se = extend_spectrum(s, cfg.is_real, r, a)
                se2 = jnp.pad(se, ((0, 0), (a, 0)))
                offs = jnp.asarray(offsets + a)

                def one_row(row):
                    return jax.vmap(lambda o: jax.lax.dynamic_slice(
                        row, (o,), (k,)))(offs)

                vals = jax.vmap(one_row)(se2)          # [B, C, K]
                return jnp.where(jnp.asarray(valid)[None], vals,
                                 jnp.zeros((), se.dtype))

            for name, fn in (("idxgather", s_gather),
                             ("dynslice", s_slice)):
                t = slope(fn, lambda y: jnp.sum(jnp.real(y)), spec,
                          args.kbig)
                key = f"gather_c{c}_{name}"
                results[key] = round(t * 1e3, 3)
                print(key, results[key], flush=True)
            continue

        if args.dcagc:
            agc_params = make_agc_params(cfg.audio_sps)
            dc_delay = dc_blocker_delay(cfg.audio_sps)
            audio_blk = jax.jit(
                lambda k: jax.random.normal(k, (b, c, half)))(
                    jax.random.PRNGKey(2))
            jax.block_until_ready(audio_blk)

            def make(bar_mid):
                def s(ab):
                    def hop_body(carry, x):
                        dc_st, agc_st = carry
                        dc_st, y = dc_blocker(dc_st, x, dc_delay)
                        if bar_mid:
                            y = jax.lax.optimization_barrier(y)
                        agc_st, y = agc_process(agc_st, y, agc_params)
                        return (dc_st, agc_st), y

                    _, out = jax.lax.scan(
                        hop_body, (init_dc_state(c, dc_delay),
                                   init_agc_state(c, agc_params.window)),
                        ab)
                    return out
                return s

            for name, bar in (("plain", False), ("mid", True)):
                t = slope(make(bar), lambda y: jnp.sum(y), audio_blk,
                          args.kbig)
                key = f"dcagc_c{c}_{name}"
                results[key] = round(t * 1e3, 3)
                print(key, results[key], flush=True)

            # decomposition: dc alone / agc alone, scanned over hops
            from phantomsdr_tpu.ops.agc import _sliding_max_abs

            def s_dc(ab):
                def hop_body(dc_st, x):
                    dc_st, y = dc_blocker(dc_st, x, dc_delay)
                    return dc_st, y
                _, out = jax.lax.scan(hop_body,
                                      init_dc_state(c, dc_delay), ab)
                return out

            def s_agc(ab):
                def hop_body(agc_st, x):
                    agc_st, y = agc_process(agc_st, x, agc_params)
                    return agc_st, y
                _, out = jax.lax.scan(
                    hop_body, init_agc_state(c, agc_params.window), ab)
                return out

            def s_slidemax(ab):
                w = agc_params.window
                tail = np.zeros((c, w - 1), np.float32)
                def hop_body(carry, x):
                    y = jnp.concatenate([carry, x], axis=-1)
                    return y[..., -(w - 1):], _sliding_max_abs(
                        y, w, x.shape[-1])
                _, out = jax.lax.scan(hop_body, jnp.asarray(tail), ab)
                return out

            for name, fn in (("dconly", s_dc), ("agconly", s_agc),
                             ("slidemax", s_slidemax)):
                t = slope(fn, lambda y: jnp.sum(y), audio_blk, args.kbig)
                key = f"dcagc_c{c}_{name}"
                results[key] = round(t * 1e3, 3)
                print(key, results[key], flush=True)
            continue

        if args.sub:
            import jax.numpy as jnp2  # noqa: F401

            half_ = half
            start = (table.l + cfg.base_idx) % r
            m_rel = table.m_idx - table.l
            audio_r = table.r - table.l
            k_r = np.arange(half_ + 1, dtype=np.int32)
            usb_rel = m_rel[:, None] + k_r[None, :]
            ssb_valid = (usb_rel >= 0) & (usb_rel < audio_r[:, None])

            def s_gather(s):
                se = extend_spectrum(s, cfg.is_real, r, a)
                safe = jnp.clip(start[:, None] + usb_rel, 0,
                                se.shape[-1] - 1)
                vals = se[:, safe]
                return jnp.where(ssb_valid[None], vals,
                                 jnp.zeros((), se.dtype))

            t = slope(s_gather, lambda y: jnp.sum(jnp.real(y)), spec,
                      args.kbig)
            results[f"sub_gather_c{c}"] = round(t * 1e3, 3)
            print(f"sub_gather_c{c}", results[f"sub_gather_c{c}"],
                  flush=True)

            bins = jax.jit(lambda k: jax.lax.complex(
                jax.random.normal(k, (b, c, half_ + 1)),
                jax.random.normal(k, (b, c, half_ + 1))))(
                    jax.random.PRNGKey(5))
            binsc = jax.jit(lambda k: jax.lax.complex(
                jax.random.normal(k, (b, c, a)),
                jax.random.normal(k, (b, c, a))))(jax.random.PRNGKey(6))
            jax.block_until_ready((bins, binsc))

            t = slope(lambda x: jnp.fft.irfft(x, n=a) * a,
                      lambda y: jnp.sum(y), bins, args.kbig)
            results[f"sub_irfft_c{c}"] = round(t * 1e3, 3)
            print(f"sub_irfft_c{c}", results[f"sub_irfft_c{c}"], flush=True)

            t = slope(lambda x: jnp.fft.ifft(x) * a,
                      lambda y: jnp.sum(jnp.real(y)), binsc, args.kbig)
            results[f"sub_ifft_c{c}"] = round(t * 1e3, 3)
            print(f"sub_ifft_c{c}", results[f"sub_ifft_c{c}"], flush=True)

            # the FM discriminator's [B,C,half] -> [C,B*half] -> back
            # transpose round-trip (demodulate_batch tail)
            cplx_out = jax.jit(lambda k: jax.lax.complex(
                jax.random.normal(k, (b, c, half_)),
                jax.random.normal(k, (b, c, half_))))(
                    jax.random.PRNGKey(7))
            fm_prev = np.zeros((c,), np.complex64)
            jax.block_until_ready(cplx_out)

            def s_fm(co):
                flat = co.transpose(1, 0, 2).reshape(c, b * half_)
                prev = jnp.concatenate([fm_prev[:, None], flat[:, :-1]], 1)
                return (jnp.angle(flat * jnp.conj(prev))
                        .reshape(c, b, half_).transpose(1, 0, 2))

            t = slope(s_fm, lambda y: jnp.sum(y), cplx_out, args.kbig)
            results[f"sub_fmdisc_c{c}"] = round(t * 1e3, 3)
            print(f"sub_fmdisc_c{c}", results[f"sub_fmdisc_c{c}"],
                  flush=True)

            # overlap-add + envelope block
            wave = jax.jit(lambda k: jax.lax.complex(
                jax.random.normal(k, (b, c, a)),
                jax.random.normal(k, (b, c, a))))(jax.random.PRNGKey(8))
            prev0 = np.zeros((c, half_), np.complex64)
            jax.block_until_ready(wave)

            def s_ola(w):
                out = w[:, :, :half_] + jnp.concatenate(
                    [prev0[None], w[:-1, :, half_:]])
                return jnp.sqrt(jnp.real(out) ** 2 + jnp.imag(out) ** 2)

            t = slope(s_ola, lambda y: jnp.sum(y), wave, args.kbig)
            results[f"sub_ola_env_c{c}"] = round(t * 1e3, 3)
            print(f"sub_ola_env_c{c}", results[f"sub_ola_env_c{c}"],
                  flush=True)
            continue

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
