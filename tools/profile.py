"""Per-stage device-time profiler for the hop pipeline (SURVEY.md
section 5: per-stage device time as a first-class metric; VERDICT
round 1, item 3: PERF.md's stage table must be reproducible by one
command).

Methodology: the dev-environment relay adds ~100 ms RTT per dispatch,
which would swamp sub-millisecond stage times.  Each stage is therefore
wrapped in an on-device ``lax.fori_loop`` that re-runs it K times with a
forced serial data dependency (the output folds into the carry through a
denormal-scale perturbation XLA cannot elide), and the device time per
iteration is the SLOPE between a K=1 and a K=KBIG run:

    stage_time = (t[KBIG] - t[1]) / (KBIG - 1)

which cancels dispatch/RTT exactly.  The end-to-end step is additionally
measured the normal way (state-chained steps, one packed fetch each).

Usage:
    python tools/profile.py [--fft-log2 20] [--hops 18] [--channels 128]
                            [--out PROFILE.json] [--platform cpu]
Writes one JSON artifact and prints it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args):
    """Wall time of fn incl. a REAL device sync: on the axon remote
    backend block_until_ready returns before the device finishes, so the
    only reliable fence is a (tiny) device->host fetch.  The fetch costs
    one relay RTT -- identical for K=1 and K=kbig, so it cancels in the
    slope."""
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    out = fn(*args)
    leaf = out if hasattr(out, "ravel") else \
        [x for x in jax.tree_util.tree_leaves(out)
         if hasattr(x, "ravel")][0]
    # real-valued scalar: complex device->host transfers fail on axon
    _ = np.asarray(jnp.real(jnp.ravel(leaf)[:1]).astype(jnp.float32))
    return time.monotonic() - t0


def loop_stage(fn, reduce_fn, x, k):
    """Build a jitted K-iteration serial loop of fn starting from x."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(i, c):
        y = fn(c)
        # forced serial dependency; 1e-38 keeps the value numerically
        # intact while defeating loop-invariant code motion
        return c + (reduce_fn(y) * 1e-38).astype(c.dtype)

    return jax.jit(lambda x0: lax.fori_loop(0, k, body, x0))


def slope(fn, reduce_fn, x, kbig):
    """Device ms/iteration from the K=1 vs K=kbig slope.  kbig must be
    large enough that kbig * stage_time dwarfs the dispatch/RTT jitter
    (~100 ms wobble through the dev relay)."""
    f1 = loop_stage(fn, reduce_fn, x, 1)
    fk = loop_stage(fn, reduce_fn, x, kbig)
    timed(f1, x)       # compile
    timed(fk, x)       # compile
    t1 = min(timed(f1, x) for _ in range(5))
    tk = min(timed(fk, x) for _ in range(5))
    return (tk - t1) / (kbig - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fft-log2", type=int, default=20)
    ap.add_argument("--hops", type=int, default=18)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--kbig", type=int, default=256)
    ap.add_argument("--out", default="PROFILE.json")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--optin", action="store_true",
                    help="also profile the opt-in stages (WBFM stereo, "
                         "the three noise processors, RDS) at the "
                         "192 kHz WBFM-profile block shape")
    ap.add_argument("--mesh", type=int, default=0,
                    help="measure the channel-sharded e2e step on an "
                         "N-device mesh instead of the per-stage table "
                         "(CPU: combine with --platform cpu and "
                         "XLA_FLAGS=--xla_force_host_platform_device_"
                         "count=N; hops/channels must divide by N)")
    args = ap.parse_args()
    if args.kbig < 2:
        ap.error("--kbig must be >= 2 (the slope divides by kbig - 1)")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from phantomsdr_tpu.config import config_from_dict
    from phantomsdr_tpu.ops.fft import frame_hops, forward_spectrum
    from phantomsdr_tpu.ops.windows import hann_window
    from phantomsdr_tpu.ops.agc import (
        dc_blocker, agc_process, make_agc_params, dc_blocker_delay,
        init_dc_state, init_agc_state,
    )
    from phantomsdr_tpu.ops.channelizer import (
        demodulate_batch, extend_spectrum,
    )
    from phantomsdr_tpu.pipeline import (
        HopPipeline, waterfall_from_spectra, channels_from_numpy,
    )

    sps = 35_000_000
    cfg = config_from_dict({
        "input": {
            "sps": sps, "frequency": 100_000_000,
            "fft_size": 1 << args.fft_log2, "signal": "iq",
            "audio_sps": 12000, "waterfall_size": 1024,
            "driver": {"format": "u8"},
        },
        "tpu": {"hop_batch": args.hops, "max_channels": args.channels},
    })
    b, c = cfg.hop_batch, cfg.max_channels
    r, a = cfg.fft_result_size, cfg.audio_max_fft_size
    half = a // 2
    window = hann_window(cfg.fft_size)
    rng = np.random.default_rng(0)

    dev = jax.devices()[0]
    print(f"# profiling on {dev} fft=2^{args.fft_log2} B={b} C={c}",
          file=sys.stderr, flush=True)

    if args.mesh:
        # ---- channel-sharded mesh scaling row (VERDICT r3 item 7) ----
        # e2e sharded step only: per-stage fori_loop slopes don't
        # compose with shard_map, and the scaling signal is the step.
        from phantomsdr_tpu.parallel.sharded import (
            ShardedHopPipeline, make_mesh,
        )
        mesh = make_mesh(args.mesh)
        sp = ShardedHopPipeline(cfg, mesh)
        l64 = np.linspace(1000, r - 2000, c).astype(np.int64)
        table = channels_from_numpy(
            l=l64, r=l64 + min(a, 300), m_idx=l64 + min(a, 300) // 2,
            mode=np.arange(c) % 4, active=np.ones(c, bool))
        rng_ = np.random.default_rng(0)
        raws = [rng_.integers(0, 256, size=b * sp.wire_per_hop,
                              dtype=np.uint8) for _ in range(2)]
        state = sp.init_state()
        state, out = sp.step(state, jnp.asarray(sp.shard_raw(raws[0])),
                             table, waterfall="views")
        np.asarray(out.avg_power)  # REAL fence: block_until_ready is a
        times = []                 # no-op on the axon remote backend
        for i in range(8):
            t0 = time.monotonic()
            state, out = sp.step(
                state, jnp.asarray(sp.shard_raw(raws[i % 2])), table,
                waterfall="views")
            np.asarray(out.avg_power)  # device->host fetch = the fence
            times.append(time.monotonic() - t0)
        times.sort()
        res = {"config": {
            "fft_size": cfg.fft_size, "hop_batch": b, "channels": c,
            "mesh_devices": args.mesh, "device": str(dev),
            "backend": jax.default_backend(),
        }, "step_ms_sharded_p50": round(times[len(times) // 2] * 1e3, 2),
            "step_ms_sharded_min": round(times[0] * 1e3, 2),
            "samples_per_step": b * cfg.hop_size}
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps(res, indent=1))
        return

    # ---- stage inputs (device-resident, created via jit) ----
    n_cplx = (b + 1) * cfg.hop_size
    x_time = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (n_cplx,)), jax.random.normal(k, (n_cplx,)))
        )(jax.random.PRNGKey(0))
    spec = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (b, r)), jax.random.normal(k, (b, r)))
        )(jax.random.PRNGKey(1)) * 1e-3
    jax.block_until_ready((x_time, spec))

    # NB: everything closed over by a staged stage function must be HOST
    # numpy -- device-resident closure constants make lowering fetch
    # device->host mid-lower, which the axon remote backend rejects
    # (CLAUDE.md gotcha)
    from phantomsdr_tpu.ops.channelizer import ChannelTable, ChannelState

    l = np.linspace(1000, r - 2000, c).astype(np.int32)
    width = np.full(c, min(a, 300), np.int32)
    table = ChannelTable(l=l, r=(l + width).astype(np.int32),
                         m_idx=(l + width // 2).astype(np.int32),
                         mode=(np.arange(c) % 4).astype(np.int32),
                         active=np.ones(c, bool))
    chan_st = ChannelState(
        ssb_prev=np.zeros((c, half), np.float32),
        cplx_prev=np.zeros((c, half), np.complex64),
        fm_prev=np.zeros((c,), np.complex64),
        carrier_prev=np.zeros((c, half), np.complex64),
        pll_phase=np.zeros((c,), np.float32),
        pll_freq=np.zeros((c,), np.float32),
    )
    agc_params = make_agc_params(cfg.audio_sps)
    dc_delay = dc_blocker_delay(cfg.audio_sps)

    results: dict = {"config": {
        "fft_size": cfg.fft_size, "hop_batch": b, "channels": c,
        "sps": sps, "audio_fft_size": a,
        "device": str(dev), "backend": jax.default_backend(),
    }, "method": "fori_loop slope (K=1 vs K=%d), min of 5" % args.kbig,
        "stages_ms": {}}

    # ---- stage 1: framing + window + forward FFT ----
    def s_fft(x):
        frames = frame_hops(x, b, cfg.fft_size)
        return forward_spectrum(frames, window, cfg.is_real,
                                cfg.fft_strategy)

    t = slope(s_fft, lambda y: jnp.sum(jnp.real(y)), x_time, args.kbig)
    results["stages_ms"]["fft_batch"] = round(t * 1e3, 3)

    # ---- stage 2: waterfall power/quantize pyramid ----
    t = slope(lambda s: waterfall_from_spectra(cfg, s),
              lambda y: jnp.sum(y.astype(jnp.float32)), spec, args.kbig)
    results["stages_ms"]["waterfall_pyramid"] = round(t * 1e3, 3)

    # ---- stage 3: hop-batched channelizer demod (the production path) ----
    def s_demod(s):
        se = extend_spectrum(s, cfg.is_real, r, a)
        _, audio, _ = demodulate_batch(
            se, table, chan_st, jnp.int32(0),
            audio_fft_size=a, fft_result_size=r,
            base_idx=cfg.base_idx, is_real=cfg.is_real)
        return audio

    t = slope(s_demod, lambda y: jnp.sum(y), spec, args.kbig)
    results["stages_ms"]["channelizer_demod"] = round(t * 1e3, 3)

    # ---- stage 4: DC blocker + AGC over the batch's audio ----
    audio_blk = jax.jit(lambda k: jax.random.normal(k, (b, c, half)))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(audio_blk)

    def s_dcagc(ab):
        def hop_body(carry, x):
            dc_st, agc_st = carry
            dc_st, y = dc_blocker(dc_st, x, dc_delay)
            agc_st, y = agc_process(agc_st, y, agc_params)
            return (dc_st, agc_st), y

        _, out = jax.lax.scan(
            hop_body, (init_dc_state(c, dc_delay),
                       init_agc_state(c, agc_params.window)), ab)
        return out

    t = slope(s_dcagc, lambda y: jnp.sum(y), audio_blk, args.kbig)
    results["stages_ms"]["dc_agc"] = round(t * 1e3, 3)

    # ---- opt-in stages (device side of stereo / nr / rds) ----
    if args.optin:
        from phantomsdr_tpu.ops.stereo import (
            make_stereo_params, init_stereo_state, stereo_decode,
        )
        from phantomsdr_tpu.ops.nr import (
            make_nr_params, init_nr_state, nr_process,
        )
        from phantomsdr_tpu.ops.anr import (
            make_anr_params, init_anr_state, anr_process,
        )
        from phantomsdr_tpu.ops.nb import (
            make_nb_params, init_nb_state, nb_process,
        )
        from phantomsdr_tpu.ops.rds import (
            make_rds_params, init_rds_state, rds_process,
        )

        fs = 192000
        t_len = b * 2048          # WBFM-profile-class audio block
        kb = min(32, args.kbig)   # per-sample scans: keep runs bounded

        def host_state(mk):
            """All-zero HOST-numpy state (device-resident closure
            constants hang axon lowering -- CLAUDE.md gotcha)."""
            return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                jax.eval_shape(mk))

        stream = jax.jit(lambda k: jax.random.normal(k, (c, t_len)))(
            jax.random.PRNGKey(3))
        jax.block_until_ready(stream)
        fm_mask = np.ones(c, bool)
        results["optin_config"] = {"fs": fs, "block": [c, t_len],
                                   "kbig": kb}
        results["optin_stages_ms"] = {}

        sp = make_stereo_params(fs)
        st0 = host_state(lambda: init_stereo_state(c, sp))
        t = slope(lambda x: stereo_decode(st0, sp, x, fm_mask)[1],
                  lambda y: jnp.sum(y), stream, kb)
        results["optin_stages_ms"]["stereo_decode"] = round(t * 1e3, 3)

        nrp = make_nr_params(2048)
        nst0 = host_state(lambda: init_nr_state(c, 2048))
        t = slope(lambda x: nr_process(nst0, nrp, x, b)[1],
                  lambda y: jnp.sum(y), stream, kb)
        results["optin_stages_ms"]["nr_spectral"] = round(t * 1e3, 3)

        ap_ = make_anr_params(notch=False)
        ast0 = host_state(lambda: init_anr_state(c, ap_))
        t = slope(lambda x: anr_process(ast0, ap_, x)[1],
                  lambda y: jnp.sum(y), stream, kb)
        results["optin_stages_ms"]["nr_lms"] = round(t * 1e3, 3)

        nbp = make_nb_params()
        bst0 = host_state(lambda: init_nb_state(c, nbp))
        t = slope(lambda x: nb_process(bst0, nbp, x)[1],
                  lambda y: jnp.sum(y), stream, kb)
        results["optin_stages_ms"]["nb_blanker"] = round(t * 1e3, 3)

        rp = make_rds_params(fs, 2048)
        rst0 = host_state(lambda: init_rds_state(c, rp))
        t = slope(lambda x: rds_process(rst0, rp, x, fm_mask)[1],
                  lambda y: jnp.sum(y.astype(jnp.float32)), stream, kb)
        results["optin_stages_ms"]["rds_downmix"] = round(t * 1e3, 3)

        # stereo + RDS together, the pipeline's shared-pilot path
        # (pipeline.audio_from_spectra): ONE bandpass+PLL feeds both
        # the 38 kHz demix and the 57 kHz downmix -- combined should be
        # ~max(stereo, rds), not their sum.
        from phantomsdr_tpu.ops.stereo import (
            pilot_bandpass, pilot_track, delay_stream, stereo_demix,
        )
        from phantomsdr_tpu.ops.rds import rds_from_pilot

        def s_both(x):
            _, y = pilot_bandpass(rst0.bp_tail, rp.bp_taps, x)
            _, xd = delay_stream(rst0.mpx_tail, x)
            _, _, ph = pilot_track(rst0.phase, rst0.freq, rp.f_nom, y)
            _, q = rds_from_pilot(rst0.dec_tail, rp, xd, ph, fm_mask)
            _, xm = delay_stream(st0.mono_tail, x)
            l, r = stereo_demix(xm, ph, fm_mask)
            return l + r + jnp.sum(q.astype(jnp.float32))

        t = slope(s_both, lambda y: jnp.sum(y), stream, kb)
        results["optin_stages_ms"]["stereo_plus_rds_shared"] = round(
            t * 1e3, 3)

    # ---- end-to-end step (normal path, packed fetch per step) ----
    pipe = HopPipeline(cfg)
    blk = (b + 1) * pipe.wire_per_hop
    pool = [jnp.asarray(rng.integers(0, 256, size=blk, dtype=np.uint8))
            for _ in range(2)]
    jax.block_until_ready(pool)
    state = pipe.init_state()
    state, out = pipe.step(state, pool[0], table, waterfall="full")
    np.asarray(out.packed)  # compile + layout warm
    times = []
    for i in range(6):
        t0 = time.monotonic()
        state, out = pipe.step(state, pool[i % 2], table, waterfall="full")
        _ = np.asarray(out.packed)
        times.append(time.monotonic() - t0)
    times.sort()
    results["step_ms_e2e_p50"] = round(times[len(times) // 2] * 1e3, 2)
    compute = sum(results["stages_ms"].values())
    results["device_compute_ms_total"] = round(compute, 3)
    results["device_msps_ceiling"] = round(
        b * cfg.hop_size / (compute / 1e3) / 1e6, 1)
    results["samples_per_step"] = b * cfg.hop_size

    # ---- HBM speed-of-light accounting for the FFT ----
    # 2^20 c2c f32: ~3 passes x 16 B/point r+w over B*N points
    n = cfg.fft_size
    bytes_moved = 3 * 2 * 8 * b * n
    results["fft_sol"] = {
        "assumed_hbm_gbps": 800,
        "bytes_moved_est": bytes_moved,
        "sol_ms": round(bytes_moved / (800e9) * 1e3, 3),
        "measured_ms": results["stages_ms"]["fft_batch"],
    }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
