"""Device-side WBFM stereo decode (ops/stereo.py + pipeline wiring).

The reference does stereo in the browser (jsdsp/src/wbfmpll.cpp); here
it is a server-side opt-in (``[input] stereo = true``).  These tests
pin the decoder's separation, its streaming continuity, the documented
deviations from the reference PLL (ops/stereo.py module docstring),
and the interleaved wire format through pipeline + codecs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops.stereo import (
    MIN_STEREO_SPS, init_stereo_state, make_stereo_params, stereo_decode,
)
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

FS = 192000


def _mpx(T: int, fl: float = 800.0, fr: float = 1300.0):
    """Standard FM MPX: mono + 9% pilot + DSB L-R on the 38 kHz
    subcarrier (phase-locked at 2x the pilot phase)."""
    t = np.arange(T) / FS
    L = np.sin(2 * np.pi * fl * t)
    R = np.sin(2 * np.pi * fr * t)
    th = 2 * np.pi * 19000.0 * t
    x = (0.45 * (L + R) / 2 + 0.09 * np.cos(th)
         + 0.45 * (L - R) / 2 * np.cos(2 * th))
    return x.astype(np.float32), L, R


def _tone_amp(x: np.ndarray, f: float) -> float:
    n = x.size
    ph = np.exp(-2j * np.pi * f * np.arange(n) / FS)
    return float(np.abs(np.sum(x * ph)) * 2 / n)


def test_stereo_separation():
    """After PLL lock, the 800 Hz L tone lands in L and the 1300 Hz R
    tone in R, each with >30 dB rejection in the opposite ear.  (The
    reference's cos-detector PLL locks in quadrature and would decode
    0.25L+0.75R / 0.75L+0.25R -- swapped channels, 9.5 dB; the in-phase
    deviation is documented in ops/stereo.py.)"""
    p = make_stereo_params(FS)
    T = FS // 2
    x, _, _ = _mpx(T)
    st = init_stereo_state(1, p)
    st, l, r = stereo_decode(st, p, jnp.asarray(x[None]),
                             jnp.array([True]))
    l, r = np.asarray(l)[0][T // 2:], np.asarray(r)[0][T // 2:]
    l_want, l_leak = _tone_amp(l, 800), _tone_amp(l, 1300)
    r_want, r_leak = _tone_amp(r, 1300), _tone_amp(r, 800)
    assert abs(l_want - 0.45) < 0.02 and abs(r_want - 0.45) < 0.02
    assert l_leak < 0.45 * 10 ** (-30 / 20)
    assert r_leak < 0.45 * 10 ** (-30 / 20)


def test_stereo_streaming_continuity():
    """Chunked decode (state carried) is identical to one-shot."""
    p = make_stereo_params(FS)
    T = 16384
    x, _, _ = _mpx(T)
    st = init_stereo_state(2, p)
    xx = np.stack([x, x * 0.5])
    fm = jnp.array([True, True])
    _, l_full, r_full = stereo_decode(st, p, jnp.asarray(xx), fm)
    st2 = init_stereo_state(2, p)
    ls, rs = [], []
    for i in range(0, T, 2048):
        st2, l, r = stereo_decode(st2, p, jnp.asarray(xx[:, i:i + 2048]),
                                  fm)
        ls.append(np.asarray(l))
        rs.append(np.asarray(r))
    np.testing.assert_allclose(np.concatenate(ls, axis=1),
                               np.asarray(l_full), atol=1e-6)
    np.testing.assert_allclose(np.concatenate(rs, axis=1),
                               np.asarray(r_full), atol=1e-6)


def test_stereo_nonfm_mono_passthrough():
    """fm_mask False rows: L == R == group-delayed mono, exactly."""
    p = make_stereo_params(FS)
    T = 4096
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, T)).astype(np.float32)
    st = init_stereo_state(1, p)
    st, l, r = stereo_decode(st, p, jnp.asarray(x), jnp.array([False]))
    np.testing.assert_array_equal(np.asarray(l), np.asarray(r))
    # delayed by the bandpass group delay, zero history
    want = np.concatenate([np.zeros((1, p.delay), np.float32),
                           x[:, :T - p.delay]], axis=1)
    np.testing.assert_allclose(np.asarray(l), want, atol=1e-7)


def test_stereo_config_validation():
    base = {
        "input": {
            "sps": 2_000_000, "frequency": 98_000_000, "fft_size": 65536,
            "signal": "iq", "audio_sps": 96000, "waterfall_size": 1024,
            "stereo": True, "driver": {"format": "u8"},
            "defaults": {"frequency": 98_300_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 2},
    }
    # 96 kHz cannot carry the 38 kHz subcarrier + 15 kHz audio
    with pytest.raises(ValueError, match="stereo"):
        config_from_dict(base)
    ok = {**base, "input": {**base["input"], "audio_sps": 192000}}
    cfg = config_from_dict(ok)
    assert cfg.stereo and cfg.audio_channels == 2
    assert MIN_STEREO_SPS <= 192000


def test_stereo_pipeline_interleaved_output():
    """HopPipeline with stereo=true: audio is [B, C, 2*half] L/R
    interleaved; a non-FM row has exactly L == R; an FM row does not
    (pilot PLL path engaged)."""
    cfg = config_from_dict({
        "input": {
            "sps": 2_000_000, "frequency": 98_000_000, "fft_size": 65536,
            "signal": "iq", "audio_sps": 192000, "waterfall_size": 1024,
            "stereo": True, "audio_compression": "flac",
            "driver": {"format": "u8"},
            "defaults": {"frequency": 98_300_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 2},
    })
    pipe = HopPipeline(cfg)
    half = cfg.audio_fft_size // 2
    m = int(cfg.default_m)
    # row 0: FM (stereo decode), row 1: AM (mono passthrough)
    table = channels_from_numpy(
        l=[cfg.default_l] * 2, r=[cfg.default_r] * 2, m_idx=[m] * 2,
        mode=[3, 2], active=[True, True])
    rng = np.random.default_rng(0)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    state = pipe.init_state()
    audio = None
    # the AGC gain ramps from silence over its 0.2 s window (38400
    # samples at 192 kHz, ~6 steps of B*half) -- run until audible
    for _ in range(12):
        raw = rng.integers(0, 256, n, dtype=np.uint8)
        state, out = pipe.step(state, jnp.asarray(raw), table,
                               waterfall="off")
        audio = np.asarray(out.audio)
        if np.count_nonzero(audio):
            break
    assert np.count_nonzero(audio)
    assert audio.shape == (cfg.hop_batch, 2, 2 * half)
    am = audio[:, 1].reshape(-1, 2)
    np.testing.assert_array_equal(am[:, 0], am[:, 1])  # L == R
    fm = audio[:, 0].reshape(-1, 2)
    assert np.any(fm[:, 0] != fm[:, 1])


def test_stereo_sharded_matches_single_device():
    """Stereo on the 8-device mesh: the [C]-leading stereo carries
    (bp/mono tails, PLL phase/freq) shard over the channel axis like
    every other audio-state leaf; audio must match single-device."""
    import jax

    from phantomsdr_tpu.parallel import ShardedHopPipeline, make_mesh

    n_dev = min(8, len(jax.devices()))
    assert n_dev == 8
    cfg = config_from_dict({
        "input": {
            "sps": 1_536_000, "frequency": 98_000_000, "fft_size": 4096,
            "signal": "iq", "audio_sps": 192000, "waterfall_size": 512,
            "stereo": True, "driver": {"format": "s16"},
            "defaults": {"frequency": 98_300_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2 * n_dev, "max_channels": n_dev},
    })
    pipe = HopPipeline(cfg)
    sp = ShardedHopPipeline(cfg, make_mesh(n_dev))
    c = cfg.max_channels
    rng = np.random.default_rng(7)
    l = rng.integers(0, cfg.fft_result_size - 600, c)
    table = channels_from_numpy(
        l=l, r=l + 512, m_idx=l + 256,
        mode=rng.integers(0, 4, c), active=np.ones(c, bool))
    b, wph = cfg.hop_batch, pipe.wire_per_hop
    raw = rng.integers(-20000, 20000, size=(2 * b + 1) * wph,
                       dtype=np.int16)
    st1, st8 = pipe.init_state(), sp.init_state()
    halo = np.zeros(wph, np.int16)
    for s in range(2):
        blk = raw[wph + s * b * wph: wph + (s + 1) * b * wph]
        st1, o1 = pipe.step(st1, jnp.asarray(np.concatenate([halo, blk])),
                            table, waterfall="off")
        halo = blk[-wph:]
        st8, o8 = sp.step(st8, jnp.asarray(sp.shard_raw(blk)), table,
                          waterfall="off")
        a1 = np.asarray(o1.audio).astype(int)
        a8 = np.asarray(o8.audio).astype(int)
        assert a1.shape == (b, c, 2 * (cfg.audio_fft_size // 2))
        assert np.abs(a1 - a8).max() <= 1  # fp reduction-order wiggle


def test_stereo_rds_shared_pilot():
    """With BOTH subcarrier opt-ins on, the pipeline tracks the 19 kHz
    pilot ONCE (pipeline.audio_from_spectra shared-pilot path) and
    feeds both consumers.  Outputs must match the single-opt-in
    pipelines: audio == the stereo-only pipeline's, RDS baseband == the
    rds-only pipeline's (NR off, so the tap points see the same
    stream); and the two states' mirrored pilot carries stay equal."""
    def cfg_for(stereo, rds):
        return config_from_dict({
            "input": {
                "sps": 1_536_000, "frequency": 98_000_000,
                "fft_size": 4096, "signal": "iq", "audio_sps": 192000,
                "waterfall_size": 512, "stereo": stereo, "rds": rds,
                "driver": {"format": "s16"},
                "defaults": {"frequency": 98_000_000,
                             "modulation": "WBFM"},
            },
            "tpu": {"hop_batch": 16, "max_channels": 2},
        })

    cfg = cfg_for(True, True)
    pipes = {k: HopPipeline(cfg_for(*v)) for k, v in
             {"both": (True, True), "st": (True, False),
              "rds": (False, True)}.items()}
    half = cfg.audio_fft_size // 2
    mid = cfg.fft_result_size // 2
    table = channels_from_numpy(
        l=[mid - half // 2] * 2, r=[mid + half // 2] * 2,
        m_idx=[mid] * 2, mode=[3, 3], active=[True, True],
        rds=[True, False])
    rng = np.random.default_rng(5)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    states = {k: p.init_state() for k, p in pipes.items()}
    for _ in range(12):
        raw = jnp.asarray(rng.integers(-20000, 20000, n, dtype=np.int16))
        outs = {}
        for k, p in pipes.items():
            states[k], outs[k] = p.step(states[k], raw, table,
                                        waterfall="off")
        a_both = np.asarray(outs["both"].audio).astype(np.int32)
        a_st = np.asarray(outs["st"].audio).astype(np.int32)
        assert np.abs(a_both - a_st).max() <= 1  # fusion rounding only
        r_both = np.asarray(outs["both"].rds).astype(np.int32)
        r_rds = np.asarray(outs["rds"].rds).astype(np.int32)
        assert np.abs(r_both - r_rds).max() <= 1
        st = states["both"].audio
        np.testing.assert_array_equal(np.asarray(st.st.phase),
                                      np.asarray(st.rds.phase))
        np.testing.assert_array_equal(np.asarray(st.st.bp_tail),
                                      np.asarray(st.rds.bp_tail))
    assert np.any(r_both[0])  # the opted-in FM row produced baseband
    # pilot engaged: FM row decodes stereo (L != R somewhere)
    fm = np.asarray(outs["both"].audio)[:, 0].reshape(-1, 2)
    assert np.any(fm[:, 0] != fm[:, 1])


def test_scan_unroll_bit_identical(monkeypatch):
    """The TPU scan-step unroll (ops/unroll.py: k samples per lax.scan
    step) must be BIT-identical to the per-sample scan -- the k updates
    run in the same sequential order inside one step.  CPU forces k=1,
    so force the unrolled path here and compare across pilot_track
    (stereo/RDS), am_sync_detect (AM PLL) and anr_process (LMS) on the
    same inputs."""
    import phantomsdr_tpu.ops.stereo as st_mod
    import phantomsdr_tpu.ops.unroll as un_mod
    from phantomsdr_tpu.ops.channelizer import am_sync_detect
    from phantomsdr_tpu.ops.anr import (
        make_anr_params, init_anr_state, anr_process,
    )

    rng = np.random.default_rng(9)
    c, T = 3, 4096
    y = rng.standard_normal((c, T)).astype(np.float32)
    z = (rng.standard_normal((c, T))
         + 1j * rng.standard_normal((c, T))).astype(np.complex64)
    ph0 = jnp.zeros(c, jnp.float32)
    fr0 = jnp.zeros(c, jnp.float32)
    p = make_stereo_params(FS)
    ap = make_anr_params(notch=False)
    ast = init_anr_state(c, ap)

    outs = {}
    for name, k in (("rolled", 1), ("unrolled", 16)):
        monkeypatch.setattr(un_mod, "scan_unroll",
                            lambda t, _k, k=k: k if t % k == 0 else 1)
        outs[name] = (
            np.asarray(st_mod.pilot_track(ph0, fr0, p.f_nom,
                                          jnp.asarray(y))[2]),
            np.asarray(am_sync_detect(jnp.asarray(z), jnp.asarray(z),
                                      ph0, fr0)[0]),
            np.asarray(anr_process(ast, ap, jnp.asarray(y))[1]),
        )
    for a, b in zip(outs["rolled"], outs["unrolled"]):
        np.testing.assert_array_equal(a, b)


def test_flac_stereo_roundtrip():
    from phantomsdr_tpu.runtime.codecs import FlacEncoder
    from tests.test_codecs import decode_flac

    r = np.random.default_rng(1)
    x = (r.standard_normal(8000) * 6000).astype(np.int16)  # interleaved
    enc = FlacEncoder(192000, blocksize=512, channels=2)
    data = enc.process(x[:5000]) + enc.process(x[5000:]) + enc.finish()
    sr, got = decode_flac(data)
    assert sr == 192000
    np.testing.assert_array_equal(got, x.astype(np.int32))


def test_opus_stereo_interleaved():
    from phantomsdr_tpu.runtime.codecs import OpusChunkEncoder

    enc = OpusChunkEncoder(192000, channels=2)
    assert enc.rate == 48000 and enc._decim == 4
    assert enc.frame_size == 960  # per channel
    t = np.arange(19200) / 192000
    L = 8000 * np.sin(2 * np.pi * 700 * t)
    R = 8000 * np.sin(2 * np.pi * 2100 * t)
    x = np.stack([L, R], axis=1).reshape(-1).astype(np.int16)
    pkts = enc.process(x)
    assert len(pkts) == 4 and all(len(p) > 1 for p in pkts)
    # the stereo decimator must keep channels independent: feed the
    # decimator alone and check each channel's tone survives unmixed
    enc2 = OpusChunkEncoder(192000, channels=2)
    y = enc2._decimate(x).reshape(-1, 2).astype(float)
    spec_l = np.abs(np.fft.rfft(y[240:, 0]))
    spec_r = np.abs(np.fft.rfft(y[240:, 1]))
    freqs = np.fft.rfftfreq(y.shape[0] - 240, 1 / 48000)
    assert abs(freqs[np.argmax(spec_l)] - 700) < 25
    assert abs(freqs[np.argmax(spec_r)] - 2100) < 25
