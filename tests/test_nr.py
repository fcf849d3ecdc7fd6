"""Device spectral noise reduction (ops/nr.py) vs the straight-line
oracle port of jsdsp/lib/NR_spectral.c (tests/oracle_nr.py), plus the
pipeline/protocol wiring."""

import numpy as np
import jax.numpy as jnp
import pytest

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops.nr import (
    init_nr_state, make_nr_params, nr_process,
)
from tests.oracle_nr import SpectralNROracle

F = 180
FS = 12000


def _noisy_tone(nfr: int, seed=0, tone_from=1.2):
    """Noise-only first (the 100 ms init must learn NOISE, like real
    audio between transmissions), then a tone appears."""
    rng = np.random.default_rng(seed)
    t = np.arange(nfr * F) / FS
    gate = (t > tone_from).astype(float)
    sig = (6000 * np.sin(2 * np.pi * 700 * t) * gate
           + 1500 * rng.standard_normal(nfr * F))
    return np.round(sig)


def test_nr_matches_oracle_chunked():
    """Chunked device processing (6-frame steps, state carried) must
    match the oracle to f32-vs-f64 rounding (1 LSB on the rounded
    int16-domain output)."""
    nfr = 60
    sig = _noisy_tone(nfr)
    want = SpectralNROracle(F).process(sig)

    p = make_nr_params(F)
    st = init_nr_state(1, F)
    outs = []
    for i in range(0, nfr, 6):
        blk = sig[i * F:(i + 6) * F][None].astype(np.float32)
        st, y = nr_process(st, p, jnp.asarray(blk), 6)
        outs.append(np.asarray(y)[0])
    got = np.concatenate(outs)
    d = np.abs(got - want)
    assert d.max() <= 1.0
    assert (d > 0).mean() < 0.005  # only isolated .5-boundary flips


def test_nr_improves_snr():
    """After the noise-only init, the reducer must cut the noise floor
    by far more than it cuts the tone: >=8 dB SNR improvement, tone
    kept within 1.5 dB."""
    nfr = 160
    sig = _noisy_tone(nfr)
    p = make_nr_params(F)
    st = init_nr_state(1, F)
    st, out = nr_process(st, p, jnp.asarray(sig[None].astype(np.float32)),
                         nfr)
    out = np.asarray(out)[0]
    q = 3 * sig.size // 4

    def stats(x):
        n = x.size - q
        ph = np.exp(-2j * np.pi * 700 * np.arange(q, x.size) / FS)
        a = np.abs(np.sum(x[q:] * ph)) * 2 / n
        pn = max((x[q:] ** 2).mean() - a * a / 2, 1.0)
        return a, 10 * np.log10(a * a / 2 / pn)

    a_in, snr_in = stats(sig)
    a_out, snr_out = stats(out)
    assert snr_out - snr_in >= 8.0
    assert abs(20 * np.log10(a_out / a_in)) < 1.5


def test_nr_silent_input_no_nan():
    """The reference NaNs on exactly-zero input (X/xt = 0/0); the
    device op's epsilon guard must keep silence silent (documented
    deviation, ops/nr.py)."""
    p = make_nr_params(F)
    st = init_nr_state(2, F)
    x = jnp.zeros((2, 30 * F), jnp.float32)
    st, y = nr_process(st, p, x, 30)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_nr_multichannel_independent():
    """Batched [C] processing must equal per-channel processing."""
    nfr = 40
    a = _noisy_tone(nfr, seed=1)
    b = _noisy_tone(nfr, seed=2, tone_from=0.3)
    p = make_nr_params(F)
    st = init_nr_state(2, F)
    both = np.stack([a, b]).astype(np.float32)
    _, y = nr_process(st, p, jnp.asarray(both), nfr)
    for i, x in enumerate((a, b)):
        st1 = init_nr_state(1, F)
        _, y1 = nr_process(st1, p,
                           jnp.asarray(x[None].astype(np.float32)), nfr)
        np.testing.assert_allclose(np.asarray(y)[i], np.asarray(y1)[0],
                                   atol=1e-3)


def _nr_cfg(nr=True):
    return config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 256,
            "nr": nr, "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 4},
    })


def test_nr_pipeline_gating():
    """Pipeline with [input] nr=true: channels with the nr flag get the
    denoised stream; channels without it are BIT-IDENTICAL to an
    nr=false pipeline (the NR recursion runs but its output is not
    selected)."""
    from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

    cfg_on, cfg_off = _nr_cfg(True), _nr_cfg(False)
    pipes = HopPipeline(cfg_on), HopPipeline(cfg_off)
    l = np.full(4, 100)
    rng = np.random.default_rng(0)
    n = cfg_on.hop_size * (cfg_on.hop_batch + 1) * 2
    table_on = channels_from_numpy(
        l=l, r=l + 20, m_idx=l + 10, mode=[0, 1, 2, 3],
        active=np.ones(4, bool), nr=[True, False, True, False])
    table_off = channels_from_numpy(
        l=l, r=l + 20, m_idx=l + 10, mode=[0, 1, 2, 3],
        active=np.ones(4, bool))
    states = [p.init_state() for p in pipes]
    # run past the AGC ramp (window 2400 samples, 256/step here) AND
    # the NR's 20-frame noise-estimate init; compare once the denoised
    # rows actually diverge
    diverged = False
    for step in range(60):
        raw = rng.integers(-20000, 20000, n, dtype=np.int16)
        states[0], o_on = pipes[0].step(states[0], jnp.asarray(raw),
                                        table_on, waterfall="off")
        states[1], o_off = pipes[1].step(states[1], jnp.asarray(raw),
                                         table_off, waterfall="off")
        a_on, a_off = np.asarray(o_on.audio), np.asarray(o_off.audio)
        # nr=False rows identical to the nr-less pipeline, every step
        np.testing.assert_array_equal(a_on[:, 1], a_off[:, 1])
        np.testing.assert_array_equal(a_on[:, 3], a_off[:, 3])
        if np.any(a_on[:, 0] != a_off[:, 0]):
            diverged = True
            break
    assert diverged  # nr=True rows got the denoised stream


def test_nr_config_validation():
    with pytest.raises(ValueError, match="nr"):
        config_from_dict({
            "input": {
                "sps": 2_000_000, "frequency": 98_000_000,
                "fft_size": 65536, "signal": "iq", "audio_sps": 192000,
                "waterfall_size": 1024, "stereo": True, "nr": True,
                "driver": {"format": "u8"},
                "defaults": {"frequency": 98_300_000,
                             "modulation": "WBFM"},
            },
            "tpu": {"hop_batch": 2, "max_channels": 2},
        })


def test_nr_registry_command():
    from phantomsdr_tpu.runtime.registry import ChannelRegistry

    cfg = _nr_cfg(True)
    reg = ChannelRegistry(cfg)
    s = reg.acquire("u1")
    reg.retune(s, 100, 110.0, 120)
    v0 = reg.version
    reg.set_nr(s, True)
    assert reg.version > v0
    _, arrays, _, _ = reg.snapshot()
    assert arrays[5][s.slot]  # nr column rides the same snapshot
    reg.release(s)
    assert not reg.nr[s.slot]


# ---------------------------------------------------------------- ANR (LMS)

def test_anr_matches_oracle_chunked():
    """anr_process_exact vs the straight-line ANR.c oracle, both
    modes, chunked streaming (delay line + weights + leak carried)."""
    from phantomsdr_tpu.ops.anr import (
        anr_process_exact, init_anr_state, make_anr_params,
    )
    from tests.oracle_anr import ANROracle

    rng = np.random.default_rng(0)
    T = 4000
    t = np.arange(T) / FS
    x = (5000 * np.sin(2 * np.pi * 800 * t)
         + 1000 * rng.standard_normal(T)).astype(np.float32)
    for notch in (False, True):
        o = ANROracle(0 if notch else 1, 64, 8, 1e-4, 0.1)
        want = o.process(x.astype(np.float64))
        p = make_anr_params(notch=notch)
        st = init_anr_state(1, p)
        outs = []
        for i in range(0, T, 1000):
            st, y = anr_process_exact(st, p,
                                      jnp.asarray(x[None, i:i + 1000]))
            outs.append(np.asarray(y)[0])
        got = np.concatenate(outs)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-4  # f32 vs f64


def test_anr_block1_matches_exact():
    """The shipped block-LMS path at block=1 IS the per-sample filter:
    every frozen-block quantity collapses to the exact step's, so the
    two paths must agree to f32 reassociation noise on both modes."""
    from phantomsdr_tpu.ops.anr import (
        anr_process, anr_process_exact, init_anr_state, make_anr_params,
    )

    rng = np.random.default_rng(3)
    T = 1500
    t = np.arange(T) / FS
    x = (5000 * np.sin(2 * np.pi * 800 * t)
         + 1000 * rng.standard_normal(2 * T).reshape(2, T)
         ).astype(np.float32)
    for notch in (False, True):
        pe = make_anr_params(notch=notch)
        pb = make_anr_params(notch=notch, block=1)
        se = init_anr_state(2, pe)
        sb = init_anr_state(2, pb)
        se, ye = anr_process_exact(se, pe, jnp.asarray(x))
        sb, yb = anr_process(sb, pb, jnp.asarray(x))
        scale = np.abs(np.asarray(ye)).max()
        assert np.abs(np.asarray(ye) - np.asarray(yb)).max() / scale < 1e-5
        np.testing.assert_allclose(np.asarray(se.w), np.asarray(sb.w),
                                   rtol=0, atol=1e-5)


def test_anr_block_tracks_exact():
    """Block-LMS deviation pin (the documented deviation, ops/anr.py
    module docstring): after the adaptation transient the default
    block=256 output must track the exact per-sample filter within a
    small relative RMS on a converged tone+noise stream, and must not
    restart adaptation at chunk boundaries (state carried)."""
    from phantomsdr_tpu.ops.anr import (
        anr_process, anr_process_exact, init_anr_state, make_anr_params,
    )

    rng = np.random.default_rng(4)
    T = 24000
    t = np.arange(T) / FS
    x = (5000 * np.sin(2 * np.pi * 800 * t)
         + 1000 * rng.standard_normal(T)).astype(np.float32)[None]
    for notch in (False, True):
        p = make_anr_params(notch=notch)
        se = init_anr_state(1, p)
        sb = init_anr_state(1, p)
        _, ye = anr_process_exact(se, p, jnp.asarray(x))
        # chunked (uneven sizes: exercises the remainder block + the
        # cross-call history carry)
        outs = []
        for i in range(0, T, 7000):
            sb, y = anr_process(sb, p, jnp.asarray(x[:, i:i + 7000]))
            outs.append(np.asarray(y)[0])
        yb = np.concatenate(outs)
        ye = np.asarray(ye)[0]
        q = 3 * T // 4
        num = np.sqrt(((yb[q:] - ye[q:]) ** 2).mean())
        den = np.sqrt((ye[q:] ** 2).mean())
        assert num / den < 0.05, (notch, num / den)


def test_anr_nr_improves_tone_to_noise():
    """LMS NR keeps the predictable tone and drops broadband noise."""
    from phantomsdr_tpu.ops.anr import (
        anr_process, init_anr_state, make_anr_params,
    )

    rng = np.random.default_rng(1)
    T = 24000
    t = np.arange(T) / FS
    x = (5000 * np.sin(2 * np.pi * 800 * t)
         + 1000 * rng.standard_normal(T)).astype(np.float32)
    p = make_anr_params(notch=False)
    st = init_anr_state(1, p)
    _, y = anr_process(st, p, jnp.asarray(x[None]))
    y = np.asarray(y)[0]
    q = 3 * T // 4

    def snr(v):
        ph = np.exp(-2j * np.pi * 800 * np.arange(q, T) / FS)
        a = np.abs(np.sum(v[q:] * ph)) * 2 / (T - q)
        return a, a * a / 2 / max((v[q:] ** 2).mean() - a * a / 2, 1.0)

    _, s_in = snr(x)
    _, s_out = snr(y)
    assert 10 * np.log10(s_out / s_in) > 8.0


def test_anr_notch_kills_tone():
    """Auto-notch: the steady carrier is removed, the noise passes."""
    from phantomsdr_tpu.ops.anr import (
        anr_process, init_anr_state, make_anr_params,
    )

    rng = np.random.default_rng(2)
    T = 24000
    t = np.arange(T) / FS
    tone = 5000 * np.sin(2 * np.pi * 800 * t)
    x = (tone + 500 * rng.standard_normal(T)).astype(np.float32)
    p = make_anr_params(notch=True, two_mu=1e-3)
    st = init_anr_state(1, p)
    _, y = anr_process(st, p, jnp.asarray(x[None]))
    y = np.asarray(y)[0]
    q = 3 * T // 4
    ph = np.exp(-2j * np.pi * 800 * np.arange(q, T) / FS)
    a_out = np.abs(np.sum(y[q:] * ph)) * 2 / (T - q)
    assert a_out < 0.05 * 5000  # >26 dB carrier rejection


def test_anr_pipeline_smoke():
    """nr_algo='lms' compiles into the hop pipeline and gates per
    channel exactly like the spectral path."""
    from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

    cfg = config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 256,
            "nr": True, "nr_algo": "lms", "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 2},
    })
    pipe = HopPipeline(cfg)
    l = np.full(2, 100)
    table = channels_from_numpy(l=l, r=l + 20, m_idx=l + 10, mode=[2, 2],
                                active=np.ones(2, bool), nr=[True, False])
    rng = np.random.default_rng(0)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    state = pipe.init_state()
    for _ in range(3):
        raw = rng.integers(-20000, 20000, n, dtype=np.int16)
        state, out = pipe.step(state, jnp.asarray(raw), table,
                               waterfall="off")
    assert np.isfinite(np.asarray(out.avg_power)).all()


def test_nr_algo_validation():
    with pytest.raises(ValueError, match="nr_algo"):
        config_from_dict({
            "input": {
                "sps": 192000, "frequency": 7000000, "fft_size": 2048,
                "signal": "iq", "audio_sps": 12000,
                "waterfall_size": 256, "nr": True, "nr_algo": "bogus",
                "driver": {"format": "s16"},
            },
            "tpu": {"hop_batch": 4, "max_channels": 2},
        })


# --------------------------------------------------------- noise blanker

def test_nb_matches_oracle_chunked():
    """ops/nb.py vs the straight-line NB.c oracle: chunked streaming
    (working-buffer tail carried), impulses repaired identically."""
    from phantomsdr_tpu.ops.nb import (
        init_nb_state, make_nb_params, nb_process,
    )
    from tests.oracle_nb import WildNBOracle

    rng = np.random.default_rng(0)
    T = 2000
    t = np.arange(3 * T) / FS
    sig = 4000 * np.sin(2 * np.pi * 600 * t) \
        + 300 * rng.standard_normal(3 * T)
    impulses = [700, 1900, 2500, 4100, 5200]
    for p_ in impulses:
        sig[p_] += 25000
    sig = sig.astype(np.float32)

    o = WildNBOracle(5.0, 32, 11)
    want = np.concatenate([o.process(sig[i * T:(i + 1) * T]
                                     .astype(np.float64))
                           for i in range(3)])
    p = make_nb_params(5.0, 32, 11)
    st = init_nb_state(1, p)
    outs = []
    for i in range(3):
        st, y = nb_process(st, p, jnp.asarray(sig[None, i * T:(i + 1) * T]))
        outs.append(np.asarray(y)[0])
    got = np.concatenate(outs)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    # every injected impulse repaired to near the underlying signal
    for p_ in impulses:
        assert abs(got[p_]) < 6000 < abs(sig[p_])


def test_nb_matches_oracle_burst_overlap():
    """Closely-spaced impulses (a burst): the skip-ahead search fires
    at minimum gaps (PL+1 samples), repair windows overlap, and a
    later repair's FORWARD prediction basis includes earlier repaired
    samples -- the C's in-place sequential semantics.  The batched
    reformulation (per-frame coefficient matrices + hoisted backward
    patches) must still match the oracle exactly on this path, which
    the well-separated-impulse test never exercises."""
    from phantomsdr_tpu.ops.nb import (
        init_nb_state, make_nb_params, nb_process,
    )
    from tests.oracle_nb import WildNBOracle

    rng = np.random.default_rng(4)
    T = 2000
    t = np.arange(2 * T) / FS
    sig = 3000 * np.sin(2 * np.pi * 500 * t) \
        + 250 * rng.standard_normal(2 * T)
    # a 40-sample burst (several chained detections at the minimum
    # skip-ahead gap) plus a pair 20 samples apart (inside the
    # order+il=43 dependency window but in separate repair windows)
    sig[900:940] += 20000 * rng.choice([-1.0, 1.0], 40)
    sig[2600] += 25000
    sig[2620] -= 25000
    sig = sig.astype(np.float32)

    o = WildNBOracle(5.0, 32, 11)
    want = np.concatenate([o.process(sig[i * T:(i + 1) * T]
                                     .astype(np.float64))
                           for i in range(2)])
    p = make_nb_params(5.0, 32, 11)
    st = init_nb_state(1, p)
    outs = []
    for i in range(2):
        st, y = nb_process(st, p, jnp.asarray(sig[None, i * T:(i + 1) * T]))
        outs.append(np.asarray(y)[0])
    got = np.concatenate(outs)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    # the burst was actually blanked (not just attenuated noise floor)
    assert np.abs(got[900:940]).max() < np.abs(sig[900:940]).max() / 2


def test_nb_pipeline_smoke():
    """nr_algo='nb' compiles into the hop pipeline."""
    from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

    cfg = config_from_dict({
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 256,
            "nr": True, "nr_algo": "nb", "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 2},
    })
    pipe = HopPipeline(cfg)
    l = np.full(2, 100)
    table = channels_from_numpy(l=l, r=l + 20, m_idx=l + 10, mode=[2, 2],
                                active=np.ones(2, bool), nr=[True, False])
    rng = np.random.default_rng(0)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    state = pipe.init_state()
    for _ in range(3):
        raw = rng.integers(-20000, 20000, n, dtype=np.int16)
        state, out = pipe.step(state, jnp.asarray(raw), table,
                               waterfall="off")
    assert np.isfinite(np.asarray(out.avg_power)).all()
