"""Golden tests: batched channelizer/demod + DC/AGC vs the NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from phantomsdr_tpu.ops import channelizer as ch
from phantomsdr_tpu.ops import agc as agcops
from tests import oracle

MODES = {"USB": ch.MODE_USB, "LSB": ch.MODE_LSB, "AM": ch.MODE_AM, "FM": ch.MODE_FM}


def make_stream(r, n_samples, tones, sps):
    t = np.arange(n_samples) / sps
    x = 0.02 * (r.standard_normal(n_samples) + 1j * r.standard_normal(n_samples))
    for f, amp in tones:
        x = x + amp * np.exp(2j * np.pi * f * t)
    return x.astype(np.complex64)


@pytest.mark.parametrize("mode", ["USB", "LSB", "AM", "FM"])
@pytest.mark.parametrize("is_real", [False, True])
def test_demodulate_matches_oracle(mode, is_real):
    r = np.random.default_rng(hash((mode, is_real)) % 2**31)
    n = 4096
    rsize = n // 2 if is_real else n
    base_idx = 0 if is_real else n // 2 + 1
    a = 256
    half = a // 2
    num_hops = 6

    # channel layout: a band somewhere mid-spectrum plus one crossing DC (IQ)
    chans_py = [
        dict(l=900, r=900 + 200, mid=1000.0),
        dict(l=301, r=301 + a, mid=301.0 + a / 2),
    ]
    if not is_real:
        chans_py.append(dict(l=rsize - 60, r=rsize - 60 + 120, mid=float(rsize - 60 + 60)))
    c = len(chans_py)

    table = ch.ChannelTable(
        l=jnp.asarray([d["l"] for d in chans_py], jnp.int32),
        r=jnp.asarray([d["r"] for d in chans_py], jnp.int32),
        m_idx=jnp.asarray([int(np.floor(d["mid"])) for d in chans_py], jnp.int32),
        mode=jnp.full((c,), MODES[mode], jnp.int32),
        active=jnp.ones((c,), bool),
    )
    state = ch.init_channel_state(c, a)
    orcs = [oracle.OracleChannel(a, is_real, rsize) for _ in range(c)]

    for frame in range(num_hops):
        if is_real:
            x = r.standard_normal(n).astype(np.float32)
        else:
            x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(np.complex64) * 0.3
        spec = oracle.forward_spectrum(x, is_real)
        ext = oracle.extend_spectrum(spec, is_real, rsize, a)

        state, audio, pwr = ch.demodulate(
            jnp.asarray(ext), table, state, jnp.int32(frame),
            audio_fft_size=a, fft_result_size=rsize,
            base_idx=base_idx, is_real=is_real,
        )
        audio = np.asarray(audio)
        pwr = np.asarray(pwr)

        for i, d in enumerate(chans_py):
            start = (d["l"] + base_idx) % rsize
            buf = ext[start:]
            want, want_pwr = orcs[i].send_audio(
                buf, frame, d["l"], d["r"], d["mid"], mode
            )
            scale = max(np.abs(want).max(), 1e-3)
            np.testing.assert_allclose(
                audio[i], want, atol=2e-4 * scale + 1e-5, rtol=0,
                err_msg=f"mode={mode} chan={i} frame={frame}",
            )
            np.testing.assert_allclose(pwr[i], want_pwr, rtol=2e-4, atol=1e-6)


def test_dc_blocker_matches_oracle():
    r = np.random.default_rng(7)
    d = 32
    c, l = 3, 128
    st = agcops.init_dc_state(c, d)
    orcs = [oracle.OracleDCBlocker(d) for _ in range(c)]
    x0 = (r.standard_normal((c, l * 4)) + 0.5).astype(np.float32)
    outs = []
    for blk in range(4):
        x = x0[:, blk * l : (blk + 1) * l]
        st, y = agcops.dc_blocker(st, jnp.asarray(x), d)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    for i in range(c):
        want = orcs[i].process(x0[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, atol=2e-5, rtol=0)


def test_agc_matches_oracle():
    r = np.random.default_rng(8)
    sr = 2000  # small sample rate -> small lookahead window for test speed
    params = agcops.make_agc_params(sr)
    w = params.window
    assert w == 400
    c, l = 2, 96
    nblk = 12  # 1152 samples > w
    st = agcops.init_agc_state(c, w)
    x0 = (0.3 * r.standard_normal((c, l * nblk))).astype(np.float32)
    x0[:, ::37] *= 5.0  # peaks to exercise attack path
    orc = [oracle.OracleAGC(sr=sr) for _ in range(c)]
    outs = []
    for blk in range(nblk):
        x = x0[:, blk * l : (blk + 1) * l]
        st, y = agcops.agc_process(st, jnp.asarray(x), params)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    for i in range(c):
        want = orc[i].process(x0[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, atol=1e-4, rtol=1e-4)


def test_float_to_int16():
    x = np.array([-3.0, -2.0001, -1.0, -0.5, 0.0, 0.4999, 0.5, 1.0, 2.5],
                 np.float32) / 16384 * 16384  # identity, explicit values
    x = np.array([0.0, 1e-5, -1e-5, 0.1, -0.1, 1.9999, 2.0, -2.0, 5.0, -5.0],
                 np.float32)
    got = np.asarray(ch.float_to_int16(jnp.asarray(x)))
    want = oracle.float_to_int16(x)
    np.testing.assert_array_equal(got, want)


def test_demodulate_batch_matches_per_hop_scan():
    """demodulate_batch (the production path: hop-batched gathers/IFFTs,
    overlap-add and FM seeds as in-batch shifts) must match scanning
    demodulate() hop by hop -- including across a step boundary and with
    the AM-sync PLL engaged."""
    import jax
    from phantomsdr_tpu.ops.channelizer import (
        ChannelTable, init_channel_state, demodulate, demodulate_batch,
    )

    a = 64
    rsz = 1024
    c = 6
    b = 5
    rng = np.random.default_rng(5)
    l = rng.integers(0, rsz - 200, c).astype(np.int32)
    width = rng.integers(40, 160, c).astype(np.int32)
    chans = ChannelTable(
        l=jnp.asarray(l), r=jnp.asarray(l + width),
        m_idx=jnp.asarray(l + width // 2),
        mode=jnp.asarray([0, 1, 2, 3, 2, 0], jnp.int32),
        active=jnp.ones(c, bool))

    def spec(seed):
        r = np.random.default_rng(seed)
        s = (r.standard_normal((b, rsz + a))
             + 1j * r.standard_normal((b, rsz + a))) * 0.1
        return jnp.asarray(s.astype(np.complex64))

    for am_sync in (False, True):
        kw = dict(audio_fft_size=a, fft_result_size=rsz, base_idx=513,
                  is_real=False, am_sync=am_sync,
                  carrier_cutoff=3)
        st_a = init_channel_state(c, a)
        st_b = init_channel_state(c, a)
        for step, seed in enumerate((1, 2)):
            se = spec(seed)
            f0 = jnp.int32(step * b)
            # reference: per-hop scan
            audio_ref, pwr_ref = [], []
            for h in range(b):
                st_a, au, pw = demodulate(se[h], chans, st_a, f0 + h, **kw)
                audio_ref.append(np.asarray(au))
                pwr_ref.append(np.asarray(pw))
            st_b, audio_b, pwr_b = demodulate_batch(se, chans, st_b, f0,
                                                    **kw)
            np.testing.assert_allclose(np.asarray(audio_b),
                                       np.stack(audio_ref),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(pwr_b),
                                       np.stack(pwr_ref),
                                       rtol=1e-5, atol=1e-6)
        # carried state identical too
        for x, y in zip(jax.tree_util.tree_leaves(st_a),
                        jax.tree_util.tree_leaves(st_b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)


def test_demodulate_batch_fusion_barriers_identity():
    """fusion_barriers (auto-on above 1024 channels: the round-4
    scaling fix, PERF.md) must be bit-identical to the unbarriered
    path -- optimization_barrier only constrains scheduling."""
    import jax
    import jax.numpy as jnp
    from phantomsdr_tpu.ops.channelizer import (
        ChannelTable, init_channel_state, demodulate_batch,
        extend_spectrum,
    )

    a, rsz, c, b = 64, 1024, 8, 4
    rng = np.random.default_rng(11)
    l = rng.integers(0, rsz - 200, c).astype(np.int32)
    width = rng.integers(40, 160, c).astype(np.int32)
    chans = ChannelTable(
        l=l, r=(l + width).astype(np.int32),
        m_idx=(l + width // 2).astype(np.int32),
        mode=(np.arange(c) % 4).astype(np.int32),
        active=np.ones(c, bool))
    st = init_channel_state(c, a)
    spec = (rng.standard_normal((b, rsz))
            + 1j * rng.standard_normal((b, rsz))).astype(np.complex64)
    se = extend_spectrum(jnp.asarray(spec), False, rsz, a)
    outs = []
    for fb in (False, True):
        s2, audio, pwr = demodulate_batch(
            se, chans, st, jnp.int32(3), audio_fft_size=a,
            fft_result_size=rsz, base_idx=rsz // 2 + 1, is_real=False,
            am_sync=True, fusion_barriers=fb)
        outs.append((np.asarray(audio), np.asarray(pwr),
                     [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(s2)]))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    for x, y in zip(outs[0][2], outs[1][2]):
        np.testing.assert_array_equal(x, y)
