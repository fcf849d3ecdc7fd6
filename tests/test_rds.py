"""Server-side FM-RDS decoding (ops/rds.py + runtime/rds.py + wiring).

The reference decodes RDS in the browser (jsdsp/redsea.js, the redsea
WASM build); here the 57 kHz subcarrier DSP runs on device for every
listener at once and the protocol half runs on the encode pool.  These
tests pin:
- the (26,16) block code round trip and error detection,
- the group parser (PI/PS/RadioText assembly) on clean bitstreams,
- the full DSP+protocol chain on a synthesized MPX, at both carrier
  phase conventions the standard allows (in-phase and quadrature with
  the pilot's third harmonic),
- the pipeline wiring: per-listener gating, packed-buffer round trip,
  and a full FM-modulated IQ capture decoded end-to-end through
  HopPipeline.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phantomsdr_tpu.config import config_from_dict
from phantomsdr_tpu.ops.rds import (
    MIN_BASEBAND_SPS, make_rds_params, init_rds_state, rds_decim_for,
    rds_process,
)
from phantomsdr_tpu.runtime.rds import (
    OFFSET_A, OFFSET_B, OFFSET_C, OFFSET_CP, OFFSET_D,
    RDSDecoder, RDSGroupDecoder, encode_block, syndrome,
)
from phantomsdr_tpu.pipeline import HopPipeline, channels_from_numpy

FS = 192000
PI = 0x54A7
PS = "PHANTOM!"
RT = "TPU SPECTRUM SERVER RADIOTEXT"


# ---------------------------------------------------------- synthesis

def _group_bits(pi=PI, ps=PS, rt=RT):
    """Clean RDS bitstream: 0A (PS) + 2A (RadioText) groups."""
    blocks = []
    for seg in range(4):
        b = (0 << 12) | (9 << 5) | seg
        d = (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])
        blocks += [(pi, OFFSET_A), (b, OFFSET_B), (0xE0E0, OFFSET_C),
                   (d, OFFSET_D)]
    text = (rt + "\r").ljust(64)[:64]
    for seg in range(16):
        b = (2 << 12) | (9 << 5) | seg
        c = (ord(text[4 * seg]) << 8) | ord(text[4 * seg + 1])
        d = (ord(text[4 * seg + 2]) << 8) | ord(text[4 * seg + 3])
        blocks += [(pi, OFFSET_A), (b, OFFSET_B), (c, OFFSET_C),
                   (d, OFFSET_D)]
    bits = []
    for data, off in blocks:
        w = encode_block(data, off)
        bits += [(w >> i) & 1 for i in range(25, -1, -1)]
    return bits


def _diff_encode(bits):
    out, prev = [], 0
    for u in bits:
        prev ^= u
        out.append(prev)
    return out


def _rds_wave(n, fs=FS, phase_off=0.0, bit_offset=0.0):
    """Differentially-encoded biphase RDS waveform at 1187.5 bps on the
    57 kHz subcarrier (3x a coherent 19 kHz pilot), amplitude 1.
    bit_offset shifts the data timing in BITS (0.5 = start mid-bit, the
    pairing parity the symbol-timing loop must detect and correct)."""
    tx = _diff_encode(_group_bits() * 40)
    pos = np.arange(n) * 1187.5 / fs + bit_offset
    k = pos.astype(int)
    sign = np.where(np.array([tx[i % len(tx)] for i in k]), 1.0, -1.0)
    d = sign * np.sin(2 * np.pi * (pos - k))
    th = 2 * np.pi * 19000.0 * np.arange(n) / fs
    return d * np.cos(3 * th + phase_off), th


def _mpx(n, fs=FS, phase_off=0.0, rds_amp=0.06, bit_offset=0.0):
    """FM MPX: mono + 9% pilot + stereo DSB + RDS subcarrier."""
    t = np.arange(n) / fs
    d, th = _rds_wave(n, fs, phase_off, bit_offset)
    L = np.sin(2 * np.pi * 800.0 * t)
    R = np.sin(2 * np.pi * 1300.0 * t)
    x = (0.4 * (L + R) / 2 + 0.09 * np.cos(th)
         + 0.4 * (L - R) / 2 * np.cos(2 * th) + rds_amp * d)
    return x.astype(np.float32)


# ----------------------------------------------------- protocol layer

def test_block_code_roundtrip():
    """Syndrome of a clean offset-XORed block equals the offset word
    (IEC 62106: the check doubles as the sync marker); any single-bit
    error destroys it."""
    rng = np.random.default_rng(0)
    for off in (OFFSET_A, OFFSET_B, OFFSET_C, OFFSET_CP, OFFSET_D):
        for _ in range(20):
            data = int(rng.integers(0, 1 << 16))
            w = encode_block(data, off)
            assert syndrome(w) == off
            assert (w >> 10) & 0xFFFF == data
            bit = int(rng.integers(0, 26))
            assert syndrome(w ^ (1 << bit)) != off


def test_group_decoder_clean_bitstream():
    """Feeding the raw (already differential-decoded) bitstream with an
    arbitrary bit-offset prefix: sync acquires, PI/PS/RT assemble, zero
    block errors."""
    dec = RDSGroupDecoder()
    bits = _group_bits()
    dec.push_bits([0, 1, 0] + bits * 2)
    s = dec.status()
    assert s["synced"] and s["block_errors"] == 0
    assert s["pi"] == f"{PI:04X}"
    assert s["ps"] == PS.rstrip("!") + "!"
    assert s["rt"] == RT
    assert s["pty"] == 9


def test_radiotext_cr_truncates_tail():
    """A 0x0D in RadioText terminates the message (IEC 62106): when a
    station shortens its text WITHOUT toggling the A/B flag, the old
    tail must be blanked, not displayed forever."""
    dec = RDSGroupDecoder()
    dec.push_bits(_group_bits(rt="A VERY LONG OLD MESSAGE HERE") * 2)
    assert dec.status()["rt"] == "A VERY LONG OLD MESSAGE HERE"
    # same A/B flag, shorter message terminated by CR; only segments up
    # to the CR are transmitted (like a real station)
    blocks = []
    text = "SHORT\r"
    nseg = (len(text) + 3) // 4
    for seg in range(nseg):
        chunk = (text + "    ")[4 * seg: 4 * seg + 4]
        b = (2 << 12) | (9 << 5) | seg
        c = (ord(chunk[0]) << 8) | ord(chunk[1])
        d = (ord(chunk[2]) << 8) | ord(chunk[3])
        blocks += [(PI, OFFSET_A), (b, OFFSET_B), (c, OFFSET_C),
                   (d, OFFSET_D)]
    bits = []
    for data, off in blocks:
        w = encode_block(data, off)
        bits += [(w >> i) & 1 for i in range(25, -1, -1)]
    dec.push_bits(bits * 2)
    assert dec.status()["rt"] == "SHORT"


def test_group_decoder_resync_after_noise():
    """A burst of garbage drops sync; the decoder re-acquires on the
    next clean stream and keeps the PI."""
    dec = RDSGroupDecoder()
    bits = _group_bits()
    dec.push_bits(bits)
    assert dec.status()["synced"]
    rng = np.random.default_rng(1)
    dec.push_bits(list(rng.integers(0, 2, 26 * 40)))
    dec.push_bits(bits)
    s = dec.status()
    assert s["synced"] and s["pi"] == f"{PI:04X}"


# ------------------------------------------------------ DSP chain

@pytest.mark.parametrize("phase_off,bit_offset", [
    (0.0, 0.0), (np.pi / 2, 0.0),
    # start MID-BIT: the first symbol strobe lands on the second half
    # of a bit, so the biphase pairing begins at the WRONG parity and
    # the transition-strength comparator must flip it (for balanced
    # data the wrong parity converges to q_flip/q_keep -> 2.0 from
    # BELOW -- a `> 2.0` threshold never fires; this pins the
    # in-(0.5, 2.0) threshold that makes half of real activations work)
    (0.0, 0.5),
])
def test_rds_full_chain(phase_off, bit_offset):
    """MPX -> device 57 kHz downmix (chunked, state carried) -> host
    symbol/block/group decode recovers PI, PS and RadioText with zero
    block errors -- at both subcarrier phase conventions (the host's
    squaring carrier estimator resolves the constant) and at both
    biphase pairing parities."""
    import jax

    p = make_rds_params(FS, half=4096)
    assert FS / p.decim >= MIN_BASEBAND_SPS
    chunk = 12288
    n = int(FS * 4.5) // chunk * chunk
    x = _mpx(n, phase_off=phase_off, bit_offset=bit_offset)
    st = init_rds_state(1, p)
    proc = jax.jit(lambda s, xx: rds_process(s, p, xx, jnp.array([True])))
    dec = RDSDecoder(FS / p.decim)
    for i in range(0, n, chunk):
        st, bb = proc(st, jnp.asarray(x[None, i:i + chunk]))
        dec.feed(np.asarray(bb)[0])
    s = dec.group.status()
    assert s["synced"], s
    assert s["pi"] == f"{PI:04X}", s
    assert s["ps"] == PS, s
    assert s["rt"] == RT, s


def test_rds_masked_rows_zero():
    """Rows with fm_mask False produce exactly zero baseband (inactive
    or non-FM listeners must not leak bytes)."""
    p = make_rds_params(FS, half=4096)
    x = _mpx(8192)
    st = init_rds_state(2, p)
    st, bb = rds_process(st, p, jnp.asarray(np.stack([x, x])),
                         jnp.array([True, False]))
    bb = np.asarray(bb)
    assert np.any(bb[0])
    assert not np.any(bb[1])


# -------------------------------------------------------- config

def test_nb_config_validation():
    """nb_samples=1 would make the repair crossfade divide by zero
    (ops/nb.py weights use il-1) and NaN every NB listener's audio;
    the config must reject it, and out-of-range LPC orders too."""
    base = {
        "input": {
            "sps": 192000, "frequency": 7000000, "fft_size": 2048,
            "signal": "iq", "audio_sps": 12000, "waterfall_size": 256,
            "nr": True, "nr_algo": "nb", "driver": {"format": "s16"},
        },
        "tpu": {"hop_batch": 2, "max_channels": 2},
    }
    config_from_dict({**base})  # defaults fine
    for bad in ({"nb_samples": 1}, {"nb_taps": 0}, {"nb_taps": 41}):
        with pytest.raises(ValueError, match="nb_"):
            config_from_dict(
                {**base, "input": {**base["input"], **bad}})


def test_rds_config_validation():
    base = {
        "input": {
            "sps": 1_536_000, "frequency": 98_000_000, "fft_size": 4096,
            "signal": "iq", "audio_sps": 48000, "waterfall_size": 512,
            "rds": True, "driver": {"format": "s16"},
            "defaults": {"frequency": 98_000_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 4, "max_channels": 2},
    }
    # 48 kHz audio cannot carry the 57 kHz subcarrier
    with pytest.raises(ValueError, match="rds"):
        config_from_dict(base)
    ok = {**base, "input": {**base["input"], "audio_sps": 192000}}
    cfg = config_from_dict(ok)
    assert cfg.rds
    # decimation must divide the per-hop audio block
    d = rds_decim_for(cfg.audio_sps, cfg.audio_fft_size // 2)
    assert (cfg.audio_fft_size // 2) % d == 0
    assert cfg.audio_sps / d >= MIN_BASEBAND_SPS


# ------------------------------------------------------- pipeline

def _pipe_cfg(**extra):
    return config_from_dict({
        "input": {
            "sps": 1_536_000, "frequency": 98_000_000, "fft_size": 4096,
            "signal": "iq", "audio_sps": 192000, "waterfall_size": 512,
            "rds": True, "driver": {"format": "s16"},
            "defaults": {"frequency": 98_000_000, "modulation": "WBFM"},
            **extra,
        },
        "tpu": {"hop_batch": 16, "max_channels": 2},
    })


def test_rds_pipeline_gating_and_packing():
    """HopPipeline with rds=true: out.rds is [C, 2, rds_t]; only the
    FM row that opted in produces baseband; the packed single-fetch
    buffer round-trips it bit-exactly (unpack_outputs)."""
    from phantomsdr_tpu.pipeline import unpack_outputs

    cfg = _pipe_cfg()
    pipe = HopPipeline(cfg)
    half = cfg.audio_fft_size // 2
    assert pipe.rds_t == cfg.hop_batch * half // pipe.rds_params.decim
    mid = cfg.fft_result_size // 2
    table = channels_from_numpy(
        l=[mid - half // 2] * 2, r=[mid + half // 2] * 2, m_idx=[mid] * 2,
        mode=[3, 3], active=[True, True], rds=[True, False])
    rng = np.random.default_rng(0)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    state = pipe.init_state()
    out = None
    for _ in range(15):  # AGC look-ahead window fill (~10 steps of B*half)
        raw = rng.integers(-20000, 20000, n, dtype=np.int16)
        state, out = pipe.step(state, jnp.asarray(raw), table,
                               waterfall="off")
        if np.any(np.asarray(out.rds)):
            break
    rds = np.asarray(out.rds)
    assert rds.shape == (2, 2, pipe.rds_t)
    assert np.any(rds[0]) and not np.any(rds[1])
    audio, pwr, wf, rds2 = unpack_outputs(
        np.asarray(out.packed), cfg.hop_batch, 2, half, 0, 1,
        cfg.view_cap, rds_t=pipe.rds_t)
    np.testing.assert_array_equal(rds2, rds)
    np.testing.assert_array_equal(audio, np.asarray(out.audio))


def test_rds_sharded_matches_single_device():
    """RDS on the 8-device mesh: the [C]-leading RDS carries (bandpass
    /MPX tails, PLL phase/freq, folded decimator tail) shard over the
    channel axis like every other audio-state leaf; the int8 baseband
    must match single-device bit-exactly."""
    import jax

    from phantomsdr_tpu.parallel import ShardedHopPipeline, make_mesh

    n_dev = min(8, len(jax.devices()))
    assert n_dev == 8
    cfg = config_from_dict({
        "input": {
            "sps": 1_536_000, "frequency": 98_000_000, "fft_size": 4096,
            "signal": "iq", "audio_sps": 192000, "waterfall_size": 512,
            "rds": True, "driver": {"format": "s16"},
            "defaults": {"frequency": 98_000_000, "modulation": "WBFM"},
        },
        "tpu": {"hop_batch": 2 * n_dev, "max_channels": n_dev},
    })
    pipe = HopPipeline(cfg)
    sp = ShardedHopPipeline(cfg, make_mesh(n_dev))
    c = cfg.max_channels
    half = cfg.audio_fft_size // 2
    mid = cfg.fft_result_size // 2
    table = channels_from_numpy(
        l=np.full(c, mid - half // 2), r=np.full(c, mid + half // 2),
        m_idx=np.full(c, mid), mode=np.full(c, 3),
        active=np.ones(c, bool),
        rds=(np.arange(c) % 2 == 0))  # alternate opt-in
    rng = np.random.default_rng(7)
    b, wph = cfg.hop_batch, pipe.wire_per_hop
    nsteps = 10  # past the AGC look-ahead window fill
    raw = rng.integers(-20000, 20000, size=(nsteps * b + 1) * wph,
                       dtype=np.int16)
    st1, st8 = pipe.init_state(), sp.init_state()
    halo = np.zeros(wph, np.int16)
    for s in range(nsteps):
        blk = raw[wph + s * b * wph: wph + (s + 1) * b * wph]
        st1, o1 = pipe.step(st1, jnp.asarray(np.concatenate([halo, blk])),
                            table, waterfall="off")
        halo = blk[-wph:]
        st8, o8 = sp.step(st8, jnp.asarray(sp.shard_raw(blk)), table,
                          waterfall="off")
        r1, r8 = np.asarray(o1.rds), np.asarray(o8.rds)
        assert r1.shape == (c, 2, pipe.rds_t)
        np.testing.assert_array_equal(r1, r8)
    assert np.any(np.asarray(o1.rds)[0])       # opted-in FM row ran
    assert not np.any(np.asarray(o1.rds)[1])   # non-opted row zeroed


def test_rds_stage_skipped_without_listeners():
    """With [input] rds=true but no opted-in listener, the whole device
    stage is skipped (lax.cond): output rows are zero and the RDS
    carries do not advance (the PLL phase would move every step if the
    scan ran).  Opting in engages the stage."""
    cfg = _pipe_cfg()
    pipe = HopPipeline(cfg)
    half = cfg.audio_fft_size // 2
    mid = cfg.fft_result_size // 2

    def tbl(rds_flags):
        return channels_from_numpy(
            l=[mid - half // 2] * 2, r=[mid + half // 2] * 2,
            m_idx=[mid] * 2, mode=[3, 3], active=[True, True],
            rds=rds_flags)

    rng = np.random.default_rng(1)
    n = cfg.hop_size * (cfg.hop_batch + 1) * 2
    state = pipe.init_state()
    raw = rng.integers(-20000, 20000, n, dtype=np.int16)
    state, out = pipe.step(state, jnp.asarray(raw), tbl([False, False]),
                           waterfall="off")
    assert not np.any(np.asarray(out.rds))
    np.testing.assert_array_equal(np.asarray(state.audio.rds.phase), 0.0)
    state, _ = pipe.step(state, jnp.asarray(raw), tbl([True, False]),
                         waterfall="off")
    assert np.any(np.asarray(state.audio.rds.phase) != 0.0)


def test_rds_server_protocol():
    """Serving edge: basic_info advertises rds_available, the
    {"cmd":"rds"} opt-in flips the registry column, dispatch routes the
    device baseband to the listener's decoder on its affine encode
    worker, and the client receives {"type":"rds"} JSON text frames
    with the recovered PI/PS."""
    import asyncio
    import json

    from aiohttp import WSMsgType
    from aiohttp.test_utils import TestClient, TestServer

    from phantomsdr_tpu.runtime.server import SpectrumServer

    cfg = _pipe_cfg()
    server = SpectrumServer(cfg)

    async def scenario():
        ts = TestServer(server.app)
        client = TestClient(ts)
        await client.start_server()
        ws = await client.ws_connect("/audio")
        info = json.loads((await ws.receive(timeout=5)).data)
        assert info["rds_available"] is True
        await ws.send_str(json.dumps({"cmd": "rds", "enabled": True}))
        await asyncio.sleep(0.1)  # command handled on the event loop
        slot_id = next(iter(server.channels.slots))
        assert server.channels.rds[slot_id]
        conn = server.audio_conns[slot_id]
        assert conn.rds_decoder is not None

        # device-op baseband for a synthetic MPX, dispatched in chunks
        import jax

        p = make_rds_params(cfg.audio_sps, cfg.audio_fft_size // 2)
        n = int(cfg.audio_sps * 3.0)
        x = _mpx(n, fs=cfg.audio_sps)
        st = init_rds_state(1, p)
        proc = jax.jit(
            lambda s, xx: rds_process(s, p, xx, jnp.array([True])))
        b, c = cfg.hop_batch, cfg.max_channels
        half = cfg.audio_fft_size // 2
        audio = np.zeros((b, c, half), np.int16)
        pwr = np.zeros((b, c), np.float32)
        chunk = b * half
        for i in range(0, n - chunk, chunk):
            st, bb = proc(st, jnp.asarray(x[None, i:i + chunk]))
            rds = np.zeros((c, 2, bb.shape[-1]), np.int8)
            rds[slot_id] = np.asarray(bb)[0]
            server.dispatch(0, audio, pwr, None, [], rds=rds)
            await asyncio.sleep(0)  # let the loop post finished frames
        got = None
        deadline = asyncio.get_event_loop().time() + 10
        while asyncio.get_event_loop().time() < deadline:
            msg = await ws.receive(timeout=10)
            if msg.type == WSMsgType.TEXT:
                d = json.loads(msg.data)
                if d.get("type") == "rds" and d.get("ps") == PS:
                    got = d
                    break
        assert got is not None
        assert got["pi"] == f"{PI:04X}"
        assert got["synced"] and got["block_errors"] == 0

        # retune: the protocol decoder must be replaced (stale PI/PS/RT
        # must not be reported as the new station's data)
        old_dec = conn.rds_decoder
        mid2 = cfg.fft_result_size // 2
        await ws.send_str(json.dumps({
            "cmd": "window", "l": mid2 - 100, "m": mid2,
            "r": mid2 + 100}))
        await asyncio.sleep(0.1)
        assert conn.rds_decoder is not old_dec

        # opt back out: decoder dropped, column cleared
        await ws.send_str(json.dumps({"cmd": "rds", "enabled": False}))
        await asyncio.sleep(0.1)
        assert not server.channels.rds[slot_id]
        assert conn.rds_decoder is None
        await ws.close()
        await client.close()

    asyncio.run(scenario())


def test_rds_end_to_end_through_pipeline():
    """Full path: FM-modulated IQ capture with an RDS MPX -> convert ->
    FFT -> channelize -> WBFM demod -> DC/AGC -> device RDS downmix ->
    host decoder recovers the PI and PS through the REAL hop pipeline."""
    cfg = _pipe_cfg()
    pipe = HopPipeline(cfg)
    half = cfg.audio_fft_size // 2

    # FM-modulate the MPX at the input rate, carrier at display mid
    fs_in = cfg.sps
    secs = 4.0
    n_in = int(fs_in * secs)
    up = int(round(fs_in / FS))                 # 1.536M / 192k = 8
    mpx = _mpx(n_in // up + 1)
    mpx_up = np.repeat(mpx, up)[:n_in]          # staircase upsample: the
    # images sit at multiples of 192 kHz, outside the +-96 kHz channel
    dev = 35000.0                               # Hz peak deviation
    phase = 2 * np.pi * np.cumsum(dev * mpx_up) / fs_in
    iq = np.exp(1j * phase)
    s = np.empty(2 * n_in, np.int16)
    s[0::2] = np.round(iq.real * 20000).astype(np.int16)
    s[1::2] = np.round(iq.imag * 20000).astype(np.int16)

    mid = cfg.fft_result_size // 2              # DC of the IQ input
    table = channels_from_numpy(
        l=[mid - half // 2, 0], r=[mid + half // 2, 0],
        m_idx=[mid, 0], mode=[3, 0], active=[True, False],
        rds=[True, False])
    dec = RDSDecoder(cfg.audio_sps / pipe.rds_params.decim)
    state = pipe.init_state()
    wph = pipe.wire_per_hop
    blk = cfg.hop_batch * wph
    halo = np.zeros(wph, np.int16)
    for i in range(0, 2 * n_in - blk, blk):
        raw = np.concatenate([halo, s[i:i + blk]])
        halo = s[i + blk - wph:i + blk]
        state, out = pipe.step(state, jnp.asarray(raw), table,
                               waterfall="off")
        dec.feed(np.asarray(out.rds)[0])
    st = dec.group.status()
    assert st["synced"], st
    assert st["pi"] == f"{PI:04X}", st
    assert st["ps"] == PS, st
