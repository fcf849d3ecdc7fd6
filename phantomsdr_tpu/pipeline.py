"""The jitted hop pipeline: the TPU-native replacement for the
reference's FFT thread + per-client demod jobs.

The whole DSP engine is ONE pure function

    (HopState, raw_samples, ChannelTable) -> (HopState, HopOutputs)

executed in a host driver loop (SURVEY.md section 7's "hop function"
design stance).  One call processes ``hop_batch`` hops:

  raw wire ints -> on-device format convert -> 50%-overlap framing ->
  Hann window -> batched forward FFT (X/N) -> waterfall power/int8
  pyramid -> DC-wrap spectrum extension -> batched channel extraction +
  USB/LSB/AM/FM demod -> DC blocker -> look-ahead AGC -> int16 audio.

It replaces, in order: src/fft.cpp:10-119 (fft_task), src/fft_impl.cpp
(FFTW backend + quantize kernels), src/fft_cuda.cu (wholesale),
src/signal.cpp:102-298 (send_audio for every client at once),
src/utils.h:139-169 + src/utils/audioprocessing.cpp (DC/AGC),
src/utils/dsp.cpp (demod kernels).

Input convention: the host prepends the previous half-frame (the 50%
overlap halo, hop_size wire samples) to every raw block, so a block is
``(hop_batch + 1) * hop_size`` wire samples and the device carries no
sample history.  This is what makes time-sharding over a device mesh a
pure data-layout decision (see parallel/sharded.py): each time shard
receives its hops plus halo with no cross-shard sequential dependency.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import ServerConfig
from .ops import convert
from .ops.windows import hann_window
from .ops.fft import frame_hops, forward_spectrum
from .ops.quantize import (
    spectrum_power, roll_iq, waterfall_pyramid, pyramid_flat,
)
from .ops.channelizer import (
    ChannelTable, ChannelState, init_channel_state,
    extend_spectrum, demodulate_batch, float_to_int16,
)
from .ops.agc import (
    AGCParams, AGCState, DCBlockerState, dc_blocker, dc_blocker_delay,
    init_dc_state, agc_process, make_agc_params, init_agc_state,
)
from .ops.polyphase import (
    DecimatorState, init_decimator_state, decimator_taps, polyphase_decimate,
)
from .ops.stereo import (
    StereoParams, StereoState, make_stereo_params, init_stereo_state,
    stereo_decode, stereo_demix, pilot_bandpass, pilot_track, delay_stream,
)
from .ops.nr import (
    NRParams, NRState, make_nr_params, init_nr_state, nr_process,
)
from .ops.anr import (
    ANRParams, make_anr_params, init_anr_state, anr_process,
)
from .ops.nb import (
    NBParams, make_nb_params, init_nb_state, nb_process,
)
from .ops.rds import (
    RDSParams, RDSState, make_rds_params, init_rds_state, rds_process,
    rds_from_pilot,
)
from .ops.deemph import deemph_alpha, deemph_process
from .ops.channelizer import MODE_FM


class AudioState(NamedTuple):
    """All per-channel carries (rows sharded over the channel axis)."""

    chan: ChannelState
    dc: "DCBlockerState"
    agc: "AGCState"
    dec: "DecimatorState"   # polyphase filter tail ([C, 0] when no decim;
    #                         [2C, .] rows L0,R0,L1,R1,... with stereo)
    st: "StereoState"       # WBFM stereo carries (zero-width when off)
    nr: "NRState"           # noise-reduction carries: NRState (spectral)
    #                         or ANRState (lms/notch); zero-width when off
    rds: "RDSState"         # FM-RDS subcarrier carries (zero-width when off)
    de: jnp.ndarray         # [C*nch] FM de-emphasis IIR carry (y[-1] per
    #                         stream row; zeros at rest either way)


class HopState(NamedTuple):
    frame: jnp.ndarray       # scalar int32: global hop counter
    audio: AudioState


class WaterfallViews(NamedTuple):
    """Per-waterfall-client view table (device side of the host registry).

    Client w sees pyramid_flat[start[w] : start[w] + length[w]] where
    start already folds in the pyramid level offset.  Gathering the
    client *views* on device instead of shipping the whole int8 pyramid
    cuts the per-hop device->host transfer from O(2R) (~2 MB at 1M bins)
    to O(W * waterfall_size) (~100 KB at 100 clients) -- the same trick
    the batched channelizer plays for audio.
    """

    start: jnp.ndarray   # [W] int32 flat start (level offset + l)
    length: jnp.ndarray  # [W] int32 view length (r - l)


class HopOutputs(NamedTuple):
    audio: jnp.ndarray       # [B, C, A/2] int16 -- or, with device Opus
    #                          decimation, [C, B*A/2/decim] continuous
    #                          per-channel streams (see audio_from_spectra)
    avg_power: jnp.ndarray   # [B, C] f32
    wf: jnp.ndarray          # [D, W, view_cap] int8 client waterfall views
    #                          (D = due_cap gather rows; [0,...] when off)
    pyramid: jnp.ndarray     # [B, P] full int8 pyramid ('full' mode only)
    rds: jnp.ndarray         # [C, 2, T/decim] int8 RDS complex baseband
    #                          ([C, 2, 0] when [input] rds is off)
    packed: jnp.ndarray      # [X] int8: audio|avg_power|wf|rds
    #                          bitcast-packed into ONE buffer -- the
    #                          serving loop fetches only this (one
    #                          device->host transfer/step; the
    #                          remote-tunnel RTT makes per-leaf
    #                          fetches the dominant cost otherwise)


def pack_outputs(audio16: jnp.ndarray, pwr: jnp.ndarray,
                 wf: jnp.ndarray,
                 rds: jnp.ndarray | None = None) -> jnp.ndarray:
    a8 = jax.lax.bitcast_convert_type(audio16, jnp.int8).reshape(-1)
    p8 = jax.lax.bitcast_convert_type(pwr, jnp.int8).reshape(-1)
    parts = [a8, p8, wf.reshape(-1)]
    if rds is not None and rds.size:
        parts.append(rds.reshape(-1))
    return jnp.concatenate(parts)


def unpack_outputs(packed: "np.ndarray", b: int, c: int, half: int,
                   d: int, w: int, cap: int, decim: int = 1,
                   nch: int = 1, rds_t: int = 0):
    """Host-side inverse of pack_outputs (zero-copy numpy views).

    decim > 1 (device Opus decimation): audio is the per-channel
    continuous decimated stream [C, B*half/decim] instead of the
    per-hop framing [B, C, half].  nch=2 (device WBFM stereo): the last
    audio axis is L/R-interleaved and nch-times longer.  rds_t > 0
    ([input] rds): a trailing [C, 2, rds_t] int8 RDS baseband block
    (returned as the 4th element, else None)."""
    if decim > 1:
        ashape: tuple = (c, nch * b * half // decim)
    else:
        ashape = (b, c, nch * half)
    na = int(np.prod(ashape)) * 2
    np_ = b * c * 4
    nwf = d * w * cap
    audio = packed[:na].view(np.int16).reshape(ashape)
    pwr = packed[na:na + np_].view(np.float32).reshape(b, c)
    wf = packed[na + np_:na + np_ + nwf].view(np.int8).reshape(d, w, cap)
    rds = (packed[na + np_ + nwf:].view(np.int8).reshape(c, 2, rds_t)
           if rds_t else None)
    return audio, pwr, wf, rds


def opus_decim_taps(cfg: ServerConfig) -> np.ndarray | None:
    """Anti-alias prototype for the device Opus decimator (None when
    decimation is off or falls back to host)."""
    if not cfg.device_decim:
        return None
    return decimator_taps(cfg.opus_decim, taps_per_phase=12)


def stereo_params_for(cfg: ServerConfig) -> StereoParams | None:
    return make_stereo_params(cfg.audio_sps) if cfg.stereo else None


def rds_params_for(cfg: ServerConfig) -> RDSParams | None:
    return (make_rds_params(cfg.audio_sps, cfg.audio_fft_size // 2)
            if cfg.rds else None)


def deemph_alpha_for(cfg: ServerConfig) -> float | None:
    return (deemph_alpha(cfg.audio_sps, cfg.deemphasis)
            if cfg.deemphasis > 0 else None)


def nr_params_for(cfg: ServerConfig
                  ) -> NRParams | ANRParams | NBParams | None:
    """The configured processor's constants: NRParams (spectral, the
    default), ANRParams (wdsp LMS / auto-notch), or NBParams (Wild
    noise blanker)."""
    if not cfg.nr:
        return None
    if cfg.nr_algo == "nb":
        return make_nb_params(thresh=cfg.nb_thresh, taps=cfg.nb_taps,
                              samples=cfg.nb_samples)
    if cfg.nr_algo in ("lms", "notch"):
        return make_anr_params(notch=cfg.nr_algo == "notch",
                               taps=cfg.nr_taps, delay=cfg.nr_delay,
                               two_mu=cfg.nr_two_mu,
                               gamma=cfg.nr_leakage)
    return make_nr_params(cfg.audio_fft_size // 2,
                          final_gain=cfg.nr_gain, alpha=cfg.nr_alpha,
                          asnr_db=cfg.nr_asnr_db)


def init_audio_state(cfg: ServerConfig, num_channels: int,
                     agc_params: AGCParams, dc_delay: int) -> AudioState:
    taps = opus_decim_taps(cfg)
    num_taps = taps.shape[0] if taps is not None else 1
    sp = stereo_params_for(cfg)
    return AudioState(
        chan=init_channel_state(num_channels, cfg.audio_fft_size),
        dc=init_dc_state(num_channels, dc_delay),
        agc=init_agc_state(num_channels, agc_params.window),
        # stereo doubles the decimated stream rows (L/R interleaved by
        # channel: rows 2i, 2i+1)
        dec=init_decimator_state(num_channels * cfg.audio_channels,
                                 num_taps),
        st=init_stereo_state(num_channels, sp),
        nr=(init_nb_state(num_channels, nr_params_for(cfg))
            if cfg.nr and cfg.nr_algo == "nb"
            else init_anr_state(num_channels, nr_params_for(cfg))
            if cfg.nr and cfg.nr_algo in ("lms", "notch")
            else init_nr_state(num_channels,
                               cfg.audio_fft_size // 2 if cfg.nr else 0)),
        rds=init_rds_state(num_channels, rds_params_for(cfg)),
        de=jnp.zeros((num_channels * cfg.audio_channels,), jnp.float32),
    )


def spectra_from_raw(cfg: ServerConfig, window: jnp.ndarray,
                     raw: jnp.ndarray, num_hops: int) -> jnp.ndarray:
    """raw wire ints (with hop-size halo prepended) -> [B, R'] normalized
    spectra in natural FFT order."""
    x = convert.to_float(raw, cfg.input_format)
    if not cfg.is_real:
        x = convert.iq_to_complex(x)
    frames = frame_hops(x, num_hops, cfg.fft_size)
    return forward_spectrum(frames, window, cfg.is_real, cfg.fft_strategy)


def waterfall_from_spectra(cfg: ServerConfig, spec: jnp.ndarray) -> jnp.ndarray:
    """[B, R'] spectra -> [B, P] flat int8 waterfall pyramid."""
    pw = spectrum_power(spec[..., : cfg.fft_result_size])
    pw = roll_iq(pw, cfg.base_idx)
    return pyramid_flat(
        waterfall_pyramid(pw, cfg.downsample_levels, cfg.size_log2)
    )


def gather_waterfall_views(pyr_flat: jnp.ndarray, views: WaterfallViews,
                           view_cap: int) -> jnp.ndarray:
    """[D, P] flat pyramids + view table -> [D, W, view_cap] int8.

    Positions beyond a view's length are zero-filled; the host slices
    row[:length] before compression.
    """
    j = jnp.arange(view_cap, dtype=jnp.int32)                 # [cap]
    idx = views.start[:, None] + j[None, :]                   # [W, cap]
    valid = j[None, :] < views.length[:, None]
    idx = jnp.clip(idx, 0, pyr_flat.shape[-1] - 1)
    rows = pyr_flat[..., idx]                                 # [D, W, cap]
    return jnp.where(valid, rows, jnp.int8(0))


def waterfall_due_cap(cfg: ServerConfig) -> int:
    """Static row count of the device waterfall-view gather: the max
    number of hops in one batch that can land on the skip_num cadence
    (src/fft.cpp:33-34,100-105).  ceil(B / skip), at least 1."""
    return max(1, -(-cfg.hop_batch // cfg.skip_num))


def waterfall_due_positions(cfg: ServerConfig, frame0: int = 0) -> list[int]:
    """In-batch hop positions h with (frame0 + h) % skip_num == 0.

    May be empty (skip_num > hop_batch between due frames); the driver
    then runs the step with waterfall='off'.
    """
    skip = cfg.skip_num
    return [h for h in range(cfg.hop_batch) if (frame0 + h) % skip == 0]


def pad_due_positions(due: list[int], cap: int) -> list[int]:
    """Pad a (non-empty) due list to the static gather size by repeating
    the last position; consumers slice [:len(due)] rows."""
    return due + [due[-1]] * (cap - len(due))


def audio_from_spectra(
    cfg: ServerConfig,
    agc_params: AGCParams,
    dc_delay: int,
    audio_state: AudioState,
    spec_ext: jnp.ndarray,       # [B, R+A]
    chans: ChannelTable,
    frame0: jnp.ndarray,         # scalar int32: global index of hop 0
    reset: jnp.ndarray | None = None,  # [C] int32 RESET_* mask
    decim_taps: np.ndarray | None = None,  # device Opus decimation
    stereo_params: StereoParams | None = None,  # device WBFM stereo
    nr_params: NRParams | None = None,  # device spectral noise reduction
    rds_params: RDSParams | None = None,  # device FM-RDS subcarrier demod
    deemph_a: float | None = None,  # device FM de-emphasis pole
) -> tuple[AudioState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scan the batched demod + DC/AGC/int16 chain over B hops.

    Returns (state, audio16, avg_power, rds8) -- rds8 is the int8
    complex RDS baseband [C, 2, B*half/rds_decim] ([C, 2, 0] when
    rds_params is None).

    ``reset`` (int32 per runtime.registry.RESET_*): 1 = zero ALL of the
    slot's carries -- a slot newly (re)assigned to a listener; the
    reference allocates fresh per-client scratch on connect
    (src/signal.cpp:8-79), and with dense slot reuse the previous
    listener's carries must be zeroed exactly once.  2 = zero only the
    AGC state -- the reference's agc.reset() on every demodulation
    command (src/signal.cpp:315-328, utils/audioprocessing.cpp:70-74).
    """
    a = cfg.audio_fft_size
    b = spec_ext.shape[0]

    nch = 2 if stereo_params is not None else 1
    if reset is not None:
        def zero_rows(x, mask):
            m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(m, jnp.zeros((), x.dtype), x)
        full = reset == 1
        agc_too = reset >= 1
        # decimator rows are per STREAM (2 per channel with stereo)
        dec_full = jnp.repeat(full, nch) if nch > 1 else full
        audio_state = AudioState(
            chan=jax.tree.map(lambda x: zero_rows(x, full), audio_state.chan),
            dc=jax.tree.map(lambda x: zero_rows(x, full), audio_state.dc),
            agc=jax.tree.map(lambda x: zero_rows(x, agc_too), audio_state.agc),
            dec=jax.tree.map(lambda x: zero_rows(x, dec_full),
                             audio_state.dec),
            st=jax.tree.map(lambda x: zero_rows(x, full), audio_state.st),
            nr=jax.tree.map(lambda x: zero_rows(x, full), audio_state.nr),
            rds=jax.tree.map(lambda x: zero_rows(x, full), audio_state.rds),
            de=zero_rows(audio_state.de, dec_full),
        )

    # ---- batched demod: one gather + one batched IFFT for ALL hops;
    # overlap-add/FM seeds are in-batch shifts (see demodulate_batch) --
    # no per-hop scan on the demod path
    half = a // 2
    c = chans.l.shape[0]
    chan_st, audio_f, pwr = demodulate_batch(
        spec_ext, chans, audio_state.chan, frame0,
        audio_fft_size=a, fft_result_size=cfg.fft_result_size,
        base_idx=cfg.base_idx, is_real=cfg.is_real,
        am_sync=cfg.am_sync,
        carrier_cutoff=500 * a // cfg.audio_sps,  # signal.cpp:217
    )

    # ---- DC blocker + AGC over the batch's CONTINUOUS per-channel
    # stream (identical math to per-hop blocks: both ops carry state
    # across arbitrary block boundaries)
    stream = audio_f.transpose(1, 0, 2).reshape(c, b * half)
    dc_st, stream = dc_blocker(audio_state.dc, stream, dc_delay)
    agc_st, stream = agc_process(audio_state.agc, stream, agc_params)

    rds_st = audio_state.rds
    # With BOTH subcarrier opt-ins on, the 19 kHz pilot is bandpassed
    # and PLL-tracked ONCE here (the pre-NR tap) and the phase feeds
    # both the 38 kHz stereo demix and the 57 kHz RDS downmix -- the
    # transmitter derives both subcarriers from the same pilot
    # (jsdsp/src/wbfmpll.cpp:60-80), so two per-sample PLL scans over
    # the same pilot would be pure redundancy.  make_rds_params reuses
    # make_stereo_params, so bp_taps/delay/f_nom are identical and the
    # two states' pilot carries stay mirrored.
    pilot_ph = None
    if rds_params is not None:
        # FM-RDS subcarrier demod (the reference leaves this to the
        # browser's redsea WASM build, jsdsp/redsea.js): tap the
        # post-AGC MPX -- exactly the stream the reference ships to the
        # browser decoder -- BEFORE the optional noise processors,
        # whose spectral shaping would eat the 57 kHz subcarrier.  Only
        # FM listeners that sent {"cmd":"rds"} produce baseband; other
        # rows are zeroed on device.  With no RDS listener at all the
        # whole stage (a per-sample PLL lax.scan, the most serial op in
        # the step) is skipped via lax.cond; the carries then go stale
        # exactly like the reference's no-client FFT skip -- the next
        # listener's decoder resyncs from the stream, and a freshly
        # (re)used slot is zeroed by the RESET_FULL mask anyway.
        rds_col = (chans.rds if chans.rds is not None
                   else jnp.zeros((c,), bool))
        rds_on = chans.active & rds_col & (chans.mode == MODE_FM)
        t_out = stream.shape[-1] // rds_params.decim

        def _rds_skip_t(dt):
            # zeros derived from the (mesh-varying) stream so both cond
            # branches agree on the varying-axis type under shard_map
            z = jnp.zeros_like(stream[:, :1])[:, None, :]     # [C, 1, 1]
            return dt, jnp.broadcast_to(z, (c, 2, t_out)).astype(jnp.int8)

        if stereo_params is not None:
            # shared-pilot path: the stereo demix below needs the pilot
            # every step anyway, so the bandpass+PLL runs outside the
            # RDS cond and only the downmix/lowpass/decimate half is
            # skipped when no listener sent {"cmd":"rds"}.
            new_bp, y = pilot_bandpass(rds_st.bp_tail, rds_params.bp_taps,
                                       stream)
            new_mpx, xd = delay_stream(rds_st.mpx_tail, stream)
            phase, freq, pilot_ph = pilot_track(
                rds_st.phase, rds_st.freq, rds_params.f_nom, y)
            dec_tail, rds8 = jax.lax.cond(
                jnp.any(rds_on),
                lambda dt: rds_from_pilot(dt, rds_params, xd, pilot_ph,
                                          rds_on),
                _rds_skip_t, rds_st.dec_tail)
            rds_st = RDSState(bp_tail=new_bp, mpx_tail=new_mpx,
                              phase=phase, freq=freq, dec_tail=dec_tail)
        else:
            def _rds_run(st):
                return rds_process(st, rds_params, stream, rds_on)

            def _rds_skip(st):
                dt, z8 = _rds_skip_t(st.dec_tail)
                return st, z8

            rds_st, rds8 = jax.lax.cond(jnp.any(rds_on), _rds_run,
                                        _rds_skip, rds_st)
    else:
        rds8 = jnp.zeros((c, 2, 0), jnp.int8)

    nr_st = audio_state.nr
    if nr_params is not None:
        # Shared by all three processors: the browser applies NR to the
        # decoded int16-scale audio, so the op runs on the stream
        # lifted to the int16 domain (scale 65536/4, src/dsp.cpp:152)
        # where integer output rounding lands on the same grid; /scale
        # is exact (power of two), and float_to_int16 below then
        # reproduces the browser's rounded samples bit-for-bit.
        # chans.nr selects per listener.
        scale = jnp.float32(65536.0 / 4.0)
        nr_col = (chans.nr if chans.nr is not None
                  else jnp.zeros((c,), bool))
        nr_on = chans.active & nr_col
        lifted = stream * scale
        if isinstance(nr_params, NBParams):
            # Wild impulse blanker (jsdsp/lib/NB.c server-side,
            # ops/nb.py).  Skipped entirely when no listener opted in
            # (lax.cond, like the RDS stage): its state is only a raw
            # sample tail, there is nothing to keep warm.
            nr_st, den = jax.lax.cond(
                jnp.any(nr_on),
                lambda st: nb_process(st, nr_params, lifted),
                lambda st: (st, lifted), nr_st)
        elif isinstance(nr_params, ANRParams):
            # wdsp LMS NR / auto-notch (jsdsp/lib/ANR.c server-side,
            # ops/anr.py) -- a per-sample adaptive filter; with zero
            # opted-in listeners the whole scan is skipped (the
            # browser's filter also starts cold per listener, and
            # reused slots are zeroed by the reset mask anyway).
            nr_st, den = jax.lax.cond(
                jnp.any(nr_on),
                lambda st: anr_process(st, nr_params, lifted),
                lambda st: (st, lifted), nr_st)
        else:
            # spectral (jsdsp/lib/NR_spectral.c server-side, ops/nr.py):
            # runs for EVERY channel by design -- its noise-floor track
            # must stay warm across per-listener toggles.
            nr_st, den = nr_process(nr_st, nr_params, lifted, b)
        stream = jnp.where(nr_on[:, None], den / scale, stream)

    st_st = audio_state.st
    if stereo_params is not None:
        # device WBFM stereo (jsdsp/src/wbfmpll.cpp done server-side,
        # see ops/stereo.py): the post-AGC stream is exactly what the
        # reference ships to the browser's stereo decoder.  FM rows get
        # pilot-PLL stereo; other modes pass mono to both ears.
        fm_mask = chans.mode == MODE_FM
        if pilot_ph is not None:
            # reuse the pilot tracked at the RDS tap (see the
            # shared-pilot comment above); only the PLL phase is
            # shared, the mono/L-R path delays the stream with
            # stereo's own tail.  INVARIANT this relies on: both
            # consumers see the SAME stream the pilot was tracked on --
            # config.finalize rejects nr=true + stereo=true, so no
            # stage (spectral NR delays its rows by a half-frame)
            # can sit between the tap and the demix.  If that
            # restriction is ever lifted, the pilot phase would lead
            # an NR'd stream by half samples and wreck the 38 kHz
            # demix -- re-track (or delay-compensate) the pilot then.
            new_mono, xm = delay_stream(st_st.mono_tail, stream)
            s_l, s_r = stereo_demix(xm, pilot_ph, fm_mask)
            st_st = StereoState(bp_tail=rds_st.bp_tail,
                                mono_tail=new_mono,
                                phase=rds_st.phase, freq=rds_st.freq)
        else:
            st_st, s_l, s_r = stereo_decode(
                st_st, stereo_params, stream, fm_mask)
        stream = jnp.stack([s_l, s_r], axis=1).reshape(2 * c, b * half)

    de_st = audio_state.de
    if deemph_a is not None:
        # FM de-emphasis pole AFTER the RDS tap and stereo demix (the
        # pilot/38k/57k subcarriers must not see it; see ops/deemph.py)
        # and BEFORE decimation, on the per-stream rows
        fm_rows = chans.active & (chans.mode == MODE_FM)
        if nch > 1:
            fm_rows = jnp.repeat(fm_rows, nch)
        de_st, stream = deemph_process(de_st, deemph_a, stream, fm_rows)
    dec_st = audio_state.dec
    if decim_taps is not None:
        # device Opus decimation (replaces the reference's rate-clamp
        # wart, src/audio.cpp:59): anti-alias filter + decimate the
        # stream with the filter tail carried across steps.  The
        # per-hop framing is gone on purpose -- Opus frames span hops
        # anyway (src/audio.cpp:63-84's partial-frame queue).
        f = cfg.opus_decim
        dec_st, dec_out = polyphase_decimate(dec_st, stream, decim_taps, f)
        if nch > 1:  # [2C, T/f] -> [C, 2*T/f] interleaved L/R
            t2 = dec_out.shape[-1]
            dec_out = dec_out.reshape(c, 2, t2).transpose(0, 2, 1)
            dec_out = dec_out.reshape(c, 2 * t2)
        audio16 = float_to_int16(dec_out)             # [C, nch*B*half/f]
    elif nch > 1:
        # [2C, B*half] -> [B, C, 2*half] interleaved L/R per hop
        audio16 = float_to_int16(
            stream.reshape(c, 2, b, half).transpose(2, 0, 3, 1)
            .reshape(b, c, 2 * half))
    else:
        audio16 = float_to_int16(
            stream.reshape(c, b, half).transpose(1, 0, 2))  # [B, C, half]
    return (AudioState(chan=chan_st, dc=dc_st, agc=agc_st, dec=dec_st,
                       st=st_st, nr=nr_st, rds=rds_st, de=de_st),
            audio16, pwr, rds8)


class HopPipeline:
    """Single-device hop pipeline (the mesh-sharded variant lives in
    parallel/sharded.py and reuses the same building blocks)."""

    def __init__(self, cfg: ServerConfig):
        self.cfg = cfg
        self.window = hann_window(cfg.fft_size)
        self.agc_params = make_agc_params(cfg.audio_sps)
        self.dc_delay = dc_blocker_delay(cfg.audio_sps)
        self.num_channels = cfg.max_channels
        self.hop_batch = cfg.hop_batch
        # wire scalars per hop: H reals or 2H for IQ
        self.wire_per_hop = cfg.hop_size * (1 if cfg.is_real else 2)
        self.view_cap = cfg.view_cap
        self.due_cap = waterfall_due_cap(cfg)
        self.decim_taps = opus_decim_taps(cfg)  # host numpy; embeds in jit
        self.stereo_params = stereo_params_for(cfg)
        self.nr_params = nr_params_for(cfg)
        self.rds_params = rds_params_for(cfg)
        self.deemph_a = deemph_alpha_for(cfg)
        # RDS baseband samples per channel per step (0 when off)
        self.rds_t = (cfg.hop_batch * (cfg.audio_fft_size // 2)
                      // self.rds_params.decim
                      if self.rds_params is not None else 0)
        if (self.stereo_params is not None
                and cfg.hop_batch * (cfg.audio_fft_size // 2)
                < self.stereo_params.delay):
            raise ValueError(
                "stereo: per-step audio block shorter than the pilot "
                "bandpass group delay; raise hop_batch")
        self._steps = {
            mode: jax.jit(partial(self._step, waterfall=mode),
                          donate_argnums=(0,))
            for mode in ("views", "full", "off")
        }
        # jitted helpers are cached per instance (and per k for the
        # resizer): a fresh jax.jit wrapper per call would re-trace on
        # every bucket switch / error recovery in the serving loop
        self._init_jit = None
        self._resize_jit: dict[int, object] = {}

    # ------------------------------------------------------------------
    def init_state(self, frame0: int = 0) -> HopState:
        # built inside jit: eager complex64 array creation is broken on
        # some remote backends (axon), and this keeps state on-device.
        # frame0 seeds the hop counter when rebuilding mid-stream
        # (error recovery / idle resume): only its PARITY is consumed
        # (the (-1)^(m*hop) fix-up, channelizer.py demodulate_from_bins),
        # so the true stream parity keeps audio polarity continuous
        # across the rebuild.  Passed as a traced scalar: no retrace.
        if self._init_jit is None:
            def mk(f):
                return HopState(
                    frame=f,
                    audio=init_audio_state(self.cfg, self.num_channels,
                                           self.agc_params, self.dc_delay),
                )
            self._init_jit = jax.jit(mk)
        return self._init_jit(jnp.int32(frame0 & 1))

    def empty_channels(self) -> ChannelTable:
        c = self.num_channels
        z = jnp.zeros((c,), jnp.int32)
        # every column materialized, mirroring channels_from_numpy: a
        # None am_env here would give this table a different pytree
        # structure and force a full pipeline retrace when mixed
        return ChannelTable(l=z, r=z, m_idx=z, mode=z,
                            active=jnp.zeros((c,), bool),
                            nr=jnp.zeros((c,), bool),
                            rds=jnp.zeros((c,), bool),
                            am_env=jnp.zeros((c,), bool))

    def resize_channel_rows(self, state: HopState, k: int) -> HopState:
        """Slice (shrink) or zero-pad (grow) every per-channel carry to
        k rows, on device.

        This is the state half of active-channel bucketing (the driver
        runs the step at the smallest configured bucket >= the highest
        active slot, so steady-state output bytes and demod compute
        scale with the live population, not max_channels).  Carries of
        retained rows are untouched -- listeners hear no discontinuity
        across a bucket switch.  Rows dropped by a shrink belong to
        inactive slots; if such a slot is later reused, the registry's
        one-shot RESET_FULL mask re-zeroes it anyway (registry.py), so
        zero-padding on regrow is exact.  Decimator rows are per STREAM
        (audio_channels per channel, interleaved), hence the separate
        row multiplier."""
        nch = self.cfg.audio_channels
        fn = self._resize_jit.get(k)
        if fn is None:
            def conv(x, mult):
                kk = k * mult
                if x.shape[0] == kk:
                    return x
                if x.shape[0] > kk:
                    return x[:kk]
                return jnp.pad(x, [(0, kk - x.shape[0])]
                               + [(0, 0)] * (x.ndim - 1))

            def mk(st):
                a = st.audio
                return HopState(frame=st.frame, audio=AudioState(
                    chan=jax.tree.map(lambda x: conv(x, 1), a.chan),
                    dc=jax.tree.map(lambda x: conv(x, 1), a.dc),
                    agc=jax.tree.map(lambda x: conv(x, 1), a.agc),
                    dec=jax.tree.map(lambda x: conv(x, nch), a.dec),
                    st=jax.tree.map(lambda x: conv(x, 1), a.st),
                    nr=jax.tree.map(lambda x: conv(x, 1), a.nr),
                    rds=jax.tree.map(lambda x: conv(x, 1), a.rds),
                    de=conv(a.de, nch),
                ))
            fn = self._resize_jit[k] = jax.jit(mk)
        return fn(state)

    # ------------------------------------------------------------------
    def _step(self, state: HopState, raw: jnp.ndarray, chans: ChannelTable,
              views: WaterfallViews, reset: jnp.ndarray,
              due_idx: jnp.ndarray, waterfall: str
              ) -> tuple[HopState, HopOutputs]:
        cfg = self.cfg
        b = self.hop_batch
        r, a = cfg.fft_result_size, cfg.audio_max_fft_size

        spec = spectra_from_raw(cfg, self.window, raw, b)
        w = views.start.shape[0]
        if waterfall == "off":
            pyr = jnp.zeros((b, 0), jnp.int8)
            wf = jnp.zeros((0, w, self.view_cap), jnp.int8)
        elif waterfall == "full":
            pyr = waterfall_from_spectra(cfg, spec)
            wf = jnp.zeros((0, w, self.view_cap), jnp.int8)
        else:  # views: compute the power/quantize pyramid ONLY for the
            # cadence-due hops (the host passes per-step due positions
            # padded to the static due_cap) -- at skip_num > 1 the
            # other hops' pyramids would be built and discarded.  At
            # skip_num == 1 every hop is due and due_idx is always the
            # identity, so skip the row gather (it would copy the whole
            # [B, R'] spectrum, ~300 MB of HBM traffic at the flagship)
            pyr = jnp.zeros((b, 0), jnp.int8)
            if cfg.skip_num == 1 and self.due_cap == b:
                due_spec = spec
            else:
                due_spec = spec[due_idx]
            pyr_due = waterfall_from_spectra(cfg, due_spec)
            wf = gather_waterfall_views(pyr_due, views, self.view_cap)

        spec_ext = extend_spectrum(spec, cfg.is_real, r, a)
        audio_st, audio16, pwr, rds8 = audio_from_spectra(
            cfg, self.agc_params, self.dc_delay,
            state.audio, spec_ext, chans, state.frame, reset,
            decim_taps=self.decim_taps, stereo_params=self.stereo_params,
            nr_params=self.nr_params, rds_params=self.rds_params,
            deemph_a=self.deemph_a,
        )
        new_state = HopState(frame=state.frame + b, audio=audio_st)
        if waterfall == "views":
            packed = pack_outputs(audio16, pwr, wf, rds8)
        else:
            packed = pack_outputs(audio16, pwr,
                                  jnp.zeros((0,), jnp.int8), rds8)
        return new_state, HopOutputs(audio=audio16, avg_power=pwr,
                                     wf=wf, pyramid=pyr, rds=rds8,
                                     packed=packed)

    # ------------------------------------------------------------------
    def empty_views(self, num: int = 0) -> WaterfallViews:
        n = num or 1
        return WaterfallViews(start=jnp.zeros((n,), jnp.int32),
                              length=jnp.zeros((n,), jnp.int32))

    def default_due_idx(self, frame0: int = 0) -> jnp.ndarray:
        """[due_cap] int32 gather positions for a given step's frame0."""
        due = waterfall_due_positions(self.cfg, frame0) or [0]
        return jnp.asarray(pad_due_positions(due, self.due_cap), jnp.int32)

    def step(self, state: HopState, raw: jnp.ndarray, chans: ChannelTable,
             views: WaterfallViews | None = None, waterfall: str = "views",
             reset: jnp.ndarray | None = None,
             due_idx: jnp.ndarray | None = None,
             ) -> tuple[HopState, HopOutputs]:
        """raw: [(B+1) * hop_size] wire samples (halo prepended by host).

        waterfall: 'views' (serve client views, the production mode),
        'full' (whole pyramid, testing/debug), 'off'.
        reset: [C] int32 RESET_* mask, one-shot carry zeroing.
        due_idx: [due_cap] int32 in-batch hop positions whose waterfall
        views to gather ('views' mode; defaults to the frame0=0 cadence).
        """
        if views is None:
            views = self.empty_views()
        if reset is None:
            # width follows the channel table, which may be running at
            # a smaller active-channel bucket than max_channels
            reset = jnp.zeros((chans.l.shape[0],), jnp.int32)
        if due_idx is None:
            due_idx = self.default_due_idx()
        return self._steps[waterfall](state, raw, chans, views, reset,
                                      due_idx)


def channels_from_numpy(l, r, m_idx, mode, active, nr=None,
                        rds=None, am_env=None) -> ChannelTable:
    """Host-side helper: build a device ChannelTable from numpy arrays."""
    if nr is None:
        nr = np.zeros(np.shape(l), bool)
    if rds is None:
        rds = np.zeros(np.shape(l), bool)
    if am_env is None:
        am_env = np.zeros(np.shape(l), bool)
    return ChannelTable(
        l=jnp.asarray(l, jnp.int32),
        r=jnp.asarray(r, jnp.int32),
        m_idx=jnp.asarray(m_idx, jnp.int32),
        mode=jnp.asarray(mode, jnp.int32),
        active=jnp.asarray(active, bool),
        nr=jnp.asarray(nr, bool),
        rds=jnp.asarray(rds, bool),
        am_env=jnp.asarray(am_env, bool),
    )
