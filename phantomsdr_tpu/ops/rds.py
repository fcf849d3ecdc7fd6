"""Device-side RDS subcarrier demodulation (57 kHz -> complex baseband).

The reference decodes FM-RDS entirely in the browser: the server sends
the mono-demodulated 192 k MPX and jsdsp's redsea WASM build
(reference: jsdsp/redsea.js, jsdsp/configureredsea.sh) recovers the
1187.5 bps data stream client-side.  A TPU server has the compute
headroom to do the per-sample subcarrier work for every listener at
once, so this op runs the DSP half server-side, batched over the
channel population [C, T], as an opt-in (``[input] rds = true``):

- the 19 kHz pilot is bandpassed and tracked by the same per-sample
  PLL recursion as the stereo decoder (ops/stereo.py; the RDS clock
  and subcarrier are derived from the pilot at the transmitter:
  57 kHz = 3x pilot, 1187.5 Hz = pilot/16),
- the group-delayed MPX is mixed down by 3x the pilot phase to
  COMPLEX baseband (I and Q): the RDS standard allows the 57 kHz
  carrier to ride either in phase or in quadrature with the pilot's
  third harmonic, so the residual constant phase is unknown -- the
  host resolves it with a squaring (BPSK) phase estimate
  (runtime/rds.py) instead of assuming one convention,
- a sharp ~2.4 kHz lowpass + decimate (ops/polyphase.py pattern)
  brings the stream down to a few kS/s; the dominant in-band
  interferer after the mix is the 38 kHz stereo DSB subcarrier
  (23-53 kHz -> |57-38| = 19 kHz +- 15 kHz, reaching down to ~4 kHz),
  which sets the stopband edge,
- per-channel block normalization + int8 quantization keep the
  device->host bytes at 2 bytes per baseband sample.

The protocol half (symbol timing, differential decode, block sync,
group/PS/RT parsing) is bit twiddling on a ~2.4 kS/s stream -- host
work by design (runtime/rds.py), exactly like the codec edge.

Stations that transmit RDS without a stereo pilot are out of scope:
this decoder derives the 57 kHz carrier from the pilot (the common
broadcast configuration); a pilotless station never locks.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .polyphase import (
    DecimatorState, polyphase_decimate, design_lowpass,
)
from .stereo import make_stereo_params, pilot_front_end, pilot_track

# minimum symbol-timing oversampling the host decoder needs: the
# baseband rate fs/decim must stay >= 2 samples per 2375 Hz biphase
# symbol
MIN_BASEBAND_SPS = 4750.0
# and a ceiling so a config with an indivisible audio block can't
# silently ship near-raw-rate baseband over the link
MAX_BASEBAND_SPS = 24000.0
# target RMS of the int8 baseband after per-block normalization
INT8_TARGET_RMS = 24.0


class RDSParams(NamedTuple):
    bp_taps: np.ndarray   # [Nb] 18-20 kHz pilot bandpass (host numpy)
    delay: int            # bandpass group delay = MPX delay-line length
    f_nom: float          # nominal pilot increment 2*pi*19k/fs
    lp_taps: np.ndarray   # [Nl] post-mix lowpass (pass 2.4k, stop ~4k)
    decim: int            # baseband decimation factor (divides half)


class RDSState(NamedTuple):
    """Every leaf has leading dim C so the pipeline's per-channel
    reset/resize tree_maps (pipeline.audio_from_spectra zero_rows,
    HopPipeline.resize_channel_rows) apply row-wise without special
    casing; the I/Q decimator tail is stored folded [C, 2*(Nl-1)] and
    reshaped to the DecimatorState's [2C, Nl-1] row layout in
    rds_process."""

    bp_tail: jnp.ndarray    # [C, Nb-1] bandpass input history
    mpx_tail: jnp.ndarray   # [C, delay] MPX delay-line history
    phase: jnp.ndarray      # [C] PLL phase (rad)
    freq: jnp.ndarray       # [C] PLL frequency offset from f_nom
    dec_tail: jnp.ndarray   # [C, 2*(Nl-1)] folded I/Q lowpass history


def rds_decim_for(audio_sps: int, half: int) -> int:
    """Largest power-of-two decimation that divides the per-hop audio
    block and keeps the baseband rate >= MIN_BASEBAND_SPS."""
    d = 1
    while (d * 2 <= half and half % (d * 2) == 0
           and audio_sps / (d * 2) >= MIN_BASEBAND_SPS):
        d *= 2
    return d


def make_rds_params(audio_sps: int, half: int) -> RDSParams:
    """Constants for a given audio rate and per-hop block size.

    The pilot bandpass/PLL constants are shared with the stereo decoder
    (same pilot, same loop).  The post-mix lowpass passes the RDS
    spectrum (~2.4 kHz two-sided main lobe) and must be ~40+ dB down by
    4 kHz where the mixed-down stereo subcarrier starts; a Hamming
    windowed-sinc with a 1.6 kHz transition needs ~3.3*fs/1600 taps.
    """
    sp = make_stereo_params(audio_sps)
    fs = float(audio_sps)
    n = (int(3.3 * fs / 1600.0)) | 1
    lp = design_lowpass(n, 2.0 * 3200.0 / fs)
    return RDSParams(
        bp_taps=sp.taps,
        delay=sp.delay,
        f_nom=sp.f_nom,
        lp_taps=lp,
        decim=rds_decim_for(audio_sps, half),
    )


def init_rds_state(num_channels: int, params: RDSParams | None) -> RDSState:
    """All-zero carries; with ``params=None`` (rds off) every tail is
    zero-width so the state costs nothing but keeps the pytree shape."""
    c = num_channels
    nb = params.bp_taps.shape[0] if params is not None else 1
    d = params.delay if params is not None else 0
    nl = params.lp_taps.shape[0] if params is not None else 1
    return RDSState(
        bp_tail=jnp.zeros((c, nb - 1), jnp.float32),
        mpx_tail=jnp.zeros((c, d), jnp.float32),
        phase=jnp.zeros((c,), jnp.float32),
        freq=jnp.zeros((c,), jnp.float32),
        dec_tail=jnp.zeros((c, 2 * (nl - 1)), jnp.float32),
    )


def rds_from_pilot(dec_tail: jnp.ndarray, params: RDSParams,
                   xd: jnp.ndarray, ph: jnp.ndarray,
                   fm_mask: jnp.ndarray
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Delayed MPX [C, T] + tracked pilot phase [C, T] -> (new folded
    dec_tail [C, 2*(Nl-1)], int8 baseband [C, 2, T/decim]).

    The downstream half of rds_process, split out so the pipeline can
    feed it the ONE pilot track shared with the stereo demixer when
    both opt-ins are on (pipeline.audio_from_spectra); the transmitter
    derives both subcarriers from the same pilot, so the server tracks
    it once.
    """
    c, t = xd.shape

    # ---- 57 kHz complex downmix: z = 2 * x_d * exp(-3j * theta) ----
    zi = 2.0 * xd * jnp.cos(3.0 * ph)
    zq = -2.0 * xd * jnp.sin(3.0 * ph)
    z = jnp.stack([zi, zq], axis=1).reshape(2 * c, t)      # rows I0,Q0,I1,..

    # ---- lowpass + decimate (streaming, tail carried) ----
    nl = params.lp_taps.shape[0]
    dec_in = DecimatorState(tail=dec_tail.reshape(2 * c, nl - 1))
    dec_st, bb = polyphase_decimate(dec_in, z, params.lp_taps,
                                    params.decim)
    bb = bb.reshape(c, 2, -1)                              # [C, 2, T/decim]

    # ---- per-channel block normalization -> int8 ----
    mask = jnp.where(fm_mask, 1.0, 0.0)[:, None, None]
    bb = bb * mask
    rms = jnp.sqrt(jnp.mean(bb * bb, axis=(1, 2), keepdims=True))
    scale = jnp.float32(INT8_TARGET_RMS) / (rms + 1e-9)
    q = jnp.clip(jnp.round(bb * scale), -127.0, 127.0).astype(jnp.int8)
    return dec_st.tail.reshape(c, 2 * (nl - 1)), q


def rds_process(state: RDSState, params: RDSParams, x: jnp.ndarray,
                fm_mask: jnp.ndarray) -> tuple[RDSState, jnp.ndarray]:
    """MPX stream [C, T] -> (state, int8 baseband [C, 2, T/decim]).

    Output rows are (I, Q) of the 57 kHz subcarrier mixed to complex
    baseband by 3x the tracked pilot phase, lowpassed, decimated, and
    per-channel-normalized to INT8_TARGET_RMS.  Streaming-continuous
    across steps.  Non-FM rows are zeroed.
    """
    # ---- shared pilot front end + tracking loop (ops/stereo.py:
    # pilot_front_end / pilot_track -- ONE implementation of the
    # bandpass/delay/PLL conventions for both subcarrier consumers) ----
    new_bp_tail, new_mpx_tail, y, xd = pilot_front_end(
        state.bp_tail, state.mpx_tail, params.bp_taps, x)
    phase, freq, ph = pilot_track(state.phase, state.freq,
                                  params.f_nom, y)
    new_dec_tail, q = rds_from_pilot(state.dec_tail, params, xd, ph,
                                     fm_mask)
    return (RDSState(bp_tail=new_bp_tail, mpx_tail=new_mpx_tail,
                     phase=phase, freq=freq,
                     dec_tail=new_dec_tail), q)
