"""Device-side WBFM stereo decoder (19 kHz pilot PLL + L-R demix).

The reference server sends the FM multiplex (MPX) as mono audio and
leaves stereo to the browser (reference: jsdsp/src/wbfmpll.cpp): an
18-20 kHz bandpass isolates the pilot, a liquid nco PLL (VCO at
19 kHz, loop bandwidth 0.001) locks to it, the MPX is mixed down by
TWICE the pilot phase to bring the 38 kHz DSB L-R subcarrier to
baseband, the mono path is delayed by the bandpass group delay, and
L/R = mono +- (L-R).

A TPU server has the compute headroom to decode stereo for every
listener at once, so here the whole thing runs on device, batched over
the channel population [C, T], as an opt-in (``[input] stereo =
true``):

- bandpass = batched conv with the filter tail carried across steps
  (same streaming pattern as ops/polyphase.py),
- the per-sample PLL recursion is a lax.scan vectorized over [C]
  (same pattern as the AM sync PLL, ops/channelizer.py),
- the mono delay line is a carried tail.

Deviations (improvements) from jsdsp/src/wbfmpll.cpp:60-80, both
measured (tests/test_stereo.py):

1. The reference mixes the UN-delayed MPX sample with the PLL phase
   while adding the DELAYED mono, so its L-R term carries a constant
   phase error of 2*omega_pilot*D (D = bandpass group delay; ~5.85 rad
   mod 2pi at fs=192k -> a fixed separation-loss factor plus a
   D-sample mono/LR misalignment).  Here the DELAYED sample feeds the
   mixer too: the PLL phase at step i tracks the pilot at time i-D (it
   is estimated from the group-delayed bandpass output), so mixing
   x[i-D] is phase-aligned exactly and mono/L-R stay time-aligned.
2. The reference's phase detector e = 2*y*cos(theta) has an EVEN
   error curve around lock (average A*cos(delta)); its equilibrium is
   in QUADRATURE with the pilot, which mixes the 38 kHz DSB subcarrier
   by -cos(2*theta_pilot) and decodes 0.25L+0.75R / 0.75L+0.25R --
   swapped channels at 9.5 dB separation (verified numerically on the
   reference's exact update).  Here the detector is -2*y*sin(theta)
   (odd around lock, in-phase equilibrium) and the demix gain is 2, so
   L lands in L at full separation (>30 dB measured after lock).

The demixed L-R stream keeps its image terms at 2/4x the pilot
(38/76 kHz) unfiltered -- exactly like the reference, whose post-mix
lowpasses are commented out (wbfmpll.cpp:73-79); they are ultrasonic
at WBFM rates and die in the Opus decimation lowpass when that path
is on.  Non-FM rows (fm_mask False) pass mono through both outputs
(L == R == delayed mono).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .polyphase import design_lowpass

# same liquid loop-gain convention as the AM sync PLL -- imported so a
# future retuning can't silently diverge the two lock dynamics
from .channelizer import PLL_ALPHA, PLL_BETA, PLL_BW  # noqa: F401

PILOT_HZ = 19000.0
# stereo needs the 38 kHz DSB subcarrier (+15 kHz audio) inside Nyquist
MIN_STEREO_SPS = 106000


class StereoParams(NamedTuple):
    taps: np.ndarray   # [N] 18-20 kHz bandpass FIR (host numpy; embeds)
    delay: int         # bandpass group delay (N-1)/2, mono-path delay
    f_nom: float       # nominal pilot phase increment 2*pi*19k/fs


class StereoState(NamedTuple):
    bp_tail: jnp.ndarray    # [C, N-1] bandpass input history
    mono_tail: jnp.ndarray  # [C, delay] mono delay-line history
    phase: jnp.ndarray      # [C] PLL phase (rad)
    freq: jnp.ndarray       # [C] PLL frequency OFFSET from f_nom
    #                         (stored as an offset so the all-zeros
    #                         carry reset of pipeline.audio_from_spectra
    #                         re-arms the PLL at the nominal 19 kHz)


def make_stereo_params(audio_sps: int) -> StereoParams:
    """Filter/PLL constants for a given audio rate.

    Tap count follows the reference's estimate_req_filter_len(2000/fs,
    60) | 1 (jsdsp/src/wbfmpll.cpp:22: 2 kHz transition, 60 dB):
    liquid's Kaiser estimate N ~= As / (22 * df).  The band edges match
    its firdespm spec (stop <=17 kHz, pass 18-20 kHz, stop >=21 kHz);
    the response here is a windowed-sinc lowpass difference -- same
    passband, comparable stopband, dependency-free.
    """
    fs = float(audio_sps)
    df = 2000.0 / fs
    n = int(60.0 / (22.0 * df)) | 1
    hi = design_lowpass(n, 2 * 20000.0 / fs)
    lo = design_lowpass(n, 2 * 18000.0 / fs)
    return StereoParams(
        taps=(hi - lo).astype(np.float32),
        delay=(n - 1) // 2,
        f_nom=float(2.0 * np.pi * PILOT_HZ / fs),
    )


def init_stereo_state(num_channels: int, params: StereoParams | None
                      ) -> StereoState:
    """All-zero carries.  With ``params=None`` (stereo off) the tails
    are zero-width so the state costs nothing but keeps the pytree
    structure stable."""
    c = num_channels
    nt = params.taps.shape[0] if params is not None else 1
    d = params.delay if params is not None else 0
    return StereoState(
        bp_tail=jnp.zeros((c, nt - 1), jnp.float32),
        mono_tail=jnp.zeros((c, d), jnp.float32),
        phase=jnp.zeros((c,), jnp.float32),
        freq=jnp.zeros((c,), jnp.float32),
    )


def pilot_bandpass(bp_tail: jnp.ndarray, taps: np.ndarray,
                   x: jnp.ndarray):
    """18-20 kHz pilot isolation with the filter tail carried across
    steps.  Returns (new_bp_tail, y [C, T])."""
    t = x.shape[1]
    xin = jnp.concatenate([bp_tail, x], axis=1)            # [C, nt-1+T]
    lhs = xin[:, None, :]
    rhs = jnp.asarray(taps[::-1], jnp.float32)[None, None, :]
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]                                             # [C, T]
    return xin[:, t:], y


def delay_stream(tail: jnp.ndarray, x: jnp.ndarray):
    """Group-delay x by tail.shape[1] samples (history carried).
    Returns (new_tail, x_delayed [C, T])."""
    t = x.shape[1]
    full = jnp.concatenate([tail, x], axis=1)
    return full[:, t:], full[:, :t]


def pilot_front_end(bp_tail: jnp.ndarray, delay_tail: jnp.ndarray,
                    taps: np.ndarray, x: jnp.ndarray):
    """Shared pilot front end (stereo AND RDS, ops/rds.py): bandpass
    the 19 kHz pilot with the filter tail carried, and group-delay the
    MPX so the per-sample mix is phase-aligned with the PLL's pilot
    estimate (module docstring pt. 1).

    Returns (new_bp_tail, new_delay_tail, y [C, T], x_delayed [C, T]).
    """
    new_bp, y = pilot_bandpass(bp_tail, taps, x)
    new_d, xd = delay_stream(delay_tail, x)
    return new_bp, new_d, y, xd


def pilot_track(phase: jnp.ndarray, freq: jnp.ndarray, f_nom: float,
                y: jnp.ndarray):
    """Per-sample pilot PLL over the bandpassed pilot y [C, T] -- the
    single tracking loop both subcarrier consumers mix against (stereo
    at 2x the phase, RDS at 3x; the transmitter derives both from the
    same pilot).

    Phase detector: -sin locks the VCO IN PHASE with the pilot (average
    of -2*A*cos(th_p)*sin(th) = -A*sin(th - th_p), odd around
    th = th_p).  The reference uses 2*y*cos(th) (wbfmpll.cpp:66) whose
    average A*cos(th_p - th) zeroes in QUADRATURE, so its subcarrier
    mix cos(2*th) = -cos(2*th_p) demixes with flipped sign: measured
    0.25L+0.75R / 0.75L+0.25R (channels swapped, 9.5 dB separation).
    See module docstring.

    Returns (new_phase, new_freq, ph [C, T]) where ph[:, i] is the
    loop-updated phase the mixers use at sample i.
    """
    from . import unroll

    f_nom = jnp.float32(f_nom)
    two_pi = jnp.float32(2.0 * np.pi)

    def step(carry, yb):
        phase, freq = carry
        e = -2.0 * yb * jnp.sin(phase)
        freq = freq + jnp.float32(PLL_ALPHA) * e
        ph_m = phase + jnp.float32(PLL_BETA) * e
        ph_n = jnp.mod(ph_m + f_nom + freq, two_pi)        # nco step
        return (ph_n, freq), ph_m

    k = unroll.scan_unroll(y.shape[1], unroll.PLL_UNROLL)
    (phase, freq), ph = unroll.unrolled_scan(step, (phase, freq), y, k)
    return phase, freq, ph


def stereo_demix(xd: jnp.ndarray, ph: jnp.ndarray, fm_mask: jnp.ndarray
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Demix the delayed MPX [C, T] against the tracked pilot phase
    [C, T] -> (L, R).  Mix by twice the pilot phase; gain 2 makes the
    demixed DSB term unity (s*cos(2th) * 2cos(2th) -> s + s*cos(4th)):
    full separation.  Non-FM rows pass mono through both ears."""
    lr = 2.0 * xd * jnp.cos(2.0 * ph)
    lr = lr * jnp.where(fm_mask, 1.0, 0.0)[:, None]
    return xd + lr, xd - lr


def stereo_decode(state: StereoState, params: StereoParams,
                  x: jnp.ndarray, fm_mask: jnp.ndarray
                  ) -> tuple[StereoState, jnp.ndarray, jnp.ndarray]:
    """MPX stream [C, T] -> (state, L [C, T], R [C, T]).

    Streaming-continuous across steps (all history carried in state).
    T must be >= the bandpass group delay.
    """
    new_bp_tail, new_mono_tail, y, xd = pilot_front_end(
        state.bp_tail, state.mono_tail, params.taps, x)
    phase, freq, ph = pilot_track(state.phase, state.freq,
                                  params.f_nom, y)
    l, r = stereo_demix(xd, ph, fm_mask)
    new_state = StereoState(bp_tail=new_bp_tail, mono_tail=new_mono_tail,
                            phase=phase, freq=freq)
    return new_state, l, r
