"""Device-side spectral noise reduction (Kim & Ruwisch / Ephraim-Malah).

The reference runs this in the BROWSER on each client's decoded audio
(jsdsp/lib/NR_spectral.c, an MMSE spectral-subtraction noise reducer
from the UHSDR/Teensy-ConvolutionSDR lineage).  A TPU server has the
compute headroom to denoise every listener at once, so here the whole
chain runs on device, batched over the channel population [C, T], as a
per-client opt-in (JSON command ``{"cmd":"nr","enabled":true}``):

- sqrt-Hann analysis/synthesis windows at 50 % overlap,
- per-bin MMSE speech-presence probability -> noise-floor track,
- decision-directed a-priori SNR (Ephraim & Malah 1984) -> per-bin
  Wiener-like gain with a 0.001 floor,
- "musical noise" treatment: SNR-dependent moving-average smoothing of
  the gain curve (window 1/3/5/7/9 bins),
- overlap-add resynthesis.

Faithful to NR_spectral.c:108-353 including its quirks, verified by
the straight-line oracle port in tests/oracle_nr.py:

- the conjugate-bin index of the spectral weighting is ``2F-1-b``, off
  by one from true symmetry ``2F-b`` (NR_spectral.c:328) -- the IFFT's
  imaginary residue is discarded exactly like the reference;
- output samples are rounded to integers (the browser operates on
  int16-scale floats; NR_spectral.c:345) -- the pipeline feeds this op
  the int16-domain stream so the rounding lands on the same grid;
- the first 20 frames only accumulate the noise estimate and pass
  audio through at unit gain (NR_spectral.c:168-181);
- the gain-smoothing edge treatment computes averages it never writes
  back (NR_spectral.c:289-314 fills NR_Nest, :311 copies only the
  centre range) -- edge bins keep their unsmoothed gains, as shipped.

Deviations (documented):

- The frame is ``half = audio_fft_size/2`` samples (FFT 2*half) --
  one frame per hop -- instead of the reference's fixed 256/512.  Its
  smoothing constants collapse to per-frame values independent of the
  frame time (ax = 0.8, ap = 0.9 exactly, NR_spectral.c:84-88), so
  the adaptation differs only through the frame duration (15 ms at
  the 12 kHz north star vs the reference's 21.3 ms).
- The noise-track division X/xt is guarded with 1e-30: the reference
  NaNs on exactly-silent input, which a server slot can produce
  (muted client); the guard is invisible for any real signal.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# constants of NR_spectral.c:32-35 and the collapsed smoothing factors
PSTHR = 0.99
PNSAF = 0.01
PSINI = 0.5
PSPRI = 0.5
AX = 0.8          # noise-track smoothing, exp(ln 0.8)
AP = 0.9          # speech-prob smoothing, exp(ln 0.9)
SNR_PRIO_MIN = 10.0 ** (-30.0 / 10.0)
GAIN_LIMIT = 0.001
NR_WIDTH = 4
POWER_THRESHOLD = 0.4
INIT_FRAMES = 20  # noise-estimate accumulation frames at startup


class NRParams(NamedTuple):
    window: np.ndarray   # [2F] sqrt-Hann synthesis/analysis window
    final_gain: float
    alpha: float         # decision-directed SNR smoothing [0.95]
    xih1: float          # a-priori SNR of the speech-active hypothesis
    xih1r: float
    pfac: float


class NRState(NamedTuple):
    stage: jnp.ndarray       # [C] int32: 0 fresh, 1..20 averaging, >20 run
    last_in: jnp.ndarray     # [C, F] previous half-frame of input
    last_ifft: jnp.ndarray   # [C, F] previous IFFT second half (OLA carry)
    nest: jnp.ndarray        # [C, F] startup noise accumulator
    xt: jnp.ndarray          # [C, F] noise-floor track
    pslp: jnp.ndarray        # [C, F] smoothed speech probability
    hk_old: jnp.ndarray      # [C, F] previous SNR_post * G^2


def make_nr_params(half: int, final_gain: float = 1.0,
                   alpha: float = 0.95,
                   asnr_db: float = 30.0) -> NRParams:
    """Window + gain constants for frame size `half` (FFT 2*half).

    The [2F] window repeats each sqrt-Hann point twice, exactly like
    the reference's ``sqrtHann_256[i/2]`` indexing (NR_spectral.c:155);
    the F-point table is sin(pi*j/(F-1)) (= sqrt of the symmetric Hann
    it embeds at :67)."""
    f = half
    tab = np.sin(np.pi * np.arange(f) / (f - 1)).astype(np.float32)
    win = np.repeat(tab, 2)
    xih1 = 10.0 ** (asnr_db / 10.0)
    return NRParams(
        window=win.astype(np.float32),
        final_gain=float(final_gain),
        alpha=float(alpha),
        xih1=xih1,
        xih1r=1.0 / (1.0 + xih1) - 1.0,
        pfac=(1.0 / PSPRI - 1.0) * (1.0 + xih1),
    )


def init_nr_state(num_channels: int, half: int) -> NRState:
    """All-zero carries; stage 0 marks 'fresh', and the first frame
    overrides the gain-side carries to the reference's init values, so
    the pipeline's one-shot all-zeros reset re-arms NR exactly."""
    c, f = num_channels, half
    z = lambda: jnp.zeros((c, f), jnp.float32)  # noqa: E731
    return NRState(stage=jnp.zeros((c,), jnp.int32), last_in=z(),
                   last_ifft=z(), nest=z(), xt=z(), pslp=z(), hk_old=z())


def _gain_frame(p: NRParams, st: NRState, x_pow: jnp.ndarray):
    """One frame of the noise/SNR/gain recursion.  x_pow: [C, F]
    squared magnitudes.  Returns (new carries, unsmoothed G [C, F],
    running mask [C, 1]).

    Only the RECURSION lives here (it must run frame-sequentially);
    the musical-noise smoothing depends solely on this frame's gains
    and powers -- the hk carry uses the PRE-smoothing gain
    (NR_spectral.c:253 before :257) -- so it is applied batched over
    all frames afterwards (_smooth_gains)."""
    fresh = (st.stage == 0)[:, None]
    pslp = jnp.where(fresh, jnp.float32(PSINI), st.pslp)
    hk_old = jnp.where(fresh, 1.0, st.hk_old)
    nest = jnp.where(fresh, 0.0, st.nest)
    # clamp once past INIT_FRAMES: an unclamped int32 wraps negative
    # after ~2^31 frames (~265 days at the WBFM rate), which would
    # re-arm `accum` and grow the noise estimate without bound (same
    # wrap class as AGCState.seen, ops/agc.py)
    stage = jnp.minimum(st.stage + 1, INIT_FRAMES + 1)
    # sequential-if semantics of the C (NR_spectral.c:168,183): the
    # 20th frame both finishes the accumulation AND runs the reducer
    accum = (stage <= INIT_FRAMES)[:, None]
    running = (stage >= INIT_FRAMES)[:, None]

    # ---- startup: accumulate the noise estimate over 20 frames ----
    nest_a = jnp.where(accum, nest + 0.05 * x_pow, nest)
    xt_in = jnp.where(accum, jnp.float32(PSINI) * nest_a, st.xt)

    # ---- running: MMSE noise update + decision-directed SNR ----
    xt_safe = xt_in + jnp.float32(1e-30)
    ph1y = 1.0 / (1.0 + p.pfac * jnp.exp(
        jnp.float32(p.xih1r) * x_pow / xt_safe))
    pslp_r = jnp.float32(AP) * pslp + jnp.float32(1 - AP) * ph1y
    ph1y = jnp.where(pslp_r > PSTHR, jnp.float32(1.0 - PNSAF),
                     jnp.minimum(ph1y, 1.0))
    xtr = (1.0 - ph1y) * x_pow + ph1y * xt_in
    xt_r = jnp.float32(AX) * xt_in + jnp.float32(1 - AX) * xtr

    snr_post = jnp.clip(x_pow / (xt_r + 1e-30), SNR_PRIO_MIN, 1000.0)
    snr_prio = jnp.maximum(
        p.alpha * hk_old + (1.0 - p.alpha) * jnp.maximum(snr_post - 1.0,
                                                         0.0), 0.0)
    v = snr_prio * snr_post / (1.0 + snr_prio)
    g_run = jnp.maximum(jnp.sqrt(0.7212 * v + v * v) / snr_post,
                        GAIN_LIMIT)
    hk_new = snr_post * g_run * g_run

    new = NRState(
        stage=stage,
        last_in=st.last_in, last_ifft=st.last_ifft,  # caller updates
        nest=nest_a,
        xt=jnp.where(running, xt_r, xt_in),
        pslp=jnp.where(running, pslp_r, pslp),
        hk_old=jnp.where(running, hk_new, hk_old),
    )
    return new, g_run, running


def _smooth_gains(g_run: jnp.ndarray, x_pow: jnp.ndarray,
                  running: jnp.ndarray) -> jnp.ndarray:
    """Musical-noise smoothing (bins [1, F), NR_spectral.c:257-314),
    batched over any leading dims; pre-run frames pass G = 1.

    The window width nn is data-dependent per (frame, channel) but can
    only take the values {1, 3, 5, 7, 9} (NR_WIDTH = 4): the moving
    average is computed for ALL five widths with STATIC index shifts of
    one shared cumsum and the per-row width selects among them -- a
    data-dependent take_along_axis gather along the bin axis measures
    ~120 ms on TPU for the same block where this form costs <1 ms
    (arbitrary lane-axis gathers are the slowest op class on the VPU;
    same lesson as the pyramid's strided slicing, PERF.md)."""
    f = g_run.shape[-1]
    bins = jnp.arange(f)
    band = bins >= 1
    pre = jnp.sum(jnp.where(band, x_pow, 0.0), axis=-1)
    post = jnp.sum(jnp.where(band, g_run * g_run * x_pow, 0.0), axis=-1)
    pr = post / (pre + 1e-30)
    nn = jnp.where(pr > POWER_THRESHOLD, 1,
                   1 + 2 * jnp.floor(0.5 + NR_WIDTH *
                                     (1.0 - pr / POWER_THRESHOLD))
                   .astype(jnp.int32))
    h_sel = (nn // 2)[..., None]                              # [..., 1]
    cs = jnp.concatenate(
        [jnp.zeros(g_run.shape[:-1] + (1,), jnp.float32),
         jnp.cumsum(g_run, axis=-1)], axis=-1)                # [..., F+1]
    g = g_run
    for h in range(1, NR_WIDTH + 1):
        # cs[b+h+1] - cs[b-h] via static slices + edge pads (the pads
        # land only on bins the centre mask excludes)
        hi_v = jnp.concatenate(
            [cs[..., h + 1:],
             jnp.repeat(cs[..., -1:], h, axis=-1)], axis=-1)  # [..., F]
        lo_v = jnp.concatenate(
            [jnp.repeat(cs[..., :1], h, axis=-1),
             cs[..., :f - h]], axis=-1)                       # [..., F]
        sm = (hi_v - lo_v) / jnp.float32(2 * h + 1)
        centre = (bins >= 1 + h) & (bins < f - h)
        g = jnp.where((h_sel == h) & centre, sm, g)
    return jnp.where(running, g, 1.0)


def nr_process(state: NRState, params: NRParams, x: jnp.ndarray,
               num_frames: int) -> tuple[NRState, jnp.ndarray]:
    """Denoise the int16-domain stream x [C, num_frames*F] -> same
    shape.  Streaming-continuous: all history is carried in `state`.

    TPU structure (the demodulate_batch trick, PERF.md): ONLY the
    cheap elementwise noise/SNR recursion runs in the frame scan; the
    forward FFTs of all frames are batched before it (each frame's
    input is the previous+current half-frame, all present in x up to
    the state.last_in seed), and the gain smoothing, spectral
    weighting, IFFTs and overlap-add run batched after it (the OLA is
    an in-batch shift seeded by state.last_ifft).  Measured on TPU at
    [128 ch, 18 frames of 2048]: 99.9 -> a few ms (tools/profile.py
    --optin)."""
    c, t = x.shape
    n = num_frames
    f = t // n
    win = jnp.asarray(params.window)                          # [2F]
    cur = x.reshape(c, n, f).transpose(1, 0, 2)               # [N, C, F]
    prev = jnp.concatenate([state.last_in[None], cur[:-1]])   # [N, C, F]
    buf = jnp.concatenate([prev, cur], axis=2) * win[None, None, :]
    z = jnp.fft.fft(buf.astype(jnp.complex64), axis=2)        # [N, C, 2F]
    x_pow = z[..., :f].real ** 2 + z[..., :f].imag ** 2       # [N, C, F]

    def body(st, xp):
        st2, g_run, running = _gain_frame(params, st, xp)
        return st2, (g_run, running)

    state, (g_run, running) = jax.lax.scan(body, state, x_pow)
    g = _smooth_gains(g_run, x_pow, running)                  # [N, C, F]

    # spectral weighting with the reference's 2F-1-b conjugate quirk:
    # bins 1..F-1 get G[b]; bins F..2F-2 get G[2F-1-ai] = G[b] via
    # the reversed tail; bin 0 and bin 2F-1 stay unscaled
    one = jnp.ones((n, c, 1), jnp.float32)
    gful = jnp.concatenate(
        [one, g[..., 1:], g[..., 1:][..., ::-1], one], axis=2)
    y = jnp.fft.ifft(z * gful, axis=2).real * win[None, None, :]
    # overlap-add: frame i's first half + frame i-1's second half
    # (seeded by the carried previous-step tail)
    tails = jnp.concatenate([state.last_ifft[None], y[:-1, :, f:]])
    outs = jnp.round((y[..., :f] + tails)
                     * jnp.float32(params.final_gain))        # [N, C, F]
    state = state._replace(last_in=cur[-1], last_ifft=y[-1, :, f:])
    return state, outs.transpose(1, 0, 2).reshape(c, t)
