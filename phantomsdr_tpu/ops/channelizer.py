"""Batched frequency-domain channelizer + demodulators (USB/LSB/AM/FM).

This replaces the reference's per-client demod jobs (one asio task per
client per frame, src/signal.cpp:102-298, dispatched from
src/websocket.cpp:156-185) with ONE dense batched computation over a
static channel table: every connected listener is a row in
``[C, ...]`` arrays, inactive rows are masked.  That is the key
TPU-idiomatic departure called out in SURVEY.md section 7 step 2: no
per-client recompilation, no dynamic shapes, the whole channel
population is a single vmapped/sharded kernel.

Exact reference semantics implemented (with file:line cites):

- Channel slice: client sees ``buf = &spectrum[(l + base_idx) % R]``
  and indexes up to audio_fft_size bins beyond it, relying on the
  DC-wrap tail copy for IQ (src/fft.cpp:91-98, src/websocket.cpp:156-185).
- USB: spectrum bins [m, m+A) -> c2r IFFT input bins from 0
  (src/signal.cpp:126-138).  FFTW c2r of size A only reads bins
  [0, A/2], so only A/2+1 bins matter.
- LSB: reversed bins (m - k -> k), c2r IFFT, then time reversal
  (src/signal.cpp:139-156).
- AM/FM: positive bins [m, m+A/2) -> [0, A/2), negative bins
  (m - j -> A - j) -> c2c IFFT (src/signal.cpp:173-214).
- Parity fix-up: on odd frames the waveform is negated when
  (m even and IQ input) or (m odd and real input)
  (src/signal.cpp:160-168, 223-234) -- the 50% overlap inverts
  alternate frames depending on downconversion bin parity.
- Overlap-add of the first half with the saved second half of the
  previous frame (src/signal.cpp:170-172, 235-241, 274-275).
- AM: PLL carrier-synchronous detection (src/signal.cpp:242-252 -- the
  reference's DEFAULT: liquid-dsp is its normal build configuration)
  with the envelope sqrt(re^2+im^2) fallback (src/signal.cpp:253-257,
  src/utils/dsp.cpp:116-126) available PER CLIENT via the table's
  am_env column (a server-side extension: the reference picks one at
  build time, here each listener can).
- FM: polar discriminator arg(x[i] * conj(x[i-1])) seeded with the last
  output sample of the previous frame (src/signal.cpp:259-263,
  src/utils/dsp.cpp:27-35).
- Average slice power: sum |bin|^2 over [l, r) (src/signal.cpp:117-119).

All IFFTs follow FFTW's unnormalized backward convention, i.e.
jnp.fft.ifft * A.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Demodulation mode codes (reference src/client.h:43 enum demodulation_mode)
MODE_USB = 0
MODE_LSB = 1
MODE_AM = 2
MODE_FM = 3


class ChannelTable(NamedTuple):
    """Dense per-channel tuning state; one row per (possible) listener.

    l, r: slice bounds in display-order bins (0 <= l <= r < R),
    m_idx: floor(mid) in display-order bins (the fractional mid is only
    metadata, src/signal.cpp:107 uses floor), mode: MODE_*, active:
    row is a live listener.
    """

    l: jnp.ndarray       # [C] int32
    r: jnp.ndarray       # [C] int32
    m_idx: jnp.ndarray   # [C] int32
    mode: jnp.ndarray    # [C] int32
    active: jnp.ndarray  # [C] bool
    # per-client spectral noise reduction opt-in (server-side extension;
    # the reference runs NR in the browser).  None == all off, so table
    # literals that predate the field keep working.
    nr: jnp.ndarray | None = None  # [C] bool
    # per-client FM-RDS opt-in (server-side extension; the reference
    # decodes RDS in the browser via the redsea WASM build).
    rds: jnp.ndarray | None = None  # [C] bool
    # per-client AM envelope-detection opt-OUT of the default PLL
    # carrier sync (src/signal.cpp:242-257 picks one at build time;
    # here each listener can).  None == all PLL (the reference-with-
    # liquid default); only consulted when the pipeline runs with
    # am_sync=True.
    am_env: jnp.ndarray | None = None  # [C] bool


class ChannelState(NamedTuple):
    """Per-channel demod carry (the reference's per-client scratch).

    Note on frame parity: send_audio's ``frame_num`` is the *global* hop
    counter passed in from the FFT loop (src/websocket.cpp:180-182); the
    AudioClient member of the same name is shadowed by the parameter
    inside send_audio and never advances, so parity is global, not
    per-client.  Hence no per-channel frame counter here.
    """

    ssb_prev: jnp.ndarray      # [C, A/2] f32 (audio_real_prev, signal.cpp:274)
    cplx_prev: jnp.ndarray     # [C, A/2] c64 (audio_complex_baseband_prev)
    fm_prev: jnp.ndarray       # [C] c64      (prev sample for discriminator)
    carrier_prev: jnp.ndarray  # [C, A/2] c64 (carrier overlap, AM sync path)
    pll_phase: jnp.ndarray     # [C] f32      (NCO phase, AM sync path)
    pll_freq: jnp.ndarray      # [C] f32      (NCO frequency, AM sync path)


def init_channel_state(num_channels: int, audio_fft_size: int) -> ChannelState:
    c, h = num_channels, audio_fft_size // 2
    return ChannelState(
        ssb_prev=jnp.zeros((c, h), jnp.float32),
        cplx_prev=jnp.zeros((c, h), jnp.complex64),
        fm_prev=jnp.zeros((c,), jnp.complex64),
        carrier_prev=jnp.zeros((c, h), jnp.complex64),
        pll_phase=jnp.zeros((c,), jnp.float32),
        pll_freq=jnp.zeros((c,), jnp.float32),
    )


# PLL loop gains for carrier sync, after liquid's
# nco_crcf_pll_set_bandwidth(0.001) (src/signal.cpp:61):
# alpha = bw applied to frequency, beta = sqrt(bw) applied to phase.
PLL_BW = 0.001
PLL_ALPHA = PLL_BW
PLL_BETA = PLL_BW ** 0.5


def am_sync_detect(carrier: jnp.ndarray, baseband: jnp.ndarray,
                   phase0: jnp.ndarray, freq0: jnp.ndarray
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PLL carrier-synchronous AM detection (src/signal.cpp:242-252).

    carrier, baseband: [C, L] c64 (carrier = <500 Hz lowpassed copy).
    Per sample: mix both down by the NCO, phase error = arg(carrier),
    2nd-order loop update, output = Re(baseband mixed).
    Returns (audio [C, L], phase [C], freq [C]).
    """
    from . import unroll

    def step(carry, inputs):
        phase, freq = carry
        v_car, v_base = inputs
        rot = jnp.exp(-1j * phase).astype(jnp.complex64)
        v0 = v_car * rot
        v1 = v_base * rot
        err = jnp.angle(v0)
        freq = freq + PLL_ALPHA * err
        phase = phase + PLL_BETA * err             # pll phase adjust
        # wrap like liquid's NCO phase constraint: the carried phase
        # otherwise grows by ~freq rad/sample forever, and once it
        # reaches ~1e7 the float32 ULP is ~1 rad -- exp(-1j*phase)
        # rotates by quantization noise and the PLL unlocks after days
        # of server uptime
        phase = jnp.mod(phase + freq, 2.0 * jnp.pi)  # nco step
        return (phase, freq), jnp.real(v1)

    k = unroll.scan_unroll(carrier.shape[1], unroll.PLL_UNROLL)
    (phase, freq), out = unroll.unrolled_scan(
        step, (phase0, freq0), (carrier, baseband), k)
    return out, phase, freq


def extend_spectrum(spec: jnp.ndarray, is_real: bool, fft_result_size: int,
                    audio_max_fft_size: int) -> jnp.ndarray:
    """Append the DC-wrap tail: ext[R:R+A] = spec[0:A] for IQ.

    Mirrors the memcpy in src/fft.cpp:91-98 that makes slices crossing
    DC contiguous.  For real input the tail region is zeros (the
    reference leaves it uninitialized; zeros are the benign choice).
    """
    r, a = fft_result_size, audio_max_fft_size
    spec = spec[..., :r]
    if is_real:
        tail = jnp.zeros(spec.shape[:-1] + (a,), spec.dtype)
    else:
        tail = spec[..., :a]
    return jnp.concatenate([spec, tail], axis=-1)


def _gather_bins(spec_ext: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked gather from the extended spectrum: [C, K] indices -> values."""
    maxi = spec_ext.shape[-1] - 1
    safe = jnp.clip(idx, 0, maxi)
    vals = spec_ext[safe]
    return jnp.where(valid, vals, jnp.zeros((), spec_ext.dtype))


def demodulate(
    spec_ext: jnp.ndarray,
    chans: ChannelTable,
    state: ChannelState,
    frame_num: jnp.ndarray,
    *,
    audio_fft_size: int,
    fft_result_size: int,
    base_idx: int,
    is_real: bool,
    am_sync: bool = False,
    carrier_cutoff: int = 0,
) -> tuple[ChannelState, jnp.ndarray, jnp.ndarray]:
    """One hop of batched demodulation for all channels.

    spec_ext: [R + A] complex64 normalized spectrum in natural FFT order
    with the wrap tail appended (see extend_spectrum).
    frame_num: scalar int32 global hop counter (drives parity).
    Returns (new_state, audio [C, A/2] f32, avg_power [C] f32).
    """
    a = audio_fft_size
    half = a // 2
    c = chans.l.shape[0]

    start = (chans.l + base_idx) % fft_result_size          # [C] slice pointer
    audio_r = chans.r - chans.l                              # [C] slice length
    m_rel = chans.m_idx - chans.l                            # [C] mid relative to slice

    # ---- average slice power over [0, r-l) (signal.cpp:117-119) ----
    k_a = jnp.arange(a, dtype=jnp.int32)                     # [A]
    slice_idx = start[:, None] + k_a[None, :]                # [C, A]
    slice_valid = k_a[None, :] < audio_r[:, None]
    slice_vals = _gather_bins(spec_ext, slice_idx, slice_valid)
    avg_power = jnp.sum(
        jnp.real(slice_vals) ** 2 + jnp.imag(slice_vals) ** 2, axis=-1
    )

    # ---- SSB path: c2r input bins [0, A/2] (signal.cpp:126-156) ----
    k_r = jnp.arange(half + 1, dtype=jnp.int32)              # [A/2+1]
    usb_rel = m_rel[:, None] + k_r[None, :]                  # bin m+k
    lsb_rel = m_rel[:, None] - k_r[None, :]                  # bin m-k
    is_lsb = (chans.mode == MODE_LSB)[:, None]
    ssb_rel = jnp.where(is_lsb, lsb_rel, usb_rel)
    ssb_valid = (ssb_rel >= 0) & (ssb_rel < audio_r[:, None])
    ssb_bins = _gather_bins(spec_ext, start[:, None] + ssb_rel, ssb_valid)
    # FFTW unnormalized c2r == irfft * A
    ssb_wave = jnp.fft.irfft(ssb_bins, n=a) * a              # [C, A]
    ssb_wave = jnp.where(is_lsb, ssb_wave[:, ::-1], ssb_wave)

    # ---- AM/FM path: c2c input (signal.cpp:173-214) ----
    t = jnp.arange(a, dtype=jnp.int32)                       # [A]
    pos_rel = m_rel[:, None] + t[None, :]
    neg_rel = m_rel[:, None] - (a - t)[None, :]
    is_pos = t[None, :] < half
    is_neg = t[None, :] > half
    cplx_rel = jnp.where(is_pos, pos_rel, neg_rel)
    cplx_valid = (
        (is_pos | is_neg)
        & (cplx_rel >= 0)
        & (cplx_rel < audio_r[:, None])
    )
    cplx_bins = _gather_bins(spec_ext, start[:, None] + cplx_rel, cplx_valid)
    cplx_wave = jnp.fft.ifft(cplx_bins) * a                  # [C, A] c64

    # ---- parity fix-up (signal.cpp:160-168, 223-234) ----
    m_even = (chans.m_idx % 2) == 0
    parity_mode = (~m_even) if is_real else m_even
    negate = ((frame_num % 2) == 1) & parity_mode            # [C]
    sgn_f = jnp.where(negate, -1.0, 1.0)[:, None]
    ssb_wave = ssb_wave * sgn_f
    cplx_wave = cplx_wave * sgn_f.astype(jnp.complex64)

    # ---- overlap-add (signal.cpp:170-172, 235-241) ----
    ssb_out = ssb_wave[:, :half] + state.ssb_prev
    new_ssb_prev = ssb_wave[:, half:]
    cplx_out = cplx_wave[:, :half] + state.cplx_prev
    new_cplx_prev = cplx_wave[:, half:]

    env_audio = jnp.sqrt(
        jnp.real(cplx_out) ** 2 + jnp.imag(cplx_out) ** 2
    )
    if am_sync:
        env_col = (chans.am_env if chans.am_env is not None
                   else jnp.zeros((c,), bool))
        # run the carrier path only when some active listener needs
        # it (a per-sample PLL scan otherwise taxes every step; same
        # skip pattern as the RDS stage, pipeline.audio_from_spectra)
        need_pll = jnp.any(chans.active & (chans.mode == MODE_AM)
                           & ~env_col)

        def _pll_run(op):
            carrier_prev, phase0, freq0 = op
            # ---- carrier path: <500 Hz lowpass of the same bins, own
            # IFFT + overlap-add, feeding the PLL (signal.cpp:205-252)
            keep = ((t[None, :] < carrier_cutoff)
                    | (t[None, :] >= a - carrier_cutoff))
            car_wave = jnp.fft.ifft(jnp.where(keep, cplx_bins, 0)) * a
            car_wave = car_wave * sgn_f.astype(jnp.complex64)
            car_out = car_wave[:, :half] + carrier_prev
            am, pll_phase, pll_freq = am_sync_detect(
                car_out, cplx_out, phase0, freq0)
            # per-client envelope opt-out of the carrier sync
            am = jnp.where(env_col[:, None], env_audio, am)
            return am, car_wave[:, half:], pll_phase, pll_freq

        def _pll_skip(op):
            carrier_prev, phase0, freq0 = op
            return env_audio, carrier_prev, phase0, freq0

        am_audio, new_carrier_prev, pll_phase, pll_freq = jax.lax.cond(
            need_pll, _pll_run, _pll_skip,
            (state.carrier_prev, state.pll_phase, state.pll_freq))
    else:
        # ---- AM envelope, the reference's non-liquid fallback
        # (dsp.cpp:116-126) ----
        am_audio = env_audio
        new_carrier_prev = state.carrier_prev
        pll_phase, pll_freq = state.pll_phase, state.pll_freq

    # ---- FM polar discriminator (dsp.cpp:27-35) ----
    prev = jnp.concatenate([state.fm_prev[:, None], cplx_out[:, :-1]], axis=1)
    fm_audio = jnp.angle(cplx_out * jnp.conj(prev))

    mode = chans.mode[:, None]
    audio = jnp.where(
        mode == MODE_AM, am_audio,
        jnp.where(mode == MODE_FM, fm_audio, ssb_out),
    )
    # Non-finite guard: the reference throws away the frame
    # (signal.cpp:266-271); functionally we zero the offending samples
    # instead.  isfinite, not isnan: a surviving +-inf sample turns the
    # downstream DC blocker's cumsum into inf - inf = NaN and poisons
    # the AGC gain carry PERMANENTLY (the gain recursion's comparisons
    # are all False for NaN, so it never recovers).
    audio = jnp.where(jnp.isfinite(audio), audio, 0.0)

    new_state = ChannelState(
        ssb_prev=new_ssb_prev,
        cplx_prev=new_cplx_prev,
        fm_prev=cplx_out[:, -1],
        carrier_prev=new_carrier_prev,
        pll_phase=pll_phase,
        pll_freq=pll_freq,
    )
    return new_state, audio, avg_power


def _demod_barrier(c: int, fusion_barriers: bool | None):
    """Above ~1024 channels XLA's fused gather+IFFT+demod mega-kernel
    leaves the VMEM-friendly regime and the composed stage goes
    super-linear (12.3 -> 40.6 ms for 1024 -> 2048 on a v5e) while
    every sub-stage stays linear in isolation (PERF.md round-4
    scaling section; tools/chunk_exp.py).  Materialization barriers
    at the gather->IFFT and IFFT->demod-math seams keep the fusions
    sized to what was measured linear.  Semantically the identity."""
    if fusion_barriers is None:
        fusion_barriers = c > 1024
    return (jax.lax.optimization_barrier if fusion_barriers
            else (lambda x: x))


def gather_channel_bins(
    spec_ext: jnp.ndarray,
    chans: ChannelTable,
    *,
    audio_fft_size: int,
    fft_result_size: int,
    base_idx: int,
    fusion_barriers: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage A of demodulate_batch: the three dense bin gathers.
    [B, R+A] -> (ssb_bins [B, C, A/2+1], cplx_bins [B, C, A],
    avg_power [B, C]).  Split out so the gather->demod seam can run as
    two dispatches (tools/chunk_exp.py --split experiment)."""
    a = audio_fft_size
    half = a // 2
    c = chans.l.shape[0]
    barrier = _demod_barrier(c, fusion_barriers)

    start = (chans.l + base_idx) % fft_result_size
    audio_r = chans.r - chans.l
    m_rel = chans.m_idx - chans.l
    maxi = spec_ext.shape[-1] - 1

    def gather(rel_idx, valid):
        """[C, K] slice-relative bins -> [B, C, K] values (one gather)."""
        safe = jnp.clip(start[:, None] + rel_idx, 0, maxi)
        vals = spec_ext[:, safe]                         # [B, C, K]
        return jnp.where(valid[None], vals, jnp.zeros((), spec_ext.dtype))

    # ---- average slice power (signal.cpp:117-119) ----
    k_a = jnp.arange(a, dtype=jnp.int32)
    slice_vals = gather(k_a[None, :].repeat(c, 0),
                        k_a[None, :] < audio_r[:, None])
    avg_power = jnp.sum(
        jnp.real(slice_vals) ** 2 + jnp.imag(slice_vals) ** 2, axis=-1)

    # ---- SSB bins (signal.cpp:126-156) ----
    k_r = jnp.arange(half + 1, dtype=jnp.int32)
    usb_rel = m_rel[:, None] + k_r[None, :]
    lsb_rel = m_rel[:, None] - k_r[None, :]
    is_lsb = (chans.mode == MODE_LSB)[:, None]
    ssb_rel = jnp.where(is_lsb, lsb_rel, usb_rel)
    ssb_valid = (ssb_rel >= 0) & (ssb_rel < audio_r[:, None])
    ssb_bins = barrier(gather(ssb_rel, ssb_valid))       # [B, C, A/2+1]

    # ---- AM/FM bins (signal.cpp:173-214) ----
    t = jnp.arange(a, dtype=jnp.int32)
    pos_rel = m_rel[:, None] + t[None, :]
    neg_rel = m_rel[:, None] - (a - t)[None, :]
    is_pos = t[None, :] < half
    is_neg = t[None, :] > half
    cplx_rel = jnp.where(is_pos, pos_rel, neg_rel)
    cplx_valid = ((is_pos | is_neg) & (cplx_rel >= 0)
                  & (cplx_rel < audio_r[:, None]))
    cplx_bins = barrier(gather(cplx_rel, cplx_valid))    # [B, C, A]
    return ssb_bins, cplx_bins, avg_power


def demodulate_batch(
    spec_ext: jnp.ndarray,
    chans: ChannelTable,
    state: ChannelState,
    frame0: jnp.ndarray,
    *,
    audio_fft_size: int,
    fft_result_size: int,
    base_idx: int,
    is_real: bool,
    am_sync: bool = False,
    carrier_cutoff: int = 0,
    fusion_barriers: bool | None = None,
) -> tuple[ChannelState, jnp.ndarray, jnp.ndarray]:
    """All-hops batched demodulation: [B, R+A] -> (state,
    audio [B, C, A/2], avg_power [B, C]).

    Numerically identical to scanning `demodulate` over the batch
    (pinned by tests/test_channelizer.py), but restructured for the
    TPU: the bin gathers, the [B*C, A] IFFTs and the parity negation
    are hop-independent, so they run as ONE batched computation instead
    of B serial scan iterations; the only true sequential dependencies
    -- overlap-add, the FM discriminator seed and the AM-sync PLL --
    are expressed as batched shifts (overlap-add/FM need only the
    PREVIOUS hop's wave, available in-batch) and, for the PLL alone, a
    per-sample scan.  Cuts the profiled demod stage ~4x at the
    north-star config (PERF.md).

    Composed as gather_channel_bins (stage A) + demodulate_from_bins
    (stage B); the split exists for the two-dispatch experiment and
    keeps this function the single production entry point.
    """
    ssb_bins, cplx_bins, avg_power = gather_channel_bins(
        spec_ext, chans, audio_fft_size=audio_fft_size,
        fft_result_size=fft_result_size, base_idx=base_idx,
        fusion_barriers=fusion_barriers)
    return demodulate_from_bins(
        ssb_bins, cplx_bins, avg_power, chans, state, frame0,
        audio_fft_size=audio_fft_size, is_real=is_real, am_sync=am_sync,
        carrier_cutoff=carrier_cutoff, fusion_barriers=fusion_barriers)


def demodulate_from_bins(
    ssb_bins: jnp.ndarray,
    cplx_bins: jnp.ndarray,
    avg_power: jnp.ndarray,
    chans: ChannelTable,
    state: ChannelState,
    frame0: jnp.ndarray,
    *,
    audio_fft_size: int,
    is_real: bool,
    am_sync: bool = False,
    carrier_cutoff: int = 0,
    fusion_barriers: bool | None = None,
) -> tuple[ChannelState, jnp.ndarray, jnp.ndarray]:
    """Stage B of demodulate_batch: batched IFFTs, parity fix-up,
    overlap-add and the per-mode demod math."""
    a = audio_fft_size
    half = a // 2
    b = ssb_bins.shape[0]
    c = chans.l.shape[0]
    barrier = _demod_barrier(c, fusion_barriers)
    is_lsb = (chans.mode == MODE_LSB)[:, None]
    t = jnp.arange(a, dtype=jnp.int32)

    ssb_wave = barrier(jnp.fft.irfft(ssb_bins, n=a) * a)  # [B, C, A]
    ssb_wave = jnp.where(is_lsb[None], ssb_wave[..., ::-1], ssb_wave)
    cplx_wave = barrier(jnp.fft.ifft(cplx_bins) * a)

    # ---- parity fix-up, vectorized over hops (signal.cpp:160-168) ----
    m_even = (chans.m_idx % 2) == 0
    parity_mode = (~m_even) if is_real else m_even
    frames = frame0 + jnp.arange(b, dtype=jnp.int32)
    negate = ((frames % 2) == 1)[:, None] & parity_mode[None, :]
    sgn = jnp.where(negate, -1.0, 1.0)[:, :, None]       # [B, C, 1]
    ssb_wave = ssb_wave * sgn
    cplx_wave = cplx_wave * sgn.astype(jnp.complex64)

    # ---- overlap-add as a batched shift: hop h's carry-in is hop
    # h-1's second half, already in the batch (signal.cpp:170-172) ----
    ssb_out = ssb_wave[:, :, :half] + jnp.concatenate(
        [state.ssb_prev[None], ssb_wave[:-1, :, half:]])
    new_ssb_prev = ssb_wave[-1, :, half:]
    cplx_out = cplx_wave[:, :, :half] + jnp.concatenate(
        [state.cplx_prev[None], cplx_wave[:-1, :, half:]])
    new_cplx_prev = cplx_wave[-1, :, half:]

    env_audio = jnp.sqrt(
        jnp.real(cplx_out) ** 2 + jnp.imag(cplx_out) ** 2)
    if am_sync:
        env_col = (chans.am_env if chans.am_env is not None
                   else jnp.zeros((c,), bool))
        # the PLL is the one truly per-sample recursion in the demod
        # path; skip the whole carrier stage unless an active AM
        # listener actually wants carrier sync (same lax.cond pattern
        # as the RDS stage -- with no such listener the carries go
        # stale and the next one re-locks / is reset-zeroed)
        need_pll = jnp.any(chans.active & (chans.mode == MODE_AM)
                           & ~env_col)

        def _pll_run(op):
            carrier_prev, phase0, freq0 = op
            keep = ((t[None, :] < carrier_cutoff)
                    | (t[None, :] >= a - carrier_cutoff))
            car_wave = jnp.fft.ifft(jnp.where(keep[None], cplx_bins, 0)) * a
            car_wave = car_wave * sgn.astype(jnp.complex64)
            car_out = car_wave[:, :, :half] + jnp.concatenate(
                [carrier_prev[None], car_wave[:-1, :, half:]])
            # scan over the whole batch's concatenated time stream
            car_flat = car_out.transpose(1, 0, 2).reshape(c, b * half)
            base_flat = cplx_out.transpose(1, 0, 2).reshape(c, b * half)
            am_flat, pll_phase, pll_freq = am_sync_detect(
                car_flat, base_flat, phase0, freq0)
            am = am_flat.reshape(c, b, half).transpose(1, 0, 2)
            # per-client envelope opt-out of the carrier sync
            am = jnp.where(env_col[None, :, None], env_audio, am)
            return am, car_wave[-1, :, half:], pll_phase, pll_freq

        def _pll_skip(op):
            carrier_prev, phase0, freq0 = op
            return env_audio, carrier_prev, phase0, freq0

        am_audio, new_carrier_prev, pll_phase, pll_freq = jax.lax.cond(
            need_pll, _pll_run, _pll_skip,
            (state.carrier_prev, state.pll_phase, state.pll_freq))
    else:
        am_audio = env_audio
        new_carrier_prev = state.carrier_prev
        pll_phase, pll_freq = state.pll_phase, state.pll_freq

    # ---- FM discriminator: the cross-hop seed is in-batch too ----
    flat = cplx_out.transpose(1, 0, 2).reshape(c, b * half)
    prev_flat = jnp.concatenate([state.fm_prev[:, None], flat[:, :-1]],
                                axis=1)
    fm_audio = (jnp.angle(flat * jnp.conj(prev_flat))
                .reshape(c, b, half).transpose(1, 0, 2))
    new_fm_prev = flat[:, -1]

    mode = chans.mode[None, :, None]
    audio = jnp.where(
        mode == MODE_AM, am_audio,
        jnp.where(mode == MODE_FM, fm_audio, ssb_out),
    )
    # Non-finite guard (documented deviation; signal.cpp:266-271 drops
    # the frame).  isfinite, not isnan: +-inf would NaN-poison the AGC
    # carry downstream -- see demodulate()'s guard.
    audio = jnp.where(jnp.isfinite(audio), audio, 0.0)

    new_state = ChannelState(
        ssb_prev=new_ssb_prev,
        cplx_prev=new_cplx_prev,
        fm_prev=new_fm_prev,
        carrier_prev=new_carrier_prev,
        pll_phase=pll_phase,
        pll_freq=pll_freq,
    )
    return new_state, audio, avg_power


def float_to_int16(audio: jnp.ndarray, mult: float = 65536.0 / 4.0) -> jnp.ndarray:
    """Round-half-up float -> int16 (reference src/utils/dsp.cpp:152-165).

    out = clamp((int)(x*mult + 32768.5) - 32768, -32768, 32767).
    """
    v = jnp.floor(audio * mult + 32768.5) - 32768.0
    return jnp.clip(v, -32768.0, 32767.0).astype(jnp.int16)
