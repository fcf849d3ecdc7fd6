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
    extend_spectrum, demodulate, float_to_int16,
)
from .ops.agc import (
    AGCParams, AGCState, DCBlockerState, dc_blocker, dc_blocker_delay,
    init_dc_state, agc_process, make_agc_params, init_agc_state,
)


class AudioState(NamedTuple):
    """All per-channel carries (rows sharded over the channel axis)."""

    chan: ChannelState
    dc: "DCBlockerState"
    agc: "AGCState"


class HopState(NamedTuple):
    frame: jnp.ndarray       # scalar int32: global hop counter
    audio: AudioState


class HopOutputs(NamedTuple):
    audio: jnp.ndarray       # [B, C, A/2] int16
    avg_power: jnp.ndarray   # [B, C] f32
    pyramid: jnp.ndarray     # [B, P] int8 flat waterfall pyramid (or [B, 0])


def init_audio_state(cfg: ServerConfig, num_channels: int,
                     agc_params: AGCParams, dc_delay: int) -> AudioState:
    return AudioState(
        chan=init_channel_state(num_channels, cfg.audio_fft_size),
        dc=init_dc_state(num_channels, dc_delay),
        agc=init_agc_state(num_channels, agc_params.window),
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


def audio_from_spectra(
    cfg: ServerConfig,
    agc_params: AGCParams,
    dc_delay: int,
    audio_state: AudioState,
    spec_ext: jnp.ndarray,       # [B, R+A]
    chans: ChannelTable,
    frame0: jnp.ndarray,         # scalar int32: global index of hop 0
) -> tuple[AudioState, jnp.ndarray, jnp.ndarray]:
    """Scan the batched demod + DC/AGC/int16 chain over B hops."""
    a = cfg.audio_fft_size
    b = spec_ext.shape[0]

    def hop_body(carry, inputs):
        chan_st, dc_st, agc_st = carry
        se, fnum = inputs
        chan_st, audio, pwr = demodulate(
            se, chans, chan_st, fnum,
            audio_fft_size=a, fft_result_size=cfg.fft_result_size,
            base_idx=cfg.base_idx, is_real=cfg.is_real,
        )
        dc_st, audio = dc_blocker(dc_st, audio, dc_delay)
        agc_st, audio = agc_process(agc_st, audio, agc_params)
        return (chan_st, dc_st, agc_st), (float_to_int16(audio), pwr)

    frames_idx = frame0 + jnp.arange(b, dtype=jnp.int32)
    (chan_st, dc_st, agc_st), (audio16, pwr) = jax.lax.scan(
        hop_body, (audio_state.chan, audio_state.dc, audio_state.agc),
        (spec_ext, frames_idx),
    )
    return AudioState(chan=chan_st, dc=dc_st, agc=agc_st), audio16, pwr


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
        self._step_wf = jax.jit(
            partial(self._step, want_waterfall=True), donate_argnums=(0,),
        )
        self._step_nowf = jax.jit(
            partial(self._step, want_waterfall=False), donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    def init_state(self) -> HopState:
        return HopState(
            frame=jnp.zeros((), jnp.int32),
            audio=init_audio_state(self.cfg, self.num_channels,
                                   self.agc_params, self.dc_delay),
        )

    def empty_channels(self) -> ChannelTable:
        c = self.num_channels
        z = jnp.zeros((c,), jnp.int32)
        return ChannelTable(l=z, r=z, m_idx=z, mode=z,
                            active=jnp.zeros((c,), bool))

    # ------------------------------------------------------------------
    def _step(self, state: HopState, raw: jnp.ndarray, chans: ChannelTable,
              want_waterfall: bool) -> tuple[HopState, HopOutputs]:
        cfg = self.cfg
        b = self.hop_batch
        r, a = cfg.fft_result_size, cfg.audio_max_fft_size

        spec = spectra_from_raw(cfg, self.window, raw, b)
        if want_waterfall:
            pyr = waterfall_from_spectra(cfg, spec)
        else:
            pyr = jnp.zeros((b, 0), jnp.int8)

        spec_ext = extend_spectrum(spec, cfg.is_real, r, a)
        audio_st, audio16, pwr = audio_from_spectra(
            cfg, self.agc_params, self.dc_delay,
            state.audio, spec_ext, chans, state.frame,
        )
        new_state = HopState(frame=state.frame + b, audio=audio_st)
        return new_state, HopOutputs(audio=audio16, avg_power=pwr, pyramid=pyr)

    # ------------------------------------------------------------------
    def step(self, state: HopState, raw: jnp.ndarray, chans: ChannelTable,
             want_waterfall: bool = True) -> tuple[HopState, HopOutputs]:
        """raw: [(B+1) * hop_size] wire samples (halo prepended by host)."""
        fn = self._step_wf if want_waterfall else self._step_nowf
        return fn(state, raw, chans)


def channels_from_numpy(l, r, m_idx, mode, active) -> ChannelTable:
    """Host-side helper: build a device ChannelTable from numpy arrays."""
    return ChannelTable(
        l=jnp.asarray(l, jnp.int32),
        r=jnp.asarray(r, jnp.int32),
        m_idx=jnp.asarray(m_idx, jnp.int32),
        mode=jnp.asarray(mode, jnp.int32),
        active=jnp.asarray(active, bool),
    )
