"""Mesh-sharded hop pipeline: time-sharded FFT + channel-sharded demod.

The reference has no distributed backend at all (SURVEY.md section 5);
its parallelism is host threads.  The TPU-native scaling design is:

- one mesh axis ``d`` over all chips,
- **time sharding** for the heavy front half: each chip receives
  ``hop_batch / n`` hops of raw samples (with the 50%-overlap halo
  pre-attached by the host, so there is no cross-chip sequential
  dependency) and runs the full window+FFT+waterfall-quantize for its
  hops.  The per-chip million-point FFT stays whole -- the speed of
  light per chip is the single-hop FFT, and hops are embarrassingly
  parallel,
- an ``all_gather`` of the (normalized, wrap-extended) spectra over ICI
  so every chip holds all hops' spectra -- at 1M bins x c64 this is
  ~8 MB/hop, far below ICI bandwidth at the ~67 hop/s rate of 35 MSPS,
- **channel sharding** for the back half: each chip demodulates
  ``max_channels / n`` listeners across ALL hops of the batch, keeping
  the sequential overlap-add/DC/AGC carries chip-local.  This is the
  dense-population replacement for the reference's per-client thread
  pool jobs (src/websocket.cpp:156-185).

Waterfall pyramids come back time-sharded ([B/n, P] per chip ->
[B, P]); audio comes back channel-sharded ([B, C/n, A/2] per chip ->
[B, C, A/2]).  No other collectives are needed.

Multi-host: the same shard_map spans a multi-host mesh; each host feeds
the raw shards for its addressable devices (jax.make_array_from_
single_device_arrays), and DCN only ever carries the raw sample
distribution, never spectra.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..config import ServerConfig
from ..ops.channelizer import ChannelTable, extend_spectrum
from ..ops.agc import dc_blocker_delay, make_agc_params
from ..ops.windows import hann_window
from ..pipeline import (
    HopState, HopOutputs, init_audio_state,
    spectra_from_raw, waterfall_from_spectra, audio_from_spectra,
)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(list(devices), axis_names=("d",))


class ShardedHopPipeline:
    """Hop pipeline pjit'd over a 1-D device mesh (axis 'd')."""

    def __init__(self, cfg: ServerConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.n = mesh.size
        if cfg.hop_batch % self.n:
            raise ValueError("hop_batch must divide evenly over the mesh")
        if cfg.max_channels % self.n:
            raise ValueError("max_channels must divide evenly over the mesh")
        self.window = hann_window(cfg.fft_size)
        self.agc_params = make_agc_params(cfg.audio_sps)
        self.dc_delay = dc_blocker_delay(cfg.audio_sps)
        self.wire_per_hop = cfg.hop_size * (1 if cfg.is_real else 2)
        self.hops_per_shard = cfg.hop_batch // self.n
        # raw input shape: [n, (B/n + 1) * wire_per_hop] -- each row is a
        # time shard's hops with its own halo prepended by the host.
        self.raw_shard_len = (self.hops_per_shard + 1) * self.wire_per_hop

        st_spec = HopState(
            frame=P(),
            audio=jax.tree.map(lambda _: P("d"), self._audio_state_proto_spec()),
        )
        chan_spec = ChannelTable(*(P("d"),) * 5)
        out_spec = HopOutputs(
            audio=P(None, "d", None), avg_power=P(None, "d"),
            wf=P("d", None, None), pyramid=P("d", None), packed=P("d"),
        )
        for want_wf in (True, False):
            fn = shard_map(
                partial(self._device_step, want_waterfall=want_wf),
                mesh=mesh,
                in_specs=(st_spec, P("d", None), chan_spec),
                out_specs=(st_spec, out_spec),
            )
            fn = jax.jit(fn, donate_argnums=(0,))
            if want_wf:
                self._step_wf = fn
            else:
                self._step_nowf = fn

    # ------------------------------------------------------------------
    def _audio_state_proto(self):
        return init_audio_state(self.cfg, self.cfg.max_channels,
                                self.agc_params, self.dc_delay)

    def _audio_state_proto_spec(self):
        """Structure without materializing arrays (safe on all backends)."""
        return jax.eval_shape(self._audio_state_proto)

    def init_state(self) -> HopState:
        # jit-constructed with explicit output shardings (avoids eager
        # complex64 creation, see HopPipeline.init_state)
        sh = NamedSharding(self.mesh, P())
        shd = NamedSharding(self.mesh, P("d"))
        shardings = HopState(
            frame=sh,
            audio=jax.tree.map(lambda _: shd, self._audio_state_proto_spec()),
        )

        def mk():
            return HopState(frame=jnp.zeros((), jnp.int32),
                            audio=self._audio_state_proto())
        return jax.jit(mk, out_shardings=shardings)()

    # ------------------------------------------------------------------
    def _device_step(self, state: HopState, raw_shard: jnp.ndarray,
                     chans: ChannelTable, want_waterfall: bool):
        """Per-device body (inside shard_map)."""
        cfg = self.cfg
        bl = self.hops_per_shard
        r, a = cfg.fft_result_size, cfg.audio_max_fft_size

        # front half: my hops only
        spec = spectra_from_raw(cfg, self.window, raw_shard[0], bl)
        if want_waterfall:
            pyr = waterfall_from_spectra(cfg, spec)
        else:
            pyr = jnp.zeros((bl, 0), jnp.int8)
        spec_ext = extend_spectrum(spec, cfg.is_real, r, a)  # [B/n, R+A]

        # gather all hops' spectra (ICI all-gather along the hop axis)
        all_spec = jax.lax.all_gather(spec_ext, "d", axis=0, tiled=True)

        # back half: all hops for my channel shard
        audio_st, audio16, pwr = audio_from_spectra(
            cfg, self.agc_params, self.dc_delay,
            state.audio, all_spec, chans, state.frame,
        )
        new_state = HopState(frame=state.frame + cfg.hop_batch,
                             audio=audio_st)
        # client-view gathering is single-device-pipeline-only for now;
        # the multichip path returns the full (time-sharded) pyramid
        wf = jnp.zeros((0, 1, 2 * cfg.waterfall_size), jnp.int8)
        return new_state, HopOutputs(
            audio=audio16, avg_power=pwr, wf=wf, pyramid=pyr,
            packed=jnp.zeros((0,), jnp.int8),
        )

    # ------------------------------------------------------------------
    def shard_raw(self, raw_with_halo) -> jnp.ndarray:
        """Host helper: [B*wph + wph] contiguous wire samples (halo at the
        front) -> [n, (B/n + 1) * wph] per-shard rows with halos."""
        import numpy as np

        wph = self.wire_per_hop
        rows = [
            raw_with_halo[i * self.hops_per_shard * wph:
                          (i * self.hops_per_shard + self.hops_per_shard + 1) * wph]
            for i in range(self.n)
        ]
        return np.stack(rows, axis=0)

    def step(self, state: HopState, raw_shards: jnp.ndarray,
             chans: ChannelTable, want_waterfall: bool = True):
        fn = self._step_wf if want_waterfall else self._step_nowf
        return fn(state, raw_shards, chans)
