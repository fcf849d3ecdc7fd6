"""Mesh-sharded hop pipeline: time-sharded FFT + channel-sharded demod,
with the 50%-overlap halo exchanged over ICI.

The reference has no distributed backend at all (SURVEY.md section 5);
its parallelism is host threads.  The TPU-native scaling design is:

- one mesh axis ``d`` over all chips,
- **time sharding** for the heavy front half: each chip receives
  ``hop_batch / n`` contiguous hops of raw wire samples and runs the
  full window+FFT+waterfall-quantize for them.  The per-chip
  million-point FFT stays whole -- the speed of light per chip is the
  single-hop FFT, and hops are embarrassingly parallel,
- the 50%-overlap **halo** (one hop of wire samples) moves between
  neighbor chips with a single ring ``ppermute`` per step: chip i
  receives chip i-1's last hop (its first frame's left half); chip 0's
  halo is the previous step's global tail, which the same ring permute
  delivered to it one step earlier (kept as carry state).  This is the
  overlap-save boundary exchange the reference's analogue of context
  parallelism calls for (SURVEY.md section 5, fft.cpp:49),
- an ``all_gather`` of the (normalized, wrap-extended) spectra over ICI
  so every chip holds all hops' spectra -- ~8 MB/hop at 1M bins, far
  below ICI bandwidth at the ~67 hop/s rate of 35 MSPS,
- **channel sharding** for the back half: each chip demodulates
  ``max_channels / n`` listeners across ALL hops of the batch, keeping
  the sequential overlap-add/DC/AGC carries chip-local, and gathers its
  waterfall-client views from its local pyramid rows.

Outputs mirror the single-device pipeline's leaves: audio comes back
channel-sharded, waterfall views time-sharded, plus the bitcast-packed
single-fetch buffer.  NOTE the packed buffer is a per-shard
concatenation -- parse it with `unpack_outputs_sharded`, NOT
pipeline.unpack_outputs.

Multi-host: the same shard_map spans a multi-host mesh; each host feeds
the raw shards for its addressable devices
(jax.make_array_from_single_device_arrays), and DCN only ever carries
raw sample distribution, never spectra.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..config import ServerConfig
from ..ops.channelizer import ChannelTable, extend_spectrum
from ..ops.agc import dc_blocker_delay, make_agc_params
from ..ops.windows import hann_window
from ..ops.fft import frame_hops
from ..ops import convert
from ..pipeline import (
    HopState, HopOutputs, WaterfallViews, init_audio_state,
    waterfall_from_spectra, gather_waterfall_views, audio_from_spectra,
    pack_outputs, opus_decim_taps, waterfall_due_positions,
    stereo_params_for, nr_params_for, rds_params_for, deemph_alpha_for,
)
from ..ops.fft import forward_spectrum


class ShardedHopState(NamedTuple):
    inner: HopState          # frame counter + audio carries (chan-sharded)
    halo: jnp.ndarray        # [n, wire_per_hop] each shard's last-hop wire
    #                          samples (ring-permuted at step start)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(list(devices), axis_names=("d",))


class ShardedHopPipeline:
    """Hop pipeline pjit'd over a 1-D device mesh (axis 'd').

    gather_wf=True additionally all-gathers the (tiny) waterfall view
    rows over ICI so EVERY shard -- and hence every host of a multi-host
    mesh -- holds all due rows replicated: any host can then serve any
    waterfall client from its local shards without cross-host fetches
    (parallel/multihost.py).  Costs one [due_rows, W, view_cap] int8
    all-gather (~100 kB at 100 clients) per due step."""

    def __init__(self, cfg: ServerConfig, mesh: Mesh, gather_wf: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.gather_wf = gather_wf
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
        self.view_cap = cfg.view_cap
        self.num_channels = cfg.max_channels
        # per-shard waterfall view gather rows: max cadence-due hops any
        # single time shard can hold (host maps global due positions to
        # (shard, local) and pads; see due_layout)
        self.due_cap_local = max(1, -(-self.hops_per_shard // cfg.skip_num))
        # raw input: [n, (B/n) * wire_per_hop] -- NO halo; the overlap
        # halo moves over ICI (ring ppermute), not from the host.
        self.raw_shard_len = self.hops_per_shard * self.wire_per_hop

        st_spec = ShardedHopState(
            inner=HopState(
                frame=P(),
                audio=jax.tree.map(lambda _: P("d"),
                                   self._audio_state_proto_spec()),
            ),
            halo=P("d", None),
        )
        self.decim_taps = opus_decim_taps(cfg)
        self.stereo_params = stereo_params_for(cfg)
        self.nr_params = nr_params_for(cfg)
        self.rds_params = rds_params_for(cfg)
        self.deemph_a = deemph_alpha_for(cfg)
        # RDS baseband samples per channel per step (0 when off)
        self.rds_t = (cfg.hop_batch * (cfg.audio_fft_size // 2)
                      // self.rds_params.decim
                      if self.rds_params is not None else 0)
        chan_spec = ChannelTable(*(P("d"),) * 8)
        # views are replicated: every time shard gathers ALL clients'
        # views from its local pyramid rows
        views_spec = WaterfallViews(start=P(), length=P())
        # device Opus decimation flattens audio to channel-sharded
        # per-channel streams [C, B*half/f]
        audio_spec = (P("d", None) if self.decim_taps is not None
                      else P(None, "d", None))
        wf_spec = P(None, None, None) if gather_wf else P("d", None, None)
        out_spec = HopOutputs(
            audio=audio_spec, avg_power=P(None, "d"),
            wf=wf_spec, pyramid=P("d", None), rds=P("d", None, None),
            packed=P("d"),
        )
        self._steps = {}
        for mode in ("views", "full", "off"):
            fn = shard_map(
                partial(self._device_step, waterfall=mode),
                mesh=mesh,
                in_specs=(st_spec, P("d", None), chan_spec, views_spec,
                          P("d"), P("d", None)),
                out_specs=(st_spec, out_spec),
                # gather_wf replicates the wf rows via an all_gather whose
                # replication the static VMA checker cannot infer
                check_vma=not gather_wf,
            )
            self._steps[mode] = jax.jit(fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _audio_state_proto(self):
        return init_audio_state(self.cfg, self.cfg.max_channels,
                                self.agc_params, self.dc_delay)

    def _audio_state_proto_spec(self):
        """Structure without materializing arrays (safe on all backends)."""
        return jax.eval_shape(self._audio_state_proto)

    def init_state(self, frame0: int = 0) -> ShardedHopState:
        # frame0: see PipelineSingle.init_state -- seeds the hop-counter
        # parity when the driver rebuilds state mid-stream
        sh = NamedSharding(self.mesh, P())
        shd = NamedSharding(self.mesh, P("d"))
        shardings = ShardedHopState(
            inner=HopState(
                frame=sh,
                audio=jax.tree.map(lambda _: shd,
                                   self._audio_state_proto_spec()),
            ),
            halo=NamedSharding(self.mesh, P("d", None)),
        )
        # device_dtype, not wire_dtype: f64 input arrives as f32 after
        # host_preconvert, and the halo must concatenate with it
        dev_dt = convert.device_dtype(self.cfg.input_format)

        def mk():
            return ShardedHopState(
                inner=HopState(frame=jnp.full((), frame0 & 1, jnp.int32),
                               audio=self._audio_state_proto()),
                halo=jnp.zeros((self.n, self.wire_per_hop), dev_dt),
            )
        return jax.jit(mk, out_shardings=shardings)()

    # ------------------------------------------------------------------
    def _device_step(self, state: ShardedHopState, raw_shard: jnp.ndarray,
                     chans: ChannelTable, views: WaterfallViews,
                     reset: jnp.ndarray, due_idx: jnp.ndarray,
                     waterfall: str):
        """Per-device body (inside shard_map)."""
        cfg = self.cfg
        bl = self.hops_per_shard
        r, a = cfg.fft_result_size, cfg.audio_max_fft_size
        n = self.n

        my_raw = raw_shard[0]                          # [B/n * wph] wire ints
        my_tail = my_raw[-self.wire_per_hop:]

        # ---- overlap halo over ICI: ring permute of last-hop samples.
        # received[i] = tail of shard i-1 (this step) for i>0; for i==0
        # it is the global tail of THIS step (from shard n-1), which is
        # exactly next step's halo -> becomes the carry.  This step's
        # shard-0 halo is the carry from the previous step.
        if n > 1:
            perm = [(i, (i + 1) % n) for i in range(n)]
            received = jax.lax.ppermute(my_tail, "d", perm)
        else:
            received = my_tail
        idx = jax.lax.axis_index("d")
        prev_halo = state.halo[0]                      # my stored halo slot
        halo = jnp.where(idx == 0, prev_halo, received)
        new_halo = jnp.where(idx == 0, received, prev_halo)

        # ---- front half: my hops
        x = convert.to_float(jnp.concatenate([halo, my_raw]),
                             cfg.input_format)
        if not cfg.is_real:
            x = convert.iq_to_complex(x)
        frames = frame_hops(x, bl, cfg.fft_size)
        spec = forward_spectrum(frames, self.window, cfg.is_real,
                                cfg.fft_strategy)

        w = views.start.shape[0]
        if waterfall == "off":
            pyr = jnp.zeros((bl, 0), jnp.int8)
            wf = jnp.zeros((0, w, self.view_cap), jnp.int8)
        elif waterfall == "full":
            pyr = waterfall_from_spectra(cfg, spec)
            wf = jnp.zeros((0, w, self.view_cap), jnp.int8)
        else:
            pyr = jnp.zeros((bl, 0), jnp.int8)
            # build the pyramid ONLY for this shard's cadence-due local
            # hops (host maps global due positions to per-shard rows,
            # padded to the static due cap; see due_layout) -- non-due
            # hops' pyramids would be computed and discarded.  At
            # skip_num == 1 the local due set is always the identity;
            # skip the row gather (see pipeline._step)
            if cfg.skip_num == 1 and self.due_cap_local == bl:
                due_spec = spec
            else:
                due_spec = spec[due_idx[0]]
            pyr_due = waterfall_from_spectra(cfg, due_spec)
            wf = gather_waterfall_views(pyr_due, views, self.view_cap)
            if self.gather_wf:
                # replicate all shards' rows (see class docstring)
                wf = jax.lax.all_gather(wf, "d", axis=0, tiled=True)

        spec_ext = extend_spectrum(spec, cfg.is_real, r, a)  # [B/n, R+A]

        # ---- gather all hops' spectra (ICI) and demod my channel shard
        all_spec = jax.lax.all_gather(spec_ext, "d", axis=0, tiled=True)
        audio_st, audio16, pwr, rds8 = audio_from_spectra(
            cfg, self.agc_params, self.dc_delay,
            state.inner.audio, all_spec, chans, state.inner.frame, reset,
            decim_taps=self.decim_taps, stereo_params=self.stereo_params,
            nr_params=self.nr_params, rds_params=self.rds_params,
            deemph_a=self.deemph_a,
        )
        new_inner = HopState(frame=state.inner.frame + cfg.hop_batch,
                             audio=audio_st)
        # gather_wf mode (multihost) fetches EVERY output from its local
        # per-leaf views (MultihostRuntime.local_*), never via packed --
        # emit an empty buffer instead of materializing an unread
        # audio+pwr+rds copy in HBM each step
        if self.gather_wf:
            packed = jnp.zeros((0,), jnp.uint8)
        else:
            packed = pack_outputs(audio16, pwr, wf, rds8)
        return (
            ShardedHopState(inner=new_inner, halo=new_halo[None, :]),
            HopOutputs(audio=audio16, avg_power=pwr, wf=wf, pyramid=pyr,
                       rds=rds8, packed=packed),
        )

    # ------------------------------------------------------------------
    def empty_views(self, num: int = 0) -> WaterfallViews:
        c = num or self.n
        return WaterfallViews(start=jnp.zeros((c,), jnp.int32),
                              length=jnp.zeros((c,), jnp.int32))

    def shard_raw(self, raw_block) -> np.ndarray:
        """Host helper: [B * wph] contiguous wire samples (NO halo) ->
        [n, (B/n) * wph] rows."""
        return np.asarray(raw_block).reshape(self.n, self.raw_shard_len)

    def due_layout(self, frame0: int = 0, cap: int | None = None
                   ) -> tuple[np.ndarray, list[int]]:
        """Map the batch's global cadence-due hop positions onto the
        time shards.

        Returns (due_idx [n, cap] int32 local positions padded with 0,
        counts [n] real entries per shard).  Device row i*cap + j of the
        'views' wf output is global hop i*hops_per_shard + due_idx[i, j]
        for j < counts[i]; rows beyond counts[i] are padding."""
        cap = cap or self.due_cap_local
        bl = self.hops_per_shard
        per: list[list[int]] = [[] for _ in range(self.n)]
        for h in waterfall_due_positions(self.cfg, frame0):
            per[h // bl].append(h % bl)
        idx = np.zeros((self.n, cap), np.int32)
        counts = []
        for i, lst in enumerate(per):
            counts.append(len(lst))
            idx[i, : len(lst)] = lst
        return idx, counts

    def due_row_selector(self, counts: list[int]) -> list[int]:
        """Row indices mapping the padded per-shard 'views' wf output
        (due_cap_local rows per shard; see due_layout) back to global
        due-list order.  Owned here so the single-host driver and the
        multihost runtime cannot drift from due_layout's row contract."""
        cl = self.due_cap_local
        return [i * cl + j for i in range(self.n)
                for j in range(counts[i])]

    def step(self, state: ShardedHopState, raw_shards, chans: ChannelTable,
             views: WaterfallViews | None = None, waterfall: str = "full",
             reset=None, due_idx=None):
        if views is None:
            views = self.empty_views()
        if reset is None:
            reset = jnp.zeros((self.cfg.max_channels,), jnp.int32)
        if due_idx is None:
            due_idx = jnp.asarray(self.due_layout()[0])
        return self._steps[waterfall](state, raw_shards, chans, views, reset,
                                      due_idx)


def unpack_outputs_sharded(packed: np.ndarray, n: int, b: int, c: int,
                           half: int, w: int, cap: int,
                           wf_rows_per_shard: int, decim: int = 1,
                           nch: int = 1, rds_t: int = 0):
    """Host-side inverse of the sharded `packed` buffer.

    The sharded packed output is NOT pipeline.unpack_outputs-compatible:
    it is a per-shard concatenation (out spec P('d')), shard i holding
    audio [B, C/n, half] | pwr [B, C/n] | wf [rows, W, cap] |
    rds [C/n, 2, rds_t] for ITS channel shard / time shard.  Returns
    global (audio [B, C, half], pwr [B, C], wf [n*rows, W, cap] or None,
    rds [C, 2, rds_t] or None); map wf rows to hops with
    ShardedHopPipeline.due_layout.  With device Opus decimation
    (decim > 1) audio is [C, B*half/decim] continuous streams."""
    cl = c // n
    rows = wf_rows_per_shard
    if decim > 1:
        la = nch * b * half // decim
        na = cl * la * 2
        audio = np.empty((c, la), np.int16)
    else:
        na = b * cl * nch * half * 2
        audio = np.empty((b, c, nch * half), np.int16)
    npw = b * cl * 4
    nwf = rows * w * cap
    nrds = cl * 2 * rds_t
    seg = na + npw + nwf + nrds
    assert packed.size == n * seg, (packed.size, n, seg)
    pwr = np.empty((b, c), np.float32)
    wf = np.empty((n * rows, w, cap), np.int8) if rows else None
    rds = np.empty((c, 2, rds_t), np.int8) if rds_t else None
    for i in range(n):
        s = packed[i * seg:(i + 1) * seg]
        if decim > 1:
            audio[i * cl:(i + 1) * cl] = (
                s[:na].view(np.int16).reshape(cl, la))
        else:
            audio[:, i * cl:(i + 1) * cl] = (
                s[:na].view(np.int16).reshape(b, cl, nch * half))
        pwr[:, i * cl:(i + 1) * cl] = (
            s[na:na + npw].view(np.float32).reshape(b, cl))
        if rows:
            wf[i * rows:(i + 1) * rows] = (
                s[na + npw:na + npw + nwf].view(np.int8)
                .reshape(rows, w, cap))
        if rds_t:
            rds[i * cl:(i + 1) * cl] = (
                s[na + npw + nwf:].view(np.int8).reshape(cl, 2, rds_t))
    return audio, pwr, wf, rds
