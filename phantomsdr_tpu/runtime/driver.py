"""Host driver: sample reader thread + device step loop + metrics.

Replaces the reference's fft_task thread and its async stdin
triple-buffering (reference: src/fft.cpp:10-119): a reader thread
fills raw blocks from the input stream (keeping the 50%-overlap halo),
a device thread runs the jitted hop pipeline, and finished outputs are
handed to a consumer callback (the websocket server) on its event loop.

Also the home of the first-class perf counters SURVEY.md section 5
calls for: hop counter, sustained MSPS, per-step device latency.
"""

from __future__ import annotations

import collections
import io
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from ..config import ServerConfig
from ..ops.convert import wire_dtype, host_preconvert
from ..pipeline import (
    HopPipeline, WaterfallViews, channels_from_numpy, unpack_outputs,
    waterfall_due_positions, pad_due_positions,
)


@dataclass
class Metrics:
    frames: int = 0
    samples: int = 0
    start_time: float = field(default_factory=time.monotonic)
    step_seconds: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=120))
    idle_frames: int = 0
    eof: bool = False
    device_errors: int = 0
    last_device_error: str = ""
    channel_rows: int = 0   # table width of the latest step (bucketing)

    def snapshot(self, cfg: ServerConfig) -> dict:
        el = max(time.monotonic() - self.start_time, 1e-9)
        steps = list(self.step_seconds)
        hop = cfg.hop_size
        return {
            "frames": self.frames,
            "samples_in": self.samples,
            "elapsed_s": el,
            "msps_sustained": self.samples / el / 1e6,
            "msps_device": (
                (len(steps) * cfg.hop_batch * hop) / max(sum(steps), 1e-9) / 1e6
                if steps else 0.0
            ),
            "step_ms_p50": (
                sorted(steps)[len(steps) // 2] * 1e3 if steps else 0.0
            ),
            "idle_frames": self.idle_frames,
            "eof": self.eof,
            "device_errors": self.device_errors,
            "last_device_error": self.last_device_error,
            "channel_rows": self.channel_rows,
        }


class SampleSource:
    """Blocking block reader over a binary stream (stdin or file),
    maintaining the halo so every block is (B+1)*hop wire samples.
    Mirrors SampleConverter reads (src/samplereader.cpp:42-70) but keeps
    raw wire ints; conversion happens on device."""

    def __init__(self, cfg: ServerConfig, stream: io.BufferedReader,
                 loop_file: bool = False, throttle_sps: float = 0.0,
                 include_halo: bool = True):
        self.cfg = cfg
        self.stream = stream
        self.dtype = wire_dtype(cfg.input_format)
        self.wire_per_hop = cfg.hop_size * (1 if cfg.is_real else 2)
        self.block_wire = cfg.hop_batch * self.wire_per_hop
        # mesh mode reads WITHOUT the host halo: the overlap hop moves
        # between time shards over ICI (parallel/sharded.py ring permute)
        self.include_halo = include_halo
        self.halo = np.zeros(self.wire_per_hop, self.dtype)
        self.loop_file = loop_file
        self.throttle_sps = throttle_sps  # simulate realtime for file replay
        self._t0 = None
        self._consumed = 0

    def read_block(self) -> np.ndarray | None:
        """Return [(B+1)*wph] wire samples (halo + new), or [B*wph] when
        include_halo=False; None on EOF."""
        need = self.block_wire * self.dtype.itemsize
        data = b""
        while len(data) < need:
            chunk = self.stream.read(need - len(data))
            if not chunk:
                if self.loop_file and hasattr(self.stream, "seek"):
                    self.stream.seek(0)
                    continue
                return None
            data += chunk
        new = np.frombuffer(data, self.dtype)
        if not self.include_halo:
            block = new
        else:
            block = np.concatenate([self.halo, new])
            self.halo = new[-self.wire_per_hop:]
        if self.throttle_sps > 0:
            scalars_per_sample = 1 if self.cfg.is_real else 2
            self._consumed += self.block_wire / scalars_per_sample
            if self._t0 is None:
                self._t0 = time.monotonic()
            target = self._t0 + self._consumed / self.throttle_sps
            delay = target - time.monotonic()
            if delay > 0:
                time.sleep(delay)
        return block


class DSPDriver:
    """Reader thread -> bounded queue -> device-step thread -> consumer."""

    # active-channel bucketing: consecutive steps the population must
    # stay within the small bucket before the table shrinks back
    shrink_after = 100

    def __init__(self, cfg: ServerConfig, source: SampleSource,
                 channel_registry, consumer: Callable,
                 waterfall_registry=None,
                 waterfall_active: Callable[[], bool] = lambda: True,
                 audio_active: Callable[[], bool] = lambda: True):
        self.cfg = cfg
        self.source = source
        self.registry = channel_registry
        self.wf_registry = waterfall_registry
        self.consumer = consumer
        self.waterfall_active = waterfall_active
        self.audio_active = audio_active
        self.metrics = Metrics()
        self.sharded = cfg.mesh_devices > 1
        if self.sharded:
            # mesh server mode ([tpu] mesh_devices = N): the SAME serving
            # loops run over the time+channel-sharded engine
            from ..parallel.sharded import ShardedHopPipeline, make_mesh

            self.pipe = ShardedHopPipeline(cfg, make_mesh(cfg.mesh_devices))
            source.include_halo = False
        else:
            self.pipe = HopPipeline(cfg)
        self._queue: queue.Queue = queue.Queue(maxsize=3)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._table_key = (-1, None)
        self._table = None
        self._views_key = (-1, None)
        self._views = None
        self._np_table = (-1, None)
        self._np_views = None
        self._wf_meta = None    # (l, r, level) snapshotted with views
        self._audio_meta = None  # (l, r, mid) snapshotted with the table

    # ------------------------------------------------------------------
    def start(self):
        tr = threading.Thread(target=self._read_loop, name="sdr-reader",
                              daemon=True)
        td = threading.Thread(target=self._device_loop, name="tpu-step",
                              daemon=True)
        self._threads = [tr, td]
        tr.start()
        td.start()

    def stop(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)

    # ------------------------------------------------------------------
    def _read_loop(self):
        def put(item) -> bool:
            # bounded put that honors stop: a dead device thread must
            # not leave the reader parked in a full queue forever
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        while not self._stop.is_set():
            block = self.source.read_block()
            if block is None:
                self.metrics.eof = True
                put(None)
                return
            if not put(block):
                return

    def _refresh_table(self):
        """Snapshot both registries (host numpy); returns the one-shot
        reset mask (int32 RESET_* codes) taken atomically WITH the
        channel table snapshot, so a fresh slot's reset and its table
        row reach the device in the same step.  Device tables are built
        lazily per bucket width by _tables_for()."""
        v, arrays, resets, audio_meta = self.registry.snapshot()
        self._audio_meta = audio_meta
        self._np_table = (v, arrays)
        if self.wf_registry is not None:
            wv, start, length, meta = self.wf_registry.snapshot()
            self._np_views = (wv, start, length)
            self._wf_meta = meta
        else:
            self._np_views = None
        return resets

    def _high_water(self) -> int:
        """Highest active slot + 1 across BOTH registries (audio active
        flags, waterfall view lengths) in the current snapshot -- the
        lower bound on the bucket width the next step must run at."""
        active = self._np_table[1][4]
        hw = int(np.max(np.nonzero(active)[0])) + 1 if active.any() else 0
        if self._np_views is not None:
            length = self._np_views[2]
            nz = np.nonzero(length)[0]
            if nz.size:
                hw = max(hw, int(nz[-1]) + 1)
        return hw

    def _tables_for(self, k: int | None):
        """Device (ChannelTable, WaterfallViews) at bucket width k
        (None = full), cached on the snapshot versions + k."""
        import jax.numpy as jnp

        v, arrays = self._np_table
        if (v, k) != self._table_key or self._table is None:
            rows = arrays if k is None else tuple(a[:k] for a in arrays)
            self._table = channels_from_numpy(*rows)
            self._table_key = (v, k)
        if self._np_views is not None:
            wv, start, length = self._np_views
            if (wv, k) != self._views_key or self._views is None:
                if k is not None:
                    start, length = start[:k], length[:k]
                self._views = WaterfallViews(
                    start=jnp.asarray(start), length=jnp.asarray(length))
                self._views_key = (wv, k)
        elif self._views is None:
            self._views = self.pipe.empty_views()
        return self._table, self._views

    def _device_loop(self):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        state = self.pipe.init_state()
        scalars_per_sample = 1 if cfg.is_real else 2
        decim = cfg.opus_decim if cfg.device_decim else 1
        # (frame0, packed_device_array, due_list_or_None, wf_sel, wf_meta,
        #  audio_meta, (k, w), t_start) -- wf_sel maps the device's wf
        #  gather rows (per-shard padded layout in mesh mode) to the due
        #  list's order; (k, w) are the channel-bucket and view-table
        #  widths the step RAN at, which flush must unpack with even if
        #  the current widths have changed since
        pending = None
        was_idle = False

        def prepare_raw(block):
            pre = host_preconvert(block, cfg.input_format)
            if self.sharded:
                pre = self.pipe.shard_raw(pre)
            return jnp.asarray(pre)

        # Pre-compile both step variants (and warm the output transfer
        # layouts) before serving: compilation of the big-FFT pipeline
        # can take minutes, and the reference-style "skip FFT when no
        # clients" behavior would otherwise defer that stall to the
        # moment the first listener connects.
        # active-channel bucketing (single-device only: the mesh shards
        # the fixed channel axis): run the step at the small table width
        # whenever every live slot fits, full width otherwise
        small = (cfg.channel_bucket
                 if (not self.sharded
                     and 0 < cfg.channel_bucket < cfg.max_channels)
                 else 0)
        k_cur = small or cfg.max_channels
        if small:
            state = self.pipe.resize_channel_rows(state, k_cur)
        shrink_streak = 0
        SHRINK_AFTER = self.shrink_after  # steps below the small bucket
        #                                   before shrinking (class attr;
        #                                   tests lower it)

        try:
            t0 = time.monotonic()
            self._refresh_table()
            halo = 0 if self.sharded else self.source.wire_per_hop
            zeros = np.zeros(self.source.block_wire + halo, self.source.dtype)
            raw = prepare_raw(zeros)
            # compile every (bucket, waterfall-mode) variant up front --
            # the reference-style "skip FFT when no clients" behavior
            # would otherwise defer a minutes-long big-FFT compile to
            # the moment the first listener connects (or the first
            # bucket switch); the persistent compile cache makes repeat
            # launches cheap
            for k in ([small, None] if small else [None]):
                warm_state = self.pipe.init_state()
                if k is not None:
                    warm_state = self.pipe.resize_channel_rows(warm_state, k)
                table, views = self._tables_for(k)
                for m in ("views", "off"):
                    warm_state, out = self.pipe.step(warm_state, raw,
                                                     table, views, m)
                    np.asarray(out.packed)
            del warm_state
            print(f"device pipeline compiled in {time.monotonic()-t0:.1f}s "
                  f"({'mesh x%d' % cfg.mesh_devices if self.sharded else 'single device'}"
                  f"{', bucket %d/%d' % (small, cfg.max_channels) if small else ''})",
                  flush=True)
        except Exception as e:
            self.metrics.device_errors += 1
            self.metrics.last_device_error = repr(e)[:300]
            import traceback

            traceback.print_exc()

        def flush_pending():
            nonlocal pending
            if pending is None:
                return
            (frame0, packed_dev, due, wf_sel, wf_meta, audio_meta, kw,
             t0) = pending
            pending = None
            try:
                packed = np.asarray(packed_dev)
            except Exception as e:
                self.metrics.device_errors += 1
                self.metrics.last_device_error = repr(e)[:300]
                return
            # (channel, view-table) widths the step actually RAN with --
            # snapshotted at submit (bucketing/table rebuilds may have
            # changed the current widths since)
            k, w = kw
            if self.sharded:
                from ..parallel.sharded import unpack_outputs_sharded

                rows = self.pipe.due_cap_local if due is not None else 0
                audio, pwr, wf, rds = unpack_outputs_sharded(
                    packed, cfg.mesh_devices, cfg.hop_batch,
                    k, cfg.audio_fft_size // 2,
                    w, self.pipe.view_cap, rows, decim=decim,
                    nch=cfg.audio_channels, rds_t=self.pipe.rds_t,
                )
                if wf is not None:
                    wf = wf[wf_sel]  # padded per-shard rows -> due order
            else:
                d = self.pipe.due_cap if due is not None else 0
                audio, pwr, wf, rds = unpack_outputs(
                    packed, cfg.hop_batch, k,
                    cfg.audio_fft_size // 2, d, w, self.pipe.view_cap,
                    decim=decim, nch=cfg.audio_channels,
                    rds_t=self.pipe.rds_t,
                )
            self.metrics.step_seconds.append(time.monotonic() - t0)
            try:
                self.consumer(frame0, audio, pwr,
                              wf if due is not None else None,
                              due if due is not None else [],
                              wf_meta, audio_meta, rds)
            except Exception:
                import traceback

                traceback.print_exc()

        while not self._stop.is_set():
            try:
                block = self._queue.get(timeout=0.25)
            except queue.Empty:
                flush_pending()
                continue
            if block is None:
                break
            self.metrics.samples += (
                self.source.block_wire // scalars_per_sample
            )
            # skip all compute when nobody is listening (src/fft.cpp:72-79);
            # state is intentionally left stale, like the reference.
            if not self.audio_active() and not self.waterfall_active():
                flush_pending()
                self.metrics.idle_frames += cfg.hop_batch
                self.metrics.frames += cfg.hop_batch
                was_idle = True
                continue
            if was_idle and self.sharded:
                # the mesh keeps the 50%-overlap halo ON DEVICE, so it
                # went stale across the idle gap (the single-device path
                # refreshes its host halo on every discarded block);
                # re-init to a zero halo like a cold start rather than
                # windowing minutes-old samples into the resume frame
                # (seeding the true stream hop parity keeps the
                # (-1)^(m*hop) demod fix-up polarity-continuous)
                state = self.pipe.init_state(self.metrics.frames)
            was_idle = False
            resets = self._refresh_table()
            if small:
                # bucket decision from THIS snapshot: grow immediately
                # (a slot above the bucket must demodulate next step),
                # shrink only after a sustained quiet streak to avoid
                # recompile/resize thrash around the boundary
                hw = self._high_water()
                want = small if hw <= small else cfg.max_channels
                if want > k_cur or (want < k_cur
                                    and shrink_streak >= SHRINK_AFTER):
                    state = self.pipe.resize_channel_rows(state, want)
                    k_cur = want
                    shrink_streak = 0
                elif want < k_cur:
                    shrink_streak += 1
                else:
                    shrink_streak = 0
                if resets is not None:
                    resets = resets[:k_cur]
            self.metrics.channel_rows = k_cur
            table, views = self._tables_for(k_cur if small else None)
            frame0 = self.metrics.frames
            due = (waterfall_due_positions(cfg, frame0)
                   if self.waterfall_active() else [])
            mode = "views" if due else "off"
            t0 = time.monotonic()
            if resets is not None:
                resets = jnp.asarray(resets)
            due_idx = None
            wf_sel = None
            if due:
                if self.sharded:
                    idx_np, counts = self.pipe.due_layout(frame0)
                    due_idx = jnp.asarray(idx_np)
                    wf_sel = self.pipe.due_row_selector(counts)
                else:
                    due_idx = jnp.asarray(
                        pad_due_positions(due, self.pipe.due_cap), jnp.int32)
            wf_meta = self._wf_meta
            audio_meta = self._audio_meta
            try:
                raw = prepare_raw(block)
                state, out = self.pipe.step(state, raw, table,
                                            views, mode, reset=resets,
                                            due_idx=due_idx)
            except Exception as e:
                # surface device errors instead of silently killing the
                # DSP thread (SURVEY.md section 5: failure detection);
                # state was donated -- rebuild it and keep serving
                self.metrics.device_errors += 1
                self.metrics.last_device_error = repr(e)[:300]
                import traceback

                traceback.print_exc()
                # the PREVIOUS step completed before this one failed --
                # deliver it (flush_pending tolerates a dead device and
                # counts its own error) instead of dropping a good step
                flush_pending()
                self.metrics.frames += cfg.hop_batch
                # seed the rebuilt counter with the NEXT step's stream
                # parity so the (-1)^(m*hop) fix-up stays polarity-
                # continuous across the rebuild
                state = self.pipe.init_state(self.metrics.frames)
                if small and k_cur != cfg.max_channels:
                    state = self.pipe.resize_channel_rows(state, k_cur)
                continue
            self.metrics.frames += cfg.hop_batch
            # start the device->host copy of THIS step's outputs now, so
            # the transfer (relay RTT + bytes) runs while the next block
            # queues and the next step computes; measured +10-15% MSPS
            # on the axon relay vs fetching cold at flush time
            try:
                out.packed.copy_to_host_async()
            except Exception:
                pass  # backend without async D2H: flush fetches cold
            # one step in flight: fetch the previous step's outputs only
            # after this one is dispatched (overlaps transfer & compute)
            flush_pending()
            pending = (frame0, out.packed, due if due else None, wf_sel,
                       wf_meta, audio_meta,
                       (k_cur, int(views.start.shape[0])), t0)
            if self._queue.empty():
                # input-paced (realtime SDR slower than the device):
                # fetch NOW instead of idling until the next block, so
                # step_seconds measures device+fetch time, not pacing
                flush_pending()
        flush_pending()
