"""The streaming slice manager — DVS_flow re-designed for a jit pipeline.

Reference: DVS_flow<MAX_SZ, SPAN> (dvs_flow.h:21-389).  Event ingestion and
trigger logic stay on the host (they are branchy, latency-bound bookkeeping);
each fired slice is materialized as a fixed-capacity padded tensor and
processed by a single jit-compiled program (models.global_flow.process_slice)
with the motion model carried across slices as the warm start
(dvs_flow.h:38-39, 215-224).

``add_events`` is the vectorized feed: trigger boundaries inside a batch are
computed arithmetically (count trigger) and with searchsorted (time trigger),
giving semantics identical to calling add_event per event
(dvs_flow.h:163-181) without a Python-level per-event loop.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import numpy as np

from better_flow_tpu.config import PipelineConfig
from better_flow_tpu.core.events import EventSlice
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.models.global_flow import process_slice
from better_flow_tpu.runtime.slice_buffer import EventRingBuffer

import jax.numpy as jnp


class SliceRecord:
    """Per-slice outputs retained for accumulation / inspection
    (the reference's ``accumulated`` vector + motion_memory deque,
    dvs_flow.h:43-46, 238-252, 340-346)."""

    __slots__ = ("x", "y", "timestamp", "t_local", "u", "v", "noise",
                 "pr_x", "pr_y", "model", "iters", "wall_s", "n_events",
                 "slice_start_time")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class DVSFlow:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        sl = cfg.slice
        self.buffer = EventRingBuffer(sl.max_events, sl.span_ns)
        import jax.numpy as _jnp

        self.last_model = MotionModel.zero(
            _jnp.float64 if cfg.f64_totals else _jnp.float32
        )
        self.last_seed = _jnp.zeros(8, _jnp.float32)
        # Trigger state (dvs_flow.h:30-36).
        self.event_diff = 0
        self.time_diff = 0
        self.last_slice_time = 0
        self.current_slice_time = 0
        self._started = False
        self.slices: List[SliceRecord] = []
        self.frame_count = 0
        self.on_slice: Optional[Callable[[SliceRecord], None]] = None
        def _process(ev, model, seed, bbox, n_valid, opt, sensor,
                     warm_start, presorted):
            res = process_slice(ev, model, opt, sensor,
                                warm_start=warm_start, presorted=presorted,
                                seed=seed, bbox=bbox, n_valid=n_valid)
            # One packed (6, cap) f32 output so the host pays a SINGLE
            # device->host fetch per slice: the axon relay costs ~26 ms
            # round trip per transfer, and five separate np.asarray fetches
            # were 70% of streaming wall time (0.375x realtime).  Row 5
            # carries the scalars (iters, window_small).
            cap = res.u.shape[0]
            scal_row = jnp.zeros((cap,), jnp.float32)
            scal_row = scal_row.at[0].set(res.iters.astype(jnp.float32))
            scal_row = scal_row.at[1].set(
                res.window_small.astype(jnp.float32))
            packed = jnp.stack([
                res.u, res.v, res.pr_x, res.pr_y,
                res.noise.astype(jnp.float32), scal_row,
            ])
            return res.model, res.seed, packed

        self._jit = jax.jit(
            _process,
            static_argnames=("opt", "sensor", "warm_start", "presorted"),
        )

    # ------------------------------------------------------------------ feed
    def add_event(self, x: float, y: float, timestamp: int) -> bool:
        """DVS_flow::add_event (dvs_flow.h:163-181).  Returns True if a
        recompute fired."""
        self.buffer.push(x, y, timestamp)
        self.event_diff += 1
        self.current_slice_time = int(timestamp)
        self.time_diff = self.current_slice_time - self.last_slice_time
        if (
            self.event_diff < self.cfg.slice.refresh_events
            and self.time_diff < self.cfg.slice.refresh_time_ns
        ):
            return False
        self.recompute()
        return True

    def add_events(self, x, y, timestamp) -> int:
        """Vectorized feed of a sorted batch; returns recompute count."""
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        ts = np.asarray(timestamp, np.int64)
        n = len(ts)
        fired = 0
        start = 0
        ev_th = self.cfg.slice.refresh_events
        t_th = self.cfg.slice.refresh_time_ns
        while start < n:
            # Next count trigger: when event_diff reaches ev_th.
            i_count = start + (ev_th - self.event_diff) - 1
            # Next time trigger: first i with ts[i] - last_slice_time >= t_th.
            i_time = int(
                np.searchsorted(ts[start:], self.last_slice_time + t_th, "left")
            ) + start
            i = min(i_count, i_time)
            if i >= n:
                self.buffer.push_batch(x[start:], y[start:], ts[start:])
                self.event_diff += n - start
                self.current_slice_time = int(ts[-1])
                self.time_diff = self.current_slice_time - self.last_slice_time
                break
            self.buffer.push_batch(x[start : i + 1], y[start : i + 1], ts[start : i + 1])
            self.event_diff += i + 1 - start
            self.current_slice_time = int(ts[i])
            self.time_diff = self.current_slice_time - self.last_slice_time
            self.recompute()
            fired += 1
            start = i + 1
        return fired

    # ------------------------------------------------------------- recompute
    def recompute(self) -> SliceRecord:
        """DVS_flow::recompute (dvs_flow.h:184-347) minus the OpenCV HUD."""
        t_begin = time.perf_counter()
        snap = self.buffer.snapshot()
        n = len(snap["x"])

        # Slice start time (dvs_flow.h:186-193).
        if n == self.buffer.capacity:
            slice_start = int(snap["timestamp"][0])
        else:
            slice_start = max(self.current_slice_time - self.buffer.span_ns, 0)

        t_local = (snap["timestamp"] - slice_start).astype(np.float32)

        # Host-side spatial sort (the windowed Pallas kernel's chunk-local
        # layout; cheap numpy argsort vs ~4 ms of device argsorts).
        key = (snap["x"].astype(np.int64) // 32) * 4096 + snap["y"].astype(
            np.int64
        )
        order = np.argsort(key, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(n)

        cap = self.buffer.capacity
        pad = cap - n
        ev = EventSlice(
            x=jnp.asarray(np.concatenate([snap["x"][order], np.zeros(pad, np.float32)])),
            y=jnp.asarray(np.concatenate([snap["y"][order], np.zeros(pad, np.float32)])),
            t=jnp.asarray(np.concatenate([t_local[order], np.zeros(pad, np.float32)])),
            valid=jnp.asarray(
                np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
            ),
            noise=jnp.asarray(
                np.concatenate([snap["noise"][order], np.zeros(pad, bool)])
            ),
        )

        if n > 0:
            bbox = jnp.asarray([int(snap["x"].min()), int(snap["x"].max()),
                                int(snap["y"].min()), int(snap["y"].max())],
                               jnp.int32)
        else:
            bbox = jnp.zeros(4, jnp.int32)
        model_out, seed_out, packed = self._jit(
            ev,
            self.last_model,
            self.last_seed,
            bbox,
            jnp.int32(n),
            self.cfg.optimizer,
            self.cfg.sensor,
            warm_start=not self.cfg.stm_disable,
            presorted=True,
        )

        # last_model = optimizer.get_model() (dvs_flow.h:224).  When stm is
        # disabled the optimizer started from zero; its result still becomes
        # the stored model, matching the C++ (set_model simply not called).
        # Both stay on device (no fetch); only ``packed`` crosses the relay.
        self.last_model = model_out
        self.last_seed = seed_out

        packed_h = np.asarray(packed)        # the one per-slice fetch
        # invert the spatial sort so writebacks land on the right events
        u = packed_h[0, :n][inv]
        v = packed_h[1, :n][inv]
        pr_x = packed_h[2, :n][inv]
        pr_y = packed_h[3, :n][inv]
        noise = packed_h[4, :n][inv] > 0.5
        n_iters = int(packed_h[5, 0])
        self.buffer.writeback(snap["index"], noise=noise, u=u, v=v,
                              pr_x=pr_x, pr_y=pr_y)

        wall = time.perf_counter() - t_begin
        rec = SliceRecord(
            x=snap["x"].copy(),
            y=snap["y"].copy(),
            timestamp=snap["timestamp"].copy(),
            t_local=t_local,
            u=u,
            v=v,
            noise=noise,
            pr_x=pr_x,
            pr_y=pr_y,
            model=self.last_model,
            iters=n_iters,
            wall_s=wall,
            n_events=n,
            slice_start_time=slice_start,
        )
        if self.cfg.accumulate:
            self.slices.append(rec)
        if self.on_slice is not None:
            self.on_slice(rec)

        # Reset triggers (dvs_flow.h:337-338).
        self.event_diff = 0
        self.last_slice_time = self.current_slice_time
        return rec

    # ---------------------------------------------------------- introspection
    def get_buf_size(self) -> int:
        return len(self.buffer)

    def get_time_diff(self) -> int:
        return self.time_diff

    def get_buf_time_diff(self) -> int:
        """dvs_flow.h:150-159."""
        if len(self.buffer) == self.buffer.capacity:
            start = self.buffer.oldest_timestamp()
        else:
            start = max(self.current_slice_time - self.buffer.span_ns, 0)
        return self.current_slice_time - start

    def realtime_factor(self) -> float:
        """%realtime — slice time-span / wall time (dvs_flow.h:275-282)."""
        if not self.slices:
            return 0.0
        r = self.slices[-1]
        span_s = (r.timestamp[-1] - r.slice_start_time) / 1e9 if r.n_events else 0.0
        return span_s / r.wall_s if r.wall_s > 0 else 0.0

    def get_accumulated(self):
        from better_flow_tpu.runtime.accumulate import merge_slices

        return merge_slices(self.slices)
