"""Device-resident offline pipeline: ``lax.scan`` over slices.

The streaming DVSFlow runtime round-trips to the host per slice (as the
reference does implicitly — its whole loop is host code).  For offline
(bufferized) processing this pipeline removes every per-slice host sync:

1. Host: compute trigger points and slice membership with numpy (pure
   count/timestamp arithmetic, dvs_flow.h:163-193) — each slice is a
   contiguous tail window [b-len+1, b] of the chronological recording, where
   ``len`` is bounded by the ring capacity and the time span.
2. Host: materialize [S, CAP] SoA slice tensors (x, y, slice-local t in
   exact int64 ns subtracted on host, so the device never needs 64-bit
   timestamps) plus per-slice lengths and original-index matrices.
3. Device: one jitted ``lax.scan`` whose carry is (motion model, recording-
   wide noise flags); each step runs the full while-loop optimizer
   (models.global_flow.process_slice).  The warm-start chain across slices
   (dvs_flow.h:215-224) is exactly the scan carry.

This is the throughput path benchmarked by bench.py.  Accumulated output
uses first-slice-wins per original event index — identical to the
reference's get_accumulated dedupe (dvs_flow.h:350-389) for true duplicate
events; the additional near-match merge of *distinct* events within 0.1 ms
at one pixel (an operator== quirk, event.h:40-45) is only applied by the
streaming runtime.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from better_flow_tpu.config import PipelineConfig
from better_flow_tpu.core.events import EventSlice
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.models.global_flow import process_slice


class SlicePlan(NamedTuple):
    """Host-side slicing of a recording (numpy)."""

    starts: np.ndarray       # [S] first original index of each slice
    ends: np.ndarray         # [S] last original index (the trigger event)
    slice_start_ns: np.ndarray  # [S] slice-local time origin


def plan_slices(t_ns: np.ndarray, cfg: PipelineConfig) -> SlicePlan:
    """Compute trigger points and slice windows (dvs_flow.h:163-193).

    Triggers: every ``refresh_events`` new events or ``refresh_time_ns``
    elapsed, whichever first.  Window at trigger b: the newest events with
    count <= max_events and latest - ts <= span_ns.  A final flush trigger
    covers the tail (bf_motion_compensator.cpp:208).
    """
    sl = cfg.slice
    n = len(t_ns)
    if n == 0:
        z = np.zeros(0, np.int64)
        return SlicePlan(starts=z, ends=z.copy(), slice_start_ns=z.copy())
    ends = []
    last_slice_time = 0
    event_diff = 0
    start = 0
    while start < n:
        i_count = start + (sl.refresh_events - event_diff) - 1
        i_time = int(np.searchsorted(t_ns[start:], last_slice_time + sl.refresh_time_ns, "left")) + start
        i = min(i_count, i_time)
        if i >= n:
            break
        ends.append(i)
        event_diff = 0
        last_slice_time = int(t_ns[i])
        start = i + 1
    if not ends or ends[-1] != n - 1:
        ends.append(n - 1)  # final flush recompute
    ends = np.asarray(ends, np.int64)

    # Window per trigger: capacity + span (CircularArray semantics).
    latest = t_ns[ends]
    span_first = np.searchsorted(t_ns, latest - sl.span_ns, side="left")
    cap_first = np.maximum(ends - sl.max_events + 1, 0)
    starts = np.maximum(span_first, cap_first)
    lens = ends - starts + 1
    # Slice-local origin (dvs_flow.h:186-193): oldest event's timestamp when
    # the ring is full, else latest - span (clamped at 0).
    full = lens == sl.max_events
    slice_start = np.where(full, t_ns[starts], np.maximum(latest - sl.span_ns, 0))
    return SlicePlan(starts=starts, ends=ends, slice_start_ns=slice_start)


def host_bbox(x, y, plan: SlicePlan):
    """Per-slice integer bbox [S, 4] (x_min, x_max, y_min, y_max) and valid
    count [S] from the original chronological window — what
    OptimizerRolling::set_cloud scans per slice (optimizer_rolling.h:252-261).
    The host already touches every event; 4 numpy reductions over each
    <=cap-long window beat four masked 61k-element reductions per slice on
    device (plus a psum on sharded meshes)."""
    S = len(plan.ends)
    bbox = np.zeros((S, 4), np.int32)
    for s in range(S):
        a, b = int(plan.starts[s]), int(plan.ends[s]) + 1
        xw = x[a:b]
        yw = y[a:b]
        bbox[s] = (int(xw.min()), int(xw.max()), int(yw.min()), int(yw.max()))
    lens = (plan.ends - plan.starts + 1).astype(np.int32)
    return bbox, lens


def materialize_slices(x, y, t_ns, plan: SlicePlan, cap: int,
                       spatial_sort: bool = True, band_rows: int = None,
                       band_pad: bool = False, res_x: int = 0,
                       indices_only: bool = False):
    """[S, CAP] SoA tensors + per-slice lengths and original indices.

    Vectorized gather (one fancy-index per array).  With ``spatial_sort``
    each slice's events are ordered by the (row-band, column) key the
    windowed Pallas kernel wants (ops/pallas/fused_model.sort_key_blocks) —
    host-side, because per-slice device argsorts cost ~4 ms of the ~10 ms
    slice budget.  ``idx`` carries original recording positions, so
    accumulation and noise bookkeeping are order-agnostic.

    ``band_pad`` additionally pads each row band to a kernel-CHUNK boundary
    so no event chunk spans two bands: band-crossing chunks cover >=2x the
    window height and forced the kernel's full-joint fallback (~10x the
    windowed splat cost) for ~20% of chunks.  The returned capacity grows to
    cap + n_bands*CHUNK rounded up; padding slots have idx == -1 (NOT a
    prefix — consumers must mask on idx >= 0, not arange < len).

    ``indices_only`` skips building the xs/ys/ts value slabs (returned as
    None) — the compact device path reconstructs them by gather from the
    recording, so only ``idx`` is needed."""
    if band_rows is None:
        band_rows = BAND_ROWS
    S = len(plan.ends)
    lens = (plan.ends - plan.starts + 1).astype(np.int32)
    offsets = np.arange(cap, dtype=np.int64)[None, :]
    gidx = plan.starts[:, None] + offsets              # [S, CAP]
    valid = offsets < lens[:, None]
    safe = np.minimum(gidx, len(x) - 1)
    xs = np.where(valid, x[safe], 0).astype(np.float32)
    ys = np.where(valid, y[safe], 0).astype(np.float32)
    ts = None if indices_only else np.where(
        valid, t_ns[safe] - plan.slice_start_ns[:, None], 0
    ).astype(np.float32)
    idx = np.where(valid, gidx, -1).astype(np.int32)
    if spatial_sort:
        band = xs.astype(np.int64) // band_rows
        key = band * 4096 + ys.astype(np.int64)
        key = np.where(valid, key, np.int64(1) << 40)
        order = np.argsort(key, axis=1, kind="stable")
        take = lambda a: np.take_along_axis(a, order, axis=1)
        if indices_only:
            xs, idx = take(xs), take(idx)
        else:
            xs, ys, ts, idx = take(xs), take(ys), take(ts), take(idx)
        if band_pad:
            from better_flow_tpu.ops.pallas.fused_model import CHUNK

            n_bands = max(int(res_x) + band_rows - 1, band_rows) // band_rows
            capp = -(-(cap + n_bands * (CHUNK - 1)) // CHUNK) * CHUNK
            valid_s = idx >= 0
            band_s = np.where(valid_s, xs.astype(np.int64) // band_rows,
                              n_bands)                  # sentinel -> tail
            # per (slice, band) counts -> chunk-aligned band bases
            flat = (np.arange(S)[:, None] * (n_bands + 1) + band_s).ravel()
            cnt = np.bincount(flat, minlength=S * (n_bands + 1)).reshape(
                S, n_bands + 1
            )[:, :n_bands].astype(np.int64)
            padded = -(-cnt // CHUNK) * CHUNK
            base = np.concatenate(
                [np.zeros((S, 1), np.int64), np.cumsum(padded, axis=1)], axis=1
            )
            first = np.concatenate(
                [np.zeros((S, 1), np.int64), np.cumsum(cnt, axis=1)], axis=1
            )
            j = np.arange(xs.shape[1], dtype=np.int64)[None, :]
            bs = np.minimum(band_s, n_bands - 1)
            pos = base[np.arange(S)[:, None], bs] + (j - first[np.arange(S)[:, None], bs])
            rows = np.repeat(np.arange(S), xs.shape[1])[valid_s.ravel()]
            cols = pos.ravel()[valid_s.ravel()]

            def scatter(a, fill=0):
                out = np.full((S, capp), fill, a.dtype)
                out[rows, cols] = a[valid_s]
                return out

            idx = scatter(idx, fill=-1)
            if indices_only:
                xs = ys = None
            else:
                xs, ys, ts = scatter(xs), scatter(ys), scatter(ts)
    if indices_only:
        xs = ys = None
    return xs, ys, ts, idx, lens


PERM_SENTINEL = np.uint16(0xFFFF)

# Row-band height of the host spatial sort (events grouped by
# x // BAND_ROWS, then column).  The windowed Pallas kernel needs each
# CHUNK inside one band: at scale 3 a band spans BAND_ROWS*3 + 2 scaled
# rows, which must fit the kernel's RH=128-row window with slack for the
# 8-row window alignment and warp drift (fallback is exact but ~10x).
# 36 divides 180 exactly -> 5 bands instead of 6 at the default sensor,
# one fewer partial chunk of padding per slice (bench-validated vs 32).
BAND_ROWS: int = 36


def make_carry(init_model, hist_k: int, seed=None, ws_h=None, st_h=None,
               en_h=None):
    """Initial (or hand-off) scan carry: (model, secant seed + previous
    totals, window_small history, start history, end history).  The
    histories let a scan start mid-recording with exact noise flags
    (slice s's events are noise iff any of the last hist_k slices fired
    the window gate and the event's original index falls in that slice's
    range); the model+seed continue the warm-start chain.  This is the
    hand-off of multi-host range pipelining (parallel/multihost.py) and
    of the batch-pipelined cold path.

    The seed vector is (12,): [secant slope memory (4), last in-slice
    deltas (4), previous slice's converged totals (rot, div, dx, dy)].
    The trailing totals drive the extrapolated warm start
    (OptimizerConfig.warm_extrapolate); initializing them to the init
    model's own totals makes the first slice's extrapolation delta zero.
    An (8,) seed (pre-round-5 hand-off) is padded the same way."""
    tot0 = jnp.stack([init_model.total_rot, init_model.total_div,
                      init_model.total_dx, init_model.total_dy]
                     ).astype(jnp.float32)
    if seed is None:
        seed12 = jnp.concatenate([jnp.zeros(8, jnp.float32), tot0])
    elif seed.shape[0] == 8:
        seed12 = jnp.concatenate([seed, tot0])
    else:
        seed12 = seed
    return (
        init_model,
        seed12,
        jnp.zeros((hist_k,), bool) if ws_h is None else ws_h,
        jnp.zeros((hist_k,), jnp.int32) if st_h is None else st_h,
        jnp.full((hist_k,), -1, jnp.int32) if en_h is None else en_h,
    )


def _run_scan(xs, ys, ts, idx, starts, ends, bbox, nval, carry0,
              cfg: PipelineConfig, hist_k: int, axis_name=None):
    """Shared scan driver over reconstructed slice slabs.

    With ``axis_name`` the driver runs as the shard-local body of an
    event-parallel shard_map (parallel.event_parallel): the slab arguments
    are the per-device shards, process_slice combines pre-filter images
    with one psum per iteration, and every scalar decision (gates, warm
    start, noise history) is replicated by construction.

    Noise bookkeeping carries NO per-event global array: the scan path's
    only noise source is the per-slice degenerate-window gate
    (optimizer_rolling.h:52-54 — it marks every event of the slice), and
    slice membership of an event is a contiguous run of slices.  So an
    event of slice s is noise iff any of the last ``hist_k`` slices fired
    the gate AND its original index falls in that slice's [start, end]
    range — three scalar compares per lookback step, instead of a 62k-index
    gather + scatter on an n_total bool array per step (both are
    latency-bound on TPU and together cost more than the optimizer)."""
    opt = cfg.optimizer
    sensor = cfg.sensor
    warm = not cfg.stm_disable

    # Build the fused kernel's loop-invariant (n_chunks, 3, CHUNK) pack for
    # ALL slices in one op — instead of padding/reshaping/concatenating
    # inside every scan step (measured ~115 us/slice of XLA glue).  Only
    # possible when the padded capacity is a CHUNK multiple (band_pad
    # guarantees it; the generic fallback packs per step).
    from better_flow_tpu.ops.pallas.fused_model import CHUNK

    S, capp = xs.shape
    if capp % CHUNK == 0:
        nch = capp // CHUNK
        stat3_all = jnp.concatenate(
            [a.reshape(S, nch, 1, CHUNK) for a in (xs, ys, ts)], axis=2
        )
    else:
        stat3_all = None

    def step(carry, inputs):
        model, sd, ws_h, st_h, en_h = carry
        if len(inputs) > 6:
            sx, sy, st, sidx, start, end, bb, nv = inputs[:8]
            stat3 = inputs[8] if len(inputs) > 8 else None
        else:
            # stat3-only layout: the (nch, 3, CHUNK) pack IS (x, y, t) —
            # don't ship the same 736 KB/slice again as separate slabs.
            sidx, start, end, bb, nv, stat3 = inputs
            sx = stat3[:, 0, :].reshape(-1)
            sy = stat3[:, 1, :].reshape(-1)
            st = stat3[:, 2, :].reshape(-1)
        # Validity by original index, not prefix: band-padded layouts
        # interleave padding inside the slice (materialize_slices).
        valid = sidx >= 0
        noise = jnp.zeros_like(valid)
        for j in range(hist_k):
            noise |= ws_h[j] & (sidx >= st_h[j]) & (sidx <= en_h[j])
        ev = EventSlice(x=sx, y=sy, t=st, valid=valid, noise=noise & valid)
        # On the fused path, build the kernels' activity rows in ONE
        # pallas pass (valid + noise-history + f32 pack fused); the XLA
        # chain above then feeds nothing live and is DCE'd — it was ~10
        # us/slice of elementwise passes over the slab (round-5 trace:
        # compare_reduce_fusion 8.3 us + pack fusions).
        mode = opt.scatter_mode
        if mode == "auto":
            mode = "pallas" if jax.default_backend() == "tpu" else "xla"
        act3 = None
        if mode == "pallas" and stat3 is not None:
            from better_flow_tpu.ops.pallas.fused_model import (
                act_rows_call,
            )

            act3 = act_rows_call(sidx, ws_h, st_h, en_h)
        # slices were spatially pre-sorted on the host (materialize_slices);
        # ``sd`` carries the secant slope memory + the previous slice's
        # converged totals across slices (fast schedule only — the
        # reference schedule returns and ignores zeros).
        start_model = None
        cur_tot = jnp.stack([model.total_rot, model.total_div,
                             model.total_dx, model.total_dy]
                            ).astype(jnp.float32)
        if warm and opt.warm_extrapolate > 0:
            # Extrapolated warm start (OptimizerConfig.warm_extrapolate):
            # start the optimizer at model + alpha*(model - prev_model),
            # where prev_model is the model that entered the PREVIOUS
            # slice (sd[8:12]) — the delta spans exactly one slice of
            # converged-total drift.  Only the optimizer's starting
            # point moves — the skip branch, the warm-start warp of
            # record, and every exit test keep the plain warm-start
            # model.
            a = jnp.float32(opt.warm_extrapolate)
            dlt = (a * (cur_tot - sd[8:12])).astype(model.total_dx.dtype)
            start_model = model.add_totals(dlt[0], dlt[1], dlt[2], dlt[3])
        res, uvn = process_slice(ev, model, opt, sensor, warm_start=warm,
                                 presorted=True, stat3=stat3,
                                 axis_name=axis_name, seed=sd[:8],
                                 bbox=bb, n_valid=nv, want_uvn=True,
                                 act3=act3, start_model=start_model)
        ws_h = jnp.concatenate([ws_h[1:], res.window_small[None]])
        st_h = jnp.concatenate([st_h[1:], start[None]])
        en_h = jnp.concatenate([en_h[1:], end[None]])
        # ONE packed (nch, 3, CHUNK) per-event ys instead of three
        # separate stacked outputs: each dynamic-update-slice into a
        # stacked scan output costs ~6-7 us of mostly fixed overhead per
        # slice (profiler, round 4).  On the fused path the pack IS the
        # epilogue kernel's second output (warp_uv_call) — zero per-event
        # XLA passes after the loop; the XLA path packs it here.  Row 2
        # carries the noise flags as 0/1 f32 (1 on padding slots, dropped
        # by the perm/idx sentinel); consumers unpack inside their own
        # jit.
        if uvn is None:
            capn = res.u.shape[0]
            nchp = -(-capn // CHUNK)
            pad = lambda a: jnp.pad(
                a, (0, nchp * CHUNK - capn)).reshape(nchp, CHUNK)
            uvn = jnp.stack(
                [pad(res.u), pad(res.v),
                 pad(jnp.maximum(res.noise.astype(jnp.float32),
                                 1.0 - valid.astype(jnp.float32)))],
                axis=1)
        out = (uvn, res.iters, res.ran)
        # Trailing seed totals = the model that ENTERED this slice, so the
        # next step's extrapolation delta spans exactly one slice.
        sd_new = jnp.concatenate([res.seed, cur_tot])
        return (res.model, sd_new, ws_h, st_h, en_h), out

    if stat3_all is not None:
        scan_inputs = (idx, starts, ends, bbox, nval, stat3_all)
    else:
        scan_inputs = (xs, ys, ts, idx, starts, ends, bbox, nval)
    final_carry, outs = lax.scan(step, carry0, scan_inputs)
    # Scalar checksum over the bulk outputs: fetching it to the host forces
    # true program completion (block_until_ready alone has shown async
    # under-measurement artifacts through the axon relay).
    chk = jnp.sum(outs[0][:, :, 0:2])
    if axis_name is not None:
        chk = lax.psum(chk, axis_name)  # replicated scalar out of shard_map
    return final_carry, outs, chk


@partial(
    jax.jit,
    static_argnames=("cfg", "hist_k"),
)
def _scan_slices(xs, ys, ts, idx, starts, ends, bbox, nval, carry0,
                 cfg: PipelineConfig, hist_k: int):
    """One compiled program over all slices (full f32/i32 slab inputs)."""
    return _run_scan(xs, ys, ts, idx, starts, ends, bbox, nval, carry0,
                     cfg, hist_k)


@partial(
    jax.jit,
    static_argnames=("cfg", "hist_k"),
)
def _scan_slices_compact(xs16, ys16, ts, perm, starts, ends, bbox, nval,
                         carry0, cfg: PipelineConfig, hist_k: int):
    """Compact-transfer variant: the coordinate slabs ride as u16 and the
    original-index slab as a u16 in-slice offset (original index =
    starts[s] + perm, 0xFFFF = padding) — 10 B/slot instead of 16 across
    the host->device tunnel (which moves ~1 MB/s at worst; dtype width IS
    wall-clock there).  Reconstruction is purely elementwise; device-side
    GATHER alternatives were measured strictly worse (per-step 62k-index
    gathers: +1.5 ms/slice; one batched [S, CAP] gather up front: +200 ms
    — TPU gathers from large tables are latency-bound in any shape)."""
    valid = perm != PERM_SENTINEL
    sidx = jnp.where(valid, starts[:, None] + perm.astype(jnp.int32), -1)
    xs = xs16.astype(jnp.float32)
    ys = ys16.astype(jnp.float32)
    return _run_scan(xs, ys, ts, sidx, starts, ends, bbox, nval, carry0,
                     cfg, hist_k)


def prepare_recording(x, y, t_ns, cfg: PipelineConfig, slice_range=None,
                      pad_quantum: int = 0):
    """Host-side preparation: trigger plan + slice tensors on device.
    Reusable across runs of the same recording (bench warmups).

    Prefers the compact transfer layout (recording once as u16/u16/u32 +
    one u16 permutation slab; see _scan_slices_compact) whenever the
    coordinates are integral u16 and every slice fits a u16 offset —
    otherwise falls back to shipping full f32/i32 [S, CAP] slabs.

    ``slice_range=(lo, hi)`` stages only that contiguous range of the
    global trigger plan (multi-host range ownership,
    parallel/multihost.py): the plan, hist_k and the pre-range
    window-gate history are still computed globally, so a range scan
    started from ``prepared['carry0']`` reproduces the full scan's noise
    flags and gate decisions exactly at the boundary.  ``pad_quantum``
    rounds the padded capacity up to a multiple (event-parallel sharding
    needs n_dev * CHUNK so chunk boundaries stay band-aligned per
    shard)."""
    t_ns = np.ascontiguousarray(t_ns, np.int64)
    t0 = time.perf_counter()
    phases = {}

    def _mark(name, since=[t0]):
        now = time.perf_counter()
        phases[name] = round(phases.get(name, 0.0) + now - since[0], 4)
        since[0] = now

    plan_full = plan_slices(t_ns, cfg)
    _mark("plan")
    S_full = len(plan_full.ends)
    # Noise-history depth must be range-independent (carry shape is part
    # of the hand-off contract): compute from the FULL plan.
    first_overlap = np.searchsorted(plan_full.ends, plan_full.starts)
    hist_k = max(1, int(np.max(np.arange(S_full) - first_overlap,
                               initial=1)))
    if slice_range is not None:
        lo, hi = slice_range
        plan = SlicePlan(starts=plan_full.starts[lo:hi],
                         ends=plan_full.ends[lo:hi],
                         slice_start_ns=plan_full.slice_start_ns[lo:hi])
    else:
        lo, hi = 0, S_full
        plan = plan_full

    from better_flow_tpu.io import native as _native
    from better_flow_tpu.ops.pallas.fused_model import CHUNK

    band_rows = BAND_ROWS
    n_bands = max(cfg.sensor.res_x + band_rows - 1, band_rows) // band_rows
    cap = cfg.slice.max_events
    capp = -(-(cap + n_bands * (CHUNK - 1)) // CHUNK) * CHUNK
    if pad_quantum:
        capp = -(-capp // pad_quantum) * pad_quantum

    # Native single-pass staging (native/bf_native.cpp): coordinate
    # narrowing + validity in one C++ pass straight from the input dtype
    # (no f32 intermediate, no separate integral scan), then one threaded
    # counting sort per slice that also emits the per-slice bbox.  The
    # numpy equivalent costs ~24 s on a 6M-event recording (band-pad fancy
    # scatter) + ~0.5 s of conversions/checks/bbox.
    native_out = None
    bbox_native = None
    x16y16 = None
    dev_parts = None
    if len(plan.ends) > 0 and capp < 0xFFFF:
        x16y16 = _native.coords_u16(x, y)
        _mark("coords_u16")
    if x16y16 is not None:
        # Pipelined staging: sort slice-range batches on the host thread
        # pool while the previous batch's slabs stream to the device
        # (jax.device_put is async) — plan_s pays max(sort, transfer)
        # instead of their sum on long recordings.  Each batch's rows are
        # element-exact vs the single-call path (the counting sort is
        # per-slice independent).
        S_all = len(plan.starts)
        n_batch = 4 if S_all >= 64 else 1
        bounds = np.linspace(0, S_all, n_batch + 1).astype(np.int64)
        host_parts, put_futs = [], []
        ok = True
        # device_put through the axon relay BLOCKS for the transfer
        # (~300 MB/s sustained measured round 5), so puts run on a
        # worker thread: batch b's transfer rides behind batch b+1's
        # native sort instead of serializing with it.  The host slab
        # buffers are write-once-before-submit, so workers only ever
        # read completed batches.  A second worker overlaps the perm/
        # bbox host concatenation (~300 MB memcpy at 48M) with the tail
        # transfers.  Round-5 breakdown at 48M (fresh process): 23.2 s
        # serial -> 12.6 s with the put overlap alone; see BASELINE.md.
        import concurrent.futures as _cf

        put_pool = _cf.ThreadPoolExecutor(max_workers=2)
        try:
            for b in range(n_batch):
                b0, b1 = int(bounds[b]), int(bounds[b + 1])
                out = _native.materialize_bandpad_u16(
                    x16y16[0], x16y16[1], t_ns,
                    plan.starts[b0:b1], plan.ends[b0:b1],
                    plan.slice_start_ns[b0:b1],
                    capp, band_rows, CHUNK, n_bands, cfg.sensor.res_y,
                )
                if out is None:
                    ok = False
                    break
                host_parts.append(out)
                _mark("native_sort")
                put_futs.append(put_pool.submit(
                    lambda o=out: tuple(jax.device_put(a)
                                        for a in o[:4])))
            concat_fut = None
            if ok:
                concat_fut = put_pool.submit(lambda: (
                    np.concatenate([p[3] for p in host_parts])
                    if n_batch > 1 else host_parts[0][3],
                    np.concatenate([p[4] for p in host_parts])
                    if n_batch > 1 else host_parts[0][4]))
            put_parts = [f.result() for f in put_futs] if ok else []
            _mark("device_put_wait")
        finally:
            put_pool.shutdown(wait=False)
        if ok:
            # Host keeps only what accumulation needs (perm) and the small
            # bbox; the big slabs live as per-batch device arrays.
            perm_n, bbox_native = concat_fut.result()
            _mark("host_concat")
            dev_parts = put_parts
            native_out = True
    compact = x16y16 is not None

    if native_out is not None:
        idx = None   # accumulation reconstructs per slice from perm_host:
        # materializing the [S, capp] int32 original-index matrix up front
        # costs ~1.7 s of int64 numpy on a 6M-event recording — the single
        # largest plan_s item after the native sort.
    else:
        x = np.ascontiguousarray(x, np.float32)
        y = np.ascontiguousarray(y, np.float32)

        def integral_u16(a):
            return a.size == 0 or (
                np.all(a == np.floor(a)) and a.min() >= 0 and a.max() < 0xFFFF
            )

        compact = integral_u16(x) and integral_u16(y)
        xs, ys, ts, idx, lens = materialize_slices(
            x, y, t_ns, plan, cfg.slice.max_events,
            band_rows=band_rows, band_pad=True, res_x=cfg.sensor.res_x,
        )
    capp_out = perm_n.shape[1] if native_out is not None else idx.shape[1]
    compact = compact and (capp_out < 0xFFFF)
    if bbox_native is not None:
        bbox = bbox_native
        lens = (plan.ends - plan.starts + 1).astype(np.int32)
    else:
        bbox, lens = host_bbox(x, y, plan)
    # Pre-range window-gate history for range scans: the window_small gate
    # is purely geometric (bbox + min_window_fraction), so the gate
    # outcomes of the hist_k slices BEFORE the range are host-computable —
    # a range scan seeded with them reproduces the full scan's noise flags
    # exactly across the boundary.
    ws_h = np.zeros(hist_k, bool)
    st_h = np.zeros(hist_k, np.int32)
    en_h = np.full(hist_k, -1, np.int32)
    if lo > 0:
        scale = cfg.optimizer.scale
        frac = cfg.optimizer.min_window_fraction
        pre = range(max(0, lo - hist_k), lo)
        for j, s in enumerate(reversed(pre)):
            a, b = int(plan_full.starts[s]), int(plan_full.ends[s]) + 1
            if x16y16 is not None:
                xw, yw = x16y16[0][a:b], x16y16[1][a:b]
            else:
                xw, yw = x[a:b], y[a:b]
            wx = scale * (int(xw.max()) - int(xw.min()))
            wy = scale * (int(yw.max()) - int(yw.min()))
            small = ((wx + scale) < (scale * cfg.sensor.res_x) // frac) and (
                (wy + scale) < (scale * cfg.sensor.res_y) // frac)
            k = hist_k - 1 - j
            ws_h[k] = small
            st_h[k] = plan_full.starts[s]
            en_h[k] = plan_full.ends[s]
    prepared = {"plan": plan, "n": len(x), "compact": compact,
                "idx_host": idx, "perm_host": perm_n if native_out is not None else None,
                "hist_k": hist_k, "slice_range": (lo, hi),
                "prev_end": int(plan_full.ends[lo - 1]) if lo > 0 else -1,
                "hist0": (jnp.asarray(ws_h), jnp.asarray(st_h),
                          jnp.asarray(en_h)),
                "starts": jnp.asarray(plan.starts.astype(np.int32)),
                "ends": jnp.asarray(plan.ends.astype(np.int32)),
                "bbox": jnp.asarray(bbox), "nval": jnp.asarray(lens)}
    if compact:
        if dev_parts is not None:
            # Slabs were already device_put per batch (overlapping the
            # sort); a cheap device-side concatenation assembles the
            # [S, capp] views the scan expects.
            def _cat(i):
                ps = [p[i] for p in dev_parts]
                return ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=0)

            prepared.update(xs16=_cat(0), ys16=_cat(1), ts=_cat(2),
                            perm=_cat(3))
            _mark("device_cat_dispatch")
        else:
            perm = idx.astype(np.int64) - plan.starts.astype(np.int64)[:, None]
            perm = np.where(idx >= 0, perm,
                            int(PERM_SENTINEL)).astype(np.uint16)
            prepared.update(
                xs16=jnp.asarray(np.ascontiguousarray(xs, np.uint16)),
                ys16=jnp.asarray(np.ascontiguousarray(ys, np.uint16)),
                ts=jnp.asarray(ts),
                perm=jnp.asarray(perm),
            )
    else:
        prepared.update(xs=jnp.asarray(xs), ys=jnp.asarray(ys),
                        ts=jnp.asarray(ts), idx=jnp.asarray(idx))
    _mark("tail")
    prepared["plan_s"] = time.perf_counter() - t0
    prepared["plan_breakdown"] = phases
    return prepared


@partial(jax.jit, static_argnames=("claim_cap",))
def _accumulate_device_range(uvn, perm, starts, claim_from,
                             claim_to, claim_cap: int):
    """Range variant of _accumulate_device: scatter only events whose
    original index falls in [claim_from, claim_to) into a COMPACT
    [claim_cap] buffer at offset orig - claim_from.  Batch claims are
    contiguous original-index ranges (claim_from = previous range's last
    trigger + 1), so per-batch compact buffers concatenate into the
    full-recording result — and each batch's ~n/n_batch-sized fetch can
    start (copy_to_host_async) while the device still runs later batches,
    overlapping result delivery with compute and host staging
    (the round-4 cold-path pipelining)."""
    def step(acc, inp):
        au, av, an = acc
        pk, ps, st = inp
        capp = ps.shape[0]
        valid = ps != PERM_SENTINEL
        orig = st + ps.astype(jnp.int32)
        ok = valid & (orig >= claim_from) & (orig < claim_to)
        tgt = jnp.where(ok, orig - claim_from, claim_cap)
        au = au.at[tgt].set(pk[:, 0, :].reshape(-1)[:capp], mode="drop")
        av = av.at[tgt].set(pk[:, 1, :].reshape(-1)[:capp], mode="drop")
        an = an.at[tgt].set(pk[:, 2, :].reshape(-1)[:capp] != 0,
                            mode="drop")
        return (au, av, an), None
    acc0 = (jnp.zeros(claim_cap, jnp.float32),
            jnp.zeros(claim_cap, jnp.float32),
            jnp.zeros(claim_cap, bool))
    rev = lambda a: a[::-1]
    (au, av, an), _ = lax.scan(
        step, acc0, (rev(uvn), rev(perm), rev(starts)))
    return au, av, an


@jax.jit
def _pack_results(au, av, an):
    """Compact d2h wire format (round-5): ONE u8 array of
    4*m + ceil(m/8) bytes — f16 u/v (byte-planar) + bit-packed noise,
    4.125 B/event instead of 9 (u/v f32 + noise byte) across a
    device->host link measured as low as ~1 MB/s.  f16 quantization is
    ~2^-11 relative on u/v (≤0.04 px/s at the ~72 px/s bench scale);
    noise and array lengths are exact.  Decode: _unpack_results."""
    m = au.shape[0]
    f16 = jnp.stack([au.astype(jnp.float16), av.astype(jnp.float16)])
    b = jnp.moveaxis(
        lax.bitcast_convert_type(f16, jnp.uint8), 2, 1).reshape(4 * m)
    m8 = -(-m // 8) * 8
    nb = jnp.pad(an.astype(jnp.uint8), (0, m8 - m)).reshape(-1, 8)
    w = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    bits = jnp.sum(nb.astype(jnp.int32) * w, axis=1).astype(jnp.uint8)
    return jnp.concatenate([b, bits])


def _unpack_results(buf, m: int):
    """Host-side decode of _pack_results (numpy)."""
    buf = np.asarray(buf)
    head = buf[: 4 * m].reshape(2, 2, m)
    f16 = np.ascontiguousarray(np.moveaxis(head, 1, 2)).view(np.float16)
    u = f16[0, :, 0].astype(np.float32)
    v = f16[1, :, 0].astype(np.float32)
    bits = np.unpackbits(buf[4 * m:], bitorder="little")[:m]
    return u, v, bits.astype(bool)


@partial(jax.jit, static_argnames=("n",))
def _accumulate_device(uvn, perm, starts, claim_from, n: int,
                       acc0=None):
    """First-slice-wins accumulation ON DEVICE (compact layouts): scatter
    the per-slice outputs into full-recording [n] arrays in REVERSE slice
    order — earlier slices write last, so the first containing slice wins
    without any seen-mask.  Padding slots and pre-boundary events (orig <
    claim_from, the range-staging claim rule) scatter to index n and are
    dropped.  The host then fetches exactly n events' worth of results
    (u, v, noise ≈ 9 B/event) instead of the ~2.5x-overlapping [S, capp]
    slabs (~29 B/event) — on the axon relay the device->host direction
    measures only ~1-26 MB/s, so result delivery dominates cold wall-clock
    and fetched bytes ARE the metric."""
    def step(acc, inp):
        au, av, an = acc
        pk, ps, st = inp
        capp = ps.shape[0]
        valid = ps != PERM_SENTINEL
        orig = st + ps.astype(jnp.int32)
        ok = valid & (orig >= claim_from)
        tgt = jnp.where(ok, orig, n)
        au = au.at[tgt].set(pk[:, 0, :].reshape(-1)[:capp], mode="drop")
        av = av.at[tgt].set(pk[:, 1, :].reshape(-1)[:capp], mode="drop")
        an = an.at[tgt].set(pk[:, 2, :].reshape(-1)[:capp] != 0,
                            mode="drop")
        return (au, av, an), None
    if acc0 is None:
        acc0 = (jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
                jnp.zeros(n, bool))
    rev = lambda a: a[::-1]
    (au, av, an), _ = lax.scan(
        step, acc0, (rev(uvn), rev(perm), rev(starts)))
    return au, av, an


def _initial_model(cfg: PipelineConfig) -> MotionModel:
    """Initial warm-start model honoring cfg.f64_totals — shared by the
    scan, cold and multihost entry points so the accumulator precision
    cannot silently diverge between pipelines for the same config."""
    if cfg.f64_totals:
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "cfg.f64_totals requires x64 mode (jax.experimental."
                "enable_x64() or jax_enable_x64=True); without it the "
                "f64 carry would silently downcast to f32"
            )
        return MotionModel.zero(jnp.float64)
    return MotionModel.zero()


def _accumulate_first_wins(prepared, uvn, acc=None, claimed=None):
    """First-slice-wins accumulation by ORIGINAL index into (optionally
    pre-existing) full-recording arrays.  Slices are spatially sorted, so
    entry j of slice s corresponds to original event idx[s, j] /
    starts[s] + perm[s, j].  For a range staging, only events whose FIRST
    containing slice is local are claimed (original index beyond the
    previous range's last trigger), so consecutive ranges' claims are
    disjoint.  ``claimed`` (optional bool[n], mutated in place) records
    which slots this call wrote — the explicit claim mask mixed
    compact/host merges overlay by."""
    uvn = np.asarray(uvn)                    # [S, nch, 3, CHUNK]
    S0 = uvn.shape[0]
    u = uvn[:, :, 0, :].reshape(S0, -1)
    v = uvn[:, :, 1, :].reshape(S0, -1)
    noise_s = uvn[:, :, 2, :].reshape(S0, -1) != 0
    plan = prepared["plan"]
    n = prepared["n"]
    idx_h = prepared["idx_host"]
    perm_h = prepared.get("perm_host")
    starts_h = plan.starts
    lo = prepared.get("slice_range", (0, 0))[0]
    claim_from = int(prepared["prev_end"]) + 1 if lo > 0 else 0
    if acc is None:
        acc = (np.zeros(n, np.float32), np.zeros(n, np.float32),
               np.zeros(n, bool))
    acc_u, acc_v, acc_noise = acc
    seen = np.zeros(n, bool)
    for s in range(len(plan.ends)):
        if idx_h is None:          # compact native path: idx deferred
            m = perm_h[s] != PERM_SENTINEL
            orig = starts_h[s] + perm_h[s][m].astype(np.int64)
        else:
            m = idx_h[s] >= 0      # band-padded layouts are not a prefix
            orig = idx_h[s][m]
        fresh = ~seen[orig] & (orig >= claim_from)
        tgt = orig[fresh]
        acc_u[tgt] = u[s][m][fresh]
        acc_v[tgt] = v[s][m][fresh]
        acc_noise[tgt] = noise_s[s][m][fresh]
        if claimed is not None:
            claimed[tgt] = True
        seen[orig] = True
    return acc_u, acc_v, acc_noise


def _estimate_scan_device_bytes(t_ns, cfg: PipelineConfig) -> float:
    """Device residency of the one-program scan: input slabs (x/y u16 +
    t f32 + perm u16 = 10 B/slot), the stacked uvn output (3 f32 =
    12 B/slot), plus the [n] accumulation outputs.  Slots = S * padded
    capacity; the trigger plan is cheap to compute standalone (~10 ms at
    48M events)."""
    from better_flow_tpu.ops.pallas.fused_model import CHUNK

    plan = plan_slices(np.ascontiguousarray(t_ns, np.int64), cfg)
    S = len(plan.ends)
    n_bands = max(cfg.sensor.res_x + BAND_ROWS - 1, BAND_ROWS) // BAND_ROWS
    cap = cfg.slice.max_events
    capp = -(-(cap + n_bands * (CHUNK - 1)) // CHUNK) * CHUNK
    return float(S) * capp * (10 + 12) + len(t_ns) * 13.0


def compensate_recording_scan(
    x,
    y,
    t_ns,
    cfg: Optional[PipelineConfig] = None,
    init_model: Optional[MotionModel] = None,
    prepared: Optional[dict] = None,
    carry_in=None,
) -> dict:
    """Process a whole recording with one device program.

    Returns accumulated per-event flow (first-slice-wins, matching
    get_accumulated), per-slice stats, and timing that separates compile
    (first call) from steady-state execution.  Pass ``prepared`` from
    prepare_recording to reuse the host-side slicing across runs.

    ``carry_in`` (a make_carry tuple) continues a warm-start chain from a
    previous range — the multi-host hand-off; the result's ``carry``
    holds the final carry for the next range.  When ``prepared`` was
    staged with a slice_range, accumulation claims only events whose
    FIRST containing slice is local (original index > the previous
    range's last trigger), so per-range outputs from consecutive ranges
    are disjoint and their elementwise union equals the full-recording
    first-slice-wins result exactly.
    """
    cfg = cfg or PipelineConfig()
    if prepared is None:
        # Bounded-memory guard (round-5): the one-program scan keeps the
        # full slab set + the stacked uvn output resident (estimated
        # ~7.7 GB at 96M events, which RESOURCE_EXHAUSTs the v5e pool
        # slice once accumulation temporaries land on top).  Recordings
        # whose estimated residency exceeds the budget route through the
        # batch-pipelined cold path, whose peak is ~2 batches regardless
        # of length (staging/compute/fetch overlap; bit-identical
        # outputs).  The budget is tunable via BF_SCAN_DEVICE_BUDGET_GB;
        # callers that pre-staged (``prepared``) made the residency
        # decision themselves and are not second-guessed.
        import os as _os

        budget_gb = float(_os.environ.get("BF_SCAN_DEVICE_BUDGET_GB", 5.0))
        est = _estimate_scan_device_bytes(np.asarray(t_ns), cfg)
        if est > budget_gb * 1e9:
            n_batch = max(4, int(np.ceil(est / (budget_gb * 1e9) * 2)))
            out = compensate_recording_cold(x, y, t_ns, cfg,
                                            n_batch=n_batch)
            out["stats"]["plan_s"] = 0.0
            out["stats"]["run_s"] = out["stats"]["total_s"]
            out["stats"]["routed_cold"] = True
            out["stats"]["est_device_gb"] = round(est / 1e9, 2)
            return out
        prepared = prepare_recording(x, y, t_ns, cfg)
    plan = prepared["plan"]
    n = prepared["n"]
    t_plan = prepared["plan_s"]

    if carry_in is not None:
        carry0 = carry_in
    else:
        model0 = init_model if init_model is not None else _initial_model(cfg)
        ws_h, st_h, en_h = prepared.get("hist0", (None, None, None))
        carry0 = make_carry(model0, prepared["hist_k"], ws_h=ws_h,
                            st_h=st_h, en_h=en_h)
    t_run0 = time.perf_counter()
    if prepared["compact"]:
        carry_out, (uvn, iters, ran), chk = _scan_slices_compact(
            prepared["xs16"], prepared["ys16"], prepared["ts"],
            prepared["perm"], prepared["starts"], prepared["ends"],
            prepared["bbox"], prepared["nval"],
            carry0, cfg, prepared["hist_k"],
        )
    else:
        carry_out, (uvn, iters, ran), chk = _scan_slices(
            prepared["xs"], prepared["ys"], prepared["ts"], prepared["idx"],
            prepared["starts"], prepared["ends"],
            prepared["bbox"], prepared["nval"],
            carry0, cfg, prepared["hist_k"],
        )
    float(np.asarray(chk))  # host fetch: forces true completion (see _scan_slices)
    t_run = time.perf_counter() - t_run0
    final_model = carry_out[0]

    if prepared["compact"]:
        lo = prepared.get("slice_range", (0, 0))[0]
        claim_from = int(prepared["prev_end"]) + 1 if lo > 0 else 0
        au, av, an = _accumulate_device(
            uvn, prepared["perm"], prepared["starts"],
            jnp.int32(claim_from), n)
        acc_u = np.asarray(au)
        acc_v = np.asarray(av)
        acc_noise = np.asarray(an)
    else:
        acc_u, acc_v, acc_noise = _accumulate_first_wins(prepared, uvn)
    S = len(plan.ends)

    return {
        "u": acc_u,
        "v": acc_v,
        "noise": acc_noise,
        "model": final_model,
        "carry": carry_out,
        "iters": np.asarray(iters),
        "ran": np.asarray(ran),
        "plan": plan,
        "stats": {
            "n_events": n,
            "n_slices": S,
            "plan_s": t_plan,
            "run_s": t_run,
            "events_per_s": n / t_run if t_run > 0 else 0.0,
            "mean_iters": float(np.mean(np.asarray(iters))) if S else 0.0,
        },
    }


_CKPT_VERSION = 2


def config_digest(cfg: PipelineConfig) -> str:
    """Deterministic digest of the effective pipeline/optimizer config.
    Frozen dataclasses repr every field, so ANY knob change (tolerances,
    schedule, exit factors, slice geometry, f64_totals, ...) changes the
    digest — resuming a checkpoint under a different config would stitch
    batches computed under two configs into an output that is
    bit-identical to NO single run."""
    return repr(cfg)


def save_offline_checkpoint(path, *, n, S, n_batch, done, carry,
                            batch_results, cfg: PipelineConfig = None):
    """Persist the cold pipeline's state at a batch boundary: the scan
    carry (model + secant seed + window-gate history — the exact multihost
    hand-off payload) plus each completed batch's compact claimed results.
    A resumed run continues bit-identically (the carry IS the complete
    cross-batch state; tests/test_offline_checkpoint.py)."""
    from better_flow_tpu.core.model import MotionModel

    model, seed, ws_h, st_h, en_h = carry
    state = {
        "version": np.int64(_CKPT_VERSION), "n": np.int64(n),
        "S": np.int64(S), "n_batch": np.int64(n_batch),
        "done_batches": np.int64(done),
        "carry_seed": np.asarray(seed), "carry_ws": np.asarray(ws_h),
        "carry_st": np.asarray(st_h), "carry_en": np.asarray(en_h),
    }
    if cfg is not None:
        state["config_digest"] = np.asarray(config_digest(cfg))
    for f in MotionModel._fields:
        state[f"carry_model_{f}"] = np.asarray(getattr(model, f))
    for b, (au, av, an, iters) in enumerate(batch_results):
        state[f"acc_u_{b}"] = au
        state[f"acc_v_{b}"] = av
        state[f"acc_n_{b}"] = an
        state[f"iters_{b}"] = iters
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **state)
    os.replace(tmp, str(path))


def load_offline_checkpoint(path, *, n, S, n_batch, hist_k,
                            cfg: PipelineConfig = None, claims=None):
    """Load and validate a cold-pipeline checkpoint.  Returns
    (done_batches, carry, batch_results) or None when the file is absent.
    Raises when the checkpoint belongs to a different recording, config
    (digest of the full PipelineConfig — tolerances, schedule, exit
    factors all count) or batch split (n, S or n_batch mismatch), and
    when the stored arrays are truncated/inconsistent (carry history
    lengths, per-batch result lengths vs ``claims``)."""
    from better_flow_tpu.core.model import MotionModel

    if not os.path.exists(str(path)):
        return None
    z = np.load(str(path), allow_pickle=False)
    if int(z["version"]) != _CKPT_VERSION:
        raise ValueError(f"unsupported checkpoint version {int(z['version'])}")
    for key, want in (("n", n), ("S", S), ("n_batch", n_batch)):
        if int(z[key]) != want:
            raise ValueError(
                f"checkpoint mismatch: {key}={int(z[key])} but this run has "
                f"{want} — wrong recording, config, or n_batch")
    if cfg is not None and "config_digest" in z:
        have = str(z["config_digest"])
        want_d = config_digest(cfg)
        if have != want_d:
            raise ValueError(
                "checkpoint config mismatch: the checkpoint was written "
                f"under a different PipelineConfig.\n  checkpoint: {have}\n"
                f"  this run:  {want_d}\nResuming would stitch batches "
                "computed under two different configs.")
    if cfg is not None and cfg.f64_totals and not jax.config.jax_enable_x64:
        # Same validation as _initial_model: without x64 the f64 carry
        # totals below would silently downcast to f32 on jnp.asarray.
        raise ValueError(
            "cfg.f64_totals requires x64 mode to resume (jax.experimental."
            "enable_x64() or jax_enable_x64=True); without it the "
            "checkpointed f64 carry would silently downcast to f32")
    model = MotionModel(
        *(jnp.asarray(z[f"carry_model_{f}"]) for f in MotionModel._fields))
    ws = np.asarray(z["carry_ws"])
    if len(ws) != hist_k:
        raise ValueError("checkpoint hist_k mismatch")
    st_h = np.asarray(z["carry_st"])
    en_h = np.asarray(z["carry_en"])
    if len(st_h) != hist_k or len(en_h) != hist_k:
        raise ValueError(
            f"checkpoint carry history truncated: st/en lengths "
            f"{len(st_h)}/{len(en_h)} != hist_k {hist_k}")
    carry = (model, jnp.asarray(z["carry_seed"]), jnp.asarray(ws),
             jnp.asarray(st_h), jnp.asarray(en_h))
    done = int(z["done_batches"])
    batch_results = []
    for b in range(done):
        row = (z[f"acc_u_{b}"], z[f"acc_v_{b}"], z[f"acc_n_{b}"],
               z[f"iters_{b}"])
        if claims is not None:
            want_len = claims[b][1] - claims[b][0]
            for name, a in zip(("acc_u", "acc_v", "acc_n"), row[:3]):
                if len(a) != want_len:
                    raise ValueError(
                        f"checkpoint batch {b} {name} length {len(a)} != "
                        f"claim range {want_len} — truncated or edited "
                        "checkpoint")
        batch_results.append(row)
    return done, carry, batch_results


def compensate_recording_cold(
    x, y, t_ns, cfg: Optional[PipelineConfig] = None, n_batch: int = 4,
    checkpoint_path=None, resume: bool = False,
    compact_results: bool = False,
) -> dict:
    """True cold-path processing: staging, device execution AND result
    delivery all OVERLAP.

    The recording is split into ``n_batch`` contiguous slice ranges; each
    range is staged (native sort + compact transfer), its scan DISPATCHED
    asynchronously, and — because each batch's claimed events form a
    CONTIGUOUS original-index range — its first-slice-wins accumulation
    runs on device into a compact per-batch buffer whose device->host copy
    starts immediately (``copy_to_host_async``).  The device therefore
    runs batch k while the host sorts batch k+1 and batch k-1's results
    stream back — cold wall-clock pays max(staging, device run, fetch)
    instead of their sum, and the result is bit-identical to
    compensate_recording_scan (the carry hand-off is the multi-host chain
    mechanism, tests/test_multihost.py; the round-4 fetch overlap changes
    only WHEN bytes move, not what they hold).

    ``compact_results`` fetches each batch's results through the packed
    u8 wire format (_pack_results: f16 u/v + bit-packed noise, 4.125
    B/event instead of 9) — for relay links whose device->host direction
    is the bottleneck; u/v are f16-quantized (~2^-11 relative), noise
    exact.  Checkpoint/resume under the flag stores the decoded values,
    so a resumed compact run remains bit-identical to an uninterrupted
    compact run (and the exact path stays the default for bit-identity
    vs compensate_recording_scan).

    ``checkpoint_path`` (optional) persists (carry, completed batches'
    results) at every batch boundary — saved one batch behind the dispatch
    frontier so checkpointing does not serialize the overlap; with
    ``resume=True`` a matching checkpoint restarts after the last
    completed batch and the final output is bit-identical to an
    uninterrupted run (tests/test_offline_checkpoint.py).

    Ranges share one compiled program when their slice counts match (all
    but possibly the last); the per-batch dispatch overhead (~26 ms each
    through the axon relay) is why the STEADY-state bench path keeps the
    single full-recording program — use this entry point when the
    recording is processed once.
    """
    cfg = cfg or PipelineConfig()
    import time as _time

    t0 = _time.perf_counter()
    t_ns = np.ascontiguousarray(t_ns, np.int64)
    plan_full = plan_slices(t_ns, cfg)
    S = len(plan_full.ends)
    n = len(x)
    n_batch = max(1, min(n_batch, S))
    per = -(-S // n_batch)
    bounds = [(b * per, min((b + 1) * per, S))
              for b in range(n_batch) if b * per < S]
    # Claim ranges are known up front from the full trigger plan: batch b
    # claims exactly the events whose FIRST containing slice is local,
    # i.e. original indices [prev_range_last_trigger+1, this_range_last
    # _trigger+1) — contiguous and disjoint across batches.
    claims = []
    for (lo, hi) in bounds:
        cfrom = int(plan_full.ends[lo - 1]) + 1 if lo > 0 else 0
        cto = int(plan_full.ends[hi - 1]) + 1 if hi < S else n
        claims.append((cfrom, cto))
    claim_cap = max((cto - cfrom for cfrom, cto in claims), default=1)
    claim_cap = max(claim_cap, 1)

    done = 0
    batch_results = []   # per completed batch: (u, v, noise, iters) compact
    carry = None
    if resume and checkpoint_path is not None:
        # hist_k from the full plan, same formula as prepare_recording —
        # no staging needed just to validate the carry shape.
        first_overlap = np.searchsorted(plan_full.ends, plan_full.starts)
        hist_k = max(1, int(np.max(np.arange(S) - first_overlap,
                                   initial=1)))
        loaded = load_offline_checkpoint(checkpoint_path, n=n, S=S,
                                         n_batch=n_batch, hist_k=hist_k,
                                         cfg=cfg, claims=claims)
        if loaded is not None:
            done, carry, batch_results = loaded


    def _fetch_acc(acc_h, m):
        """Fetch+decode one batch's accumulated (u, v, noise)[:m] from
        either the exact 3-array handle or the packed u8 wire format."""
        if isinstance(acc_h, (tuple, list)):
            return tuple(np.asarray(a)[:m] for a in acc_h)
        u_, v_, n_ = _unpack_results(acc_h, claim_cap)
        return u_[:m], v_[:m], n_[:m]

    launched = []   # (batch_idx, prep, outs, acc_async)
    pending_ckpt = None   # (batch_idx, carry_after_batch)
    for bi, (lo, hi) in enumerate(bounds):
        if bi < done:
            continue
        prep = prepare_recording(x, y, t_ns, cfg, slice_range=(lo, hi))
        if checkpoint_path is not None and not prep["compact"]:
            raise ValueError(
                "offline checkpointing requires the compact staging path "
                "(integral u16 coordinates)")
        if carry is None:
            ws_h, st_h, en_h = prep["hist0"]
            carry = make_carry(_initial_model(cfg), prep["hist_k"],
                               ws_h=ws_h, st_h=st_h, en_h=en_h)
        if prep["compact"]:
            carry, outs, chk = _scan_slices_compact(
                prep["xs16"], prep["ys16"], prep["ts"], prep["perm"],
                prep["starts"], prep["ends"], prep["bbox"], prep["nval"],
                carry, cfg, prep["hist_k"])
            # Dispatch this batch's compact range accumulation right away
            # and start its device->host copy: the fetch streams while the
            # host sorts batch bi+1 and the device runs this batch.
            uvn, iters, ran = outs
            cfrom, cto = claims[bi]
            acc = _accumulate_device_range(
                uvn, prep["perm"], prep["starts"],
                jnp.int32(cfrom), jnp.int32(cto), claim_cap)
            if compact_results:
                acc = _pack_results(*acc)
                acc.copy_to_host_async()
            else:
                for a in acc:
                    a.copy_to_host_async()
            # Bounded memory (the reference's defining property,
            # datastructures.h:31-59): once this batch's accumulation is
            # DISPATCHED, nothing downstream reads the input slabs or
            # the [S_b, ...] uvn again — the stitch uses only (iters,
            # acc) for compact batches and the checkpoint writer only
            # (iters, acc, carry).  Dropping the Python refs here lets
            # the runtime free each batch's ~GB of slabs+outputs as its
            # programs complete, so peak device memory is ~2 batches
            # regardless of recording length (round-5 VERDICT #6).
            prep = None
            uvn = None
            outs = (None, iters, ran)
        else:
            carry, outs, chk = _scan_slices(
                prep["xs"], prep["ys"], prep["ts"], prep["idx"],
                prep["starts"], prep["ends"], prep["bbox"], prep["nval"],
                carry, cfg, prep["hist_k"])
            acc = None
        launched.append((bi, prep, outs, acc))
        # Write the PREVIOUS batch's checkpoint now that this batch is
        # dispatched: fetching its carry only waits on work that already
        # ran, so the overlap survives checkpointing.
        if checkpoint_path is not None and pending_ckpt is not None:
            pb, pcarry = pending_ckpt
            prev = launched[-2]
            _, pprep, pouts, pacc = prev
            if pacc is None:
                raise ValueError(
                    "offline checkpointing requires the compact staging "
                    "path (integral u16 coordinates)")
            batch_results.append(
                _fetch_acc(pacc, claims[pb][1] - claims[pb][0])
                + (np.asarray(pouts[1]),))
            host_carry = jax.tree_util.tree_map(np.asarray, pcarry)
            save_offline_checkpoint(
                checkpoint_path, n=n, S=S, n_batch=n_batch, done=pb + 1,
                carry=host_carry, batch_results=batch_results, cfg=cfg)
        pending_ckpt = (bi, carry)

    # Finalize the last batch's checkpoint (the run is complete here, so
    # the extra sync costs nothing).
    if checkpoint_path is not None and pending_ckpt is not None:
        pb, pcarry = pending_ckpt
        _, pprep, pouts, pacc = launched[-1]
        if pacc is None:
            raise ValueError(
                "offline checkpointing requires the compact staging path "
                "(integral u16 coordinates)")
        batch_results.append(
            _fetch_acc(pacc, claims[pb][1] - claims[pb][0])
            + (np.asarray(pouts[1]),))
        host_carry = jax.tree_util.tree_map(np.asarray, pcarry)
        save_offline_checkpoint(
            checkpoint_path, n=n, S=S, n_batch=n_batch, done=pb + 1,
            carry=host_carry, batch_results=batch_results, cfg=cfg)

    # Stitch: checkpointed/completed batches first, then the batches this
    # run launched.  Compact batches place their contiguous claim range;
    # non-compact batches fall back to the host first-wins accumulate.
    acc_u = np.zeros(n, np.float32)
    acc_v = np.zeros(n, np.float32)
    acc_noise = np.zeros(n, bool)
    iters_parts = [None] * len(bounds)
    for pb in range(done):
        au, av, an, it = batch_results[pb]
        cfrom, cto = claims[pb]
        acc_u[cfrom:cto] = au
        acc_v[cfrom:cto] = av
        acc_noise[cfrom:cto] = an
        iters_parts[pb] = np.asarray(it)
    acc_host = None
    host_claimed = None
    for bi, prep, outs, acc in launched:
        uvn, iters, ran = outs
        iters_parts[bi] = np.asarray(iters)
        if acc is not None:
            cfrom, cto = claims[bi]
            au_b, av_b, an_b = _fetch_acc(acc, cto - cfrom)
            acc_u[cfrom:cto] = au_b
            acc_v[cfrom:cto] = av_b
            acc_noise[cfrom:cto] = an_b
        else:
            if host_claimed is None:
                host_claimed = np.zeros(n, bool)
            acc_host = _accumulate_first_wins(prep, uvn,
                                              acc=acc_host,
                                              claimed=host_claimed)
    if acc_host is not None:
        # Overlay by the EXPLICIT claim mask (which slots the host batches
        # wrote) — per-batch claims are disjoint by the claim rule, but
        # inferring claimed slots from nonzero values would silently drop
        # host results that are exactly 0.
        m = host_claimed
        acc_u[m] = acc_host[0][m]
        acc_v[m] = acc_host[1][m]
        acc_noise[m] = acc_host[2][m]
    iters = (np.concatenate([p for p in iters_parts if p is not None])
             if any(p is not None for p in iters_parts)
             else np.zeros(0, np.int32))
    total_s = _time.perf_counter() - t0
    return {
        "u": acc_u, "v": acc_v, "noise": acc_noise,
        "model": carry[0] if carry is not None else MotionModel.zero(),
        "carry": carry, "iters": iters,
        "stats": {
            "n_events": len(x), "n_slices": S, "n_batches": len(bounds),
            "resumed_batches": done,
            "total_s": total_s,
            "events_per_s": len(x) / total_s if total_s > 0 else 0.0,
            "mean_iters": float(iters.mean()) if S else 0.0,
        },
    }
