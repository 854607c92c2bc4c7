"""Event-parallel slice processing: shard events, psum images.

The reference parallelizes within one CPU via TBB parallel_for over image
rows (accel_lib.h:168-175, 528-542) and has no cross-device story.  The
TPU-native equivalent for the *event-dominated* regime: shard the event
tensors of one slice across a mesh axis; each device scatters its local
events into pre-filter images that are combined with one ``psum`` per
optimizer iteration (riding ICI), after which the cheap image-space model
update is computed redundantly on every device — keeping the model exactly
replicated with zero extra communication.  All collectives are inserted
inside the jitted while-loop; convergence decisions are identical on every
device because they depend only on the psum'd model.

For megapixel sensors where the image dominates, see
better_flow_tpu.parallel.spatial (tiled images + halo exchange).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from better_flow_tpu.config import OptimizerConfig, SensorConfig
from better_flow_tpu.core.events import EventSlice
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.models.global_flow import SliceResult, process_slice

AXIS = "ev"


def process_slice_event_parallel(
    ev: EventSlice,
    last_model: MotionModel,
    cfg: OptimizerConfig,
    sensor: SensorConfig,
    mesh: Mesh,
    warm_start: bool = True,
) -> SliceResult:
    """Sharded equivalent of models.global_flow.process_slice.

    Event arrays are sharded along mesh axis 'ev' (capacity must divide the
    axis size); the model is replicated.  Returns a SliceResult whose
    per-event arrays are sharded and whose model/scalars are replicated.
    """
    n_dev = mesh.shape[AXIS]
    if ev.capacity % n_dev != 0:
        raise ValueError(
            f"capacity {ev.capacity} not divisible by mesh axis {n_dev}"
        )

    ev_spec = EventSlice(x=P(AXIS), y=P(AXIS), t=P(AXIS), valid=P(AXIS), noise=P(AXIS))
    model_spec = jax.tree_util.tree_map(lambda _: P(), last_model)
    out_spec = SliceResult(
        model=model_spec,
        pr_x=P(AXIS), pr_y=P(AXIS), nx=P(AXIS), ny=P(AXIS),
        u=P(AXIS), v=P(AXIS), noise=P(AXIS),
        iters=P(), ran=P(), window_small=P(),
    )

    fn = jax.shard_map(
        partial(
            process_slice,
            cfg=cfg,
            sensor=sensor,
            warm_start=warm_start,
            axis_name=AXIS,
        ),
        mesh=mesh,
        in_specs=(ev_spec, model_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(ev, last_model)


def jit_event_parallel(cfg, sensor, mesh, warm_start=True):
    """jit-compiled sharded slice processor (static over cfg/sensor/mesh)."""
    return jax.jit(
        partial(
            process_slice_event_parallel,
            cfg=cfg,
            sensor=sensor,
            mesh=mesh,
            warm_start=warm_start,
        )
    )


def compensate_recording_scan_sharded(
    x, y, t_ns, cfg, mesh: Mesh, init_model: Optional[MotionModel] = None,
) -> dict:
    """Multi-chip offline pipeline: the device-resident slice scan with each
    slice's events sharded over mesh axis 'ev'.

    Inside shard_map, every device scatters its event shard (pre-filter
    images psum'd per iteration via axis_name='ev'); the warm-start model
    stays replicated because every device sees identical psum'd reductions.
    Cross-slice noise persistence needs NO communication: the only noise
    source is the per-slice window gate (whose verdict is already
    replicated via the psum'd bounding box), so each shard reconstructs
    its events' flags from a replicated scalar history of
    (window_small, start, end) — see scan_pipeline._run_scan.

    This is the 1-host/N-chip and (over DCN meshes) N-host measurement
    configuration of BASELINE.md's scaling protocol.
    """
    import time as _time

    import numpy as np
    from jax import lax

    from better_flow_tpu.config import PipelineConfig
    from better_flow_tpu.runtime.scan_pipeline import (
        materialize_slices,
        plan_slices,
    )

    n_dev = mesh.shape[AXIS]
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    t_ns = np.ascontiguousarray(t_ns, np.int64)
    n_total = len(x)

    t0 = _time.perf_counter()
    plan = plan_slices(t_ns, cfg)
    cap = -(-cfg.slice.max_events // (8 * n_dev)) * 8 * n_dev
    xs, ys, ts, idx, lens = materialize_slices(x, y, t_ns, plan, cap)
    plan_s = _time.perf_counter() - t0

    opt = cfg.optimizer
    sensor = cfg.sensor
    warm = not cfg.stm_disable
    local_cap = cap // n_dev
    S = xs.shape[0]
    first_overlap = np.searchsorted(plan.ends, plan.starts)
    hist_k = max(1, int(np.max(np.arange(S) - first_overlap, initial=1)))
    starts_d = jnp.asarray(plan.starts.astype(np.int32))
    ends_d = jnp.asarray(plan.ends.astype(np.int32))

    def local_scan(xs, ys, ts, idx, lens, starts, ends, model0):
        dev = lax.axis_index(AXIS)
        pos = dev * local_cap + jnp.arange(local_cap, dtype=jnp.int32)

        def step(carry, inputs):
            model, ws_h, st_h, en_h = carry
            sx, sy, st, sidx, slen, start, end = inputs
            valid = pos < slen
            noise = jnp.zeros_like(valid)
            for j in range(hist_k):
                noise |= ws_h[j] & (sidx >= st_h[j]) & (sidx <= en_h[j])
            ev = EventSlice(x=sx, y=sy, t=st, valid=valid,
                            noise=noise & valid)
            res = process_slice(ev, model, opt, sensor, warm_start=warm,
                                axis_name=AXIS)
            ws_h = jnp.concatenate([ws_h[1:], res.window_small[None]])
            st_h = jnp.concatenate([st_h[1:], start[None]])
            en_h = jnp.concatenate([en_h[1:], end[None]])
            return (res.model, ws_h, st_h, en_h), (
                res.u, res.v, res.noise, res.iters
            )

        carry0 = (
            model0,
            jnp.zeros((hist_k,), bool),
            jnp.zeros((hist_k,), jnp.int32),
            jnp.full((hist_k,), -1, jnp.int32),
        )
        (final_model, *_), outs = lax.scan(
            step, carry0, (xs, ys, ts, idx, lens, starts, ends)
        )
        return final_model, outs

    model_spec = jax.tree_util.tree_map(lambda _: P(), MotionModel.zero())
    fn = jax.jit(
        jax.shard_map(
            local_scan,
            mesh=mesh,
            in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS), P(None), P(None), P(None), model_spec),
            out_specs=(model_spec, (P(None, AXIS), P(None, AXIS),
                                    P(None, AXIS), P(None))),
            check_vma=False,
        )
    )

    model0 = init_model or MotionModel.zero()
    t0 = _time.perf_counter()
    final_model, (u, v, noise_s, iters) = fn(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts),
        jnp.asarray(idx), jnp.asarray(lens), starts_d, ends_d, model0,
    )
    jax.block_until_ready(final_model)
    run_s = _time.perf_counter() - t0

    # First-slice-wins by ORIGINAL index (slices are spatially sorted).
    u = np.asarray(u)
    v = np.asarray(v)
    noise_s = np.asarray(noise_s)
    acc_u = np.zeros(n_total, np.float32)
    acc_v = np.zeros(n_total, np.float32)
    acc_noise = np.zeros(n_total, bool)
    seen = np.zeros(n_total, bool)
    for s in range(S):
        m = int(lens[s])
        orig = idx[s, :m]
        fresh = ~seen[orig]
        tgt = orig[fresh]
        acc_u[tgt] = u[s, :m][fresh]
        acc_v[tgt] = v[s, :m][fresh]
        acc_noise[tgt] = noise_s[s, :m][fresh]
        seen[orig] = True

    return {
        "u": acc_u, "v": acc_v, "noise": acc_noise, "model": final_model,
        "iters": np.asarray(iters),
        "stats": {
            "n_events": n_total, "n_slices": S, "n_devices": n_dev,
            "plan_s": plan_s, "run_s": run_s,
            "events_per_s": n_total / run_s if run_s > 0 else 0.0,
            "mean_iters": float(np.mean(np.asarray(iters))),
        },
    }
