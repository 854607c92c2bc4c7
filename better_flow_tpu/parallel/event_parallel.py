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
        iters=P(), ran=P(),
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
