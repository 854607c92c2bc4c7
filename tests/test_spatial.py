"""Spatially tiled processing: halo-exchange correctness vs single device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from better_flow_tpu.config import OptimizerConfig, SensorConfig
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.parallel.spatial import (
    bucket_events,
    bucket_events_2d,
    process_slice_tiled,
)

needs_4 = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")


def _tiled_mesh(nx, ny):
    return jax.make_mesh((nx, ny), ("tile_x", "tile_y"),
                         devices=jax.devices()[: nx * ny])


@needs_4
def test_tiled_matches_untiled():
    """A 4x1 tiled run must match a 1x1 'tiled' run (same code path, no
    communication) on a scene with moderate drift — cross-tile splats are
    reconciled by the halo exchange."""
    sensor = SensorConfig(48, 64)
    cfg = OptimizerConfig(scale=3, max_iter=6, min_events=100)
    d = synthetic_events(6000, duration_s=0.1, res_x=48, res_y=64,
                         vx=40.0, vy=-25.0, n_points=100, seed=0)
    t = d["t_ns"].astype(np.float32)

    mesh1 = _tiled_mesh(1, 1)
    x1 = np.asarray(d["x"], np.float32)
    y1 = np.asarray(d["y"], np.float32)
    ok1 = np.ones(len(x1), bool)
    r1 = process_slice_tiled(x1, y1, t, ok1, MotionModel.zero(), cfg, sensor,
                             mesh1, halo=32, n_iters=6)

    mesh4 = _tiled_mesh(4, 1)
    xb, yb, tb, okb = bucket_events(d["x"], d["y"], t, 48, 3, 4, 4096)
    r4 = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg, sensor,
                             mesh4, halo=32, n_iters=6)

    np.testing.assert_allclose(
        float(r4.model.total_dx), float(r1.model.total_dx), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(r4.model.total_dy), float(r1.model.total_dy), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(r4.model.total_rot), float(r1.model.total_rot), rtol=5e-3, atol=1e-6
    )
    # flow recovered on both paths
    u1 = np.asarray(r1.u)[ok1]
    u4 = np.asarray(r4.u)[okb]
    assert abs(np.median(u1) - np.median(u4)) < 1.0


@needs_4
def test_tiled_beyond_halo_matches_untiled():
    """A fast scene whose converged warp far exceeds the halo: the escape
    lane must reconcile beyond-halo drifts exactly (VERDICT r1 item 6).
    A deliberately starved lane (esc_cap=1) must REPORT drops — proving the
    scenario actually escapes — while the sized lane drops nothing and
    matches the untiled run."""
    sensor = SensorConfig(48, 64)
    cfg = OptimizerConfig(scale=3, max_iter=16, min_events=100)
    d = synthetic_events(6000, duration_s=0.1, res_x=48, res_y=64,
                         vx=80.0, vy=-50.0, n_points=100, seed=3)
    t = d["t_ns"].astype(np.float32)

    mesh1 = _tiled_mesh(1, 1)
    x1 = np.asarray(d["x"], np.float32)
    y1 = np.asarray(d["y"], np.float32)
    ok1 = np.ones(len(x1), bool)
    r1 = process_slice_tiled(x1, y1, t, ok1, MotionModel.zero(), cfg, sensor,
                             mesh1, halo=8, n_iters=16)

    mesh4 = _tiled_mesh(4, 1)
    xb, yb, tb, okb = bucket_events(d["x"], d["y"], t, 48, 3, 4, 4096)
    r4 = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg, sensor,
                             mesh4, halo=8, n_iters=16)
    assert int(r4.escaped_dropped) == 0
    np.testing.assert_allclose(
        float(r4.model.total_dx), float(r1.model.total_dx),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(r4.model.total_dy), float(r1.model.total_dy),
        rtol=1e-4, atol=1e-6,
    )
    u1 = np.asarray(r1.u)[ok1]
    u4 = np.asarray(r4.u)[okb]
    assert abs(np.median(u1) - np.median(u4)) < 1.0

    # flow actually recovered (the scenario is meaningful)
    assert abs(np.median(np.asarray(r1.u)[ok1]) - 80.0) < 8.0

    # starved lane: drops must be detected and reported
    r_starved = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg,
                                    sensor, mesh4, halo=8, n_iters=16,
                                    esc_cap=1)
    assert int(r_starved.escaped_dropped) > 0


@needs_4
def test_tiled_adaptive_schedule_matches_untiled():
    """Default n_iters=None runs the reference adaptive divider loop with
    replicated decisions: the data-dependent iteration count must be
    identical on a 4x1 mesh and a 1x1 mesh, and the models must agree."""
    sensor = SensorConfig(48, 64)
    cfg = OptimizerConfig(scale=3, max_iter=12, min_events=100)
    d = synthetic_events(6000, duration_s=0.1, res_x=48, res_y=64,
                         vx=40.0, vy=-25.0, n_points=100, seed=0)
    t = d["t_ns"].astype(np.float32)

    mesh1 = _tiled_mesh(1, 1)
    x1 = np.asarray(d["x"], np.float32)
    y1 = np.asarray(d["y"], np.float32)
    ok1 = np.ones(len(x1), bool)
    r1 = process_slice_tiled(x1, y1, t, ok1, MotionModel.zero(), cfg, sensor,
                             mesh1, halo=32)

    mesh4 = _tiled_mesh(4, 1)
    xb, yb, tb, okb = bucket_events(d["x"], d["y"], t, 48, 3, 4, 4096)
    r4 = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg, sensor,
                             mesh4, halo=32)
    assert int(r4.iters) == int(r1.iters)
    assert int(r4.iters) > 1
    np.testing.assert_allclose(
        float(r4.model.total_dx), float(r1.model.total_dx),
        rtol=1e-3, atol=1e-5,
    )


@needs_4
def test_tiled_2d_mesh_runs():
    sensor = SensorConfig(48, 64)
    cfg = OptimizerConfig(scale=1, max_iter=4, min_events=100)
    d = synthetic_events(4000, duration_s=0.1, res_x=48, res_y=64,
                         vx=20.0, vy=10.0, seed=1)
    t = d["t_ns"].astype(np.float32)
    mesh = _tiled_mesh(2, 2)
    xb, yb, tb, okb = bucket_events_2d(d["x"], d["y"], t, 48, 64, 1, 2, 2,
                                       2048)
    r = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg, sensor,
                            mesh, halo=16, n_iters=4)
    assert np.isfinite(float(r.model.total_dx))
    assert np.isfinite(np.asarray(r.u)).all()
    assert int(r.escaped_dropped) == 0
