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


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_tiled_recording_pipeline_matches_untiled():
    """Round-2 verdict item 5: the RECORDING-level tiled pipeline — slice
    scan, bbox-window geometry, window/min-event gates, noise marking and
    warm-start carry over a tiled megapixel-class sensor — must match the
    untiled scan.  720x1280 sensor on the 4x2 tile mesh, scale 1 (the
    low-latency megapixel regime), zero escape-lane drops."""
    from better_flow_tpu.config import PipelineConfig, SliceConfig
    from better_flow_tpu.parallel.spatial import compensate_recording_tiled
    from better_flow_tpu.runtime.scan_pipeline import (
        compensate_recording_scan,
    )

    # Megapixel-scale density matters: at scale 1 the masked Scharr needs
    # locally DENSE structure (all nine neighbors nonzero) or the gradient
    # is identically zero and every slice exits after one iteration with
    # zero flow — a vacuous parity.  jitter_px fattens the point clusters
    # so 3x3 neighborhoods fill, like real extended edges do.
    cfg = PipelineConfig(
        sensor=SensorConfig(720, 1280),
        slice=SliceConfig(max_events=60_000, span_ns=int(0.07e9),
                          refresh_events=25_000,
                          refresh_time_ns=int(0.03e9)),
        optimizer=OptimizerConfig(scale=1, max_iter=10, min_events=1000),
    )
    d = synthetic_events(300_000, duration_s=0.2, res_x=720, res_y=1280,
                         vx=120.0, vy=-80.0, rot=0.1, div=0.03,
                         n_points=600, jitter_px=1.5, seed=4)
    ref = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg)
    mesh = _tiled_mesh(4, 2)
    out = compensate_recording_tiled(d["x"], d["y"], d["t_ns"], cfg, mesh,
                                     halo=32, esc_cap=32768)
    assert out["stats"]["escaped_dropped"] == 0
    assert out["stats"]["n_slices"] == ref["stats"]["n_slices"]
    np.testing.assert_array_equal(out["noise"], ref["noise"])
    np.testing.assert_array_equal(out["iters"], ref["iters"])
    ok = ~ref["noise"]
    speed = float(np.hypot(ref["u"][ok], ref["v"][ok]).mean())
    assert speed > 50.0, speed  # real flow recovered, not a vacuous zero
    du = np.abs(out["u"][ok] - ref["u"][ok])
    dv = np.abs(out["v"][ok] - ref["v"][ok])
    # tiled splat + psum'd partials accumulate in a different order than
    # the untiled scatter; parity is ulp-level per iteration
    assert np.median(du) <= 0.005 * speed, (np.median(du), speed)
    assert np.median(dv) <= 0.005 * speed
    assert du.max() <= 0.05 * speed, (du.max(), speed)


@needs_8
def test_tiled_recording_pipeline_gates_and_noise():
    """Degenerate mid-recording segment: the tiled pipeline must fire the
    same window gate, mark the same events noise, and keep processing
    after it (warm-start chain through a gated slice)."""
    from better_flow_tpu.config import PipelineConfig, SliceConfig
    from better_flow_tpu.parallel.spatial import compensate_recording_tiled
    from better_flow_tpu.runtime.scan_pipeline import (
        compensate_recording_scan,
    )

    rng = np.random.default_rng(1)
    a = synthetic_events(20_000, duration_s=0.1, res_x=720, res_y=1280,
                         vx=100.0, vy=-60.0, n_points=400, seed=7)
    nb = 30_000
    bt = np.sort(rng.integers(0, int(0.12e9), nb)) + int(0.1e9)
    c = synthetic_events(20_000, duration_s=0.1, res_x=720, res_y=1280,
                         vx=100.0, vy=-60.0, n_points=400, seed=8)
    x = np.concatenate([a["x"], np.full(nb, 360.0), c["x"]])
    y = np.concatenate([a["y"], np.full(nb, 640.0), c["y"]])
    t_ns = np.concatenate([a["t_ns"], bt, c["t_ns"] + int(0.22e9)])
    order = np.argsort(t_ns, kind="stable")
    x, y, t_ns = x[order], y[order], np.ascontiguousarray(t_ns[order])

    cfg = PipelineConfig(
        sensor=SensorConfig(720, 1280),
        slice=SliceConfig(max_events=25_000, span_ns=int(0.05e9),
                          refresh_events=10_000,
                          refresh_time_ns=int(0.03e9)),
        optimizer=OptimizerConfig(scale=1, max_iter=8, min_events=1000),
    )
    ref = compensate_recording_scan(x, y, t_ns, cfg)
    assert ref["noise"].any()
    mesh = _tiled_mesh(4, 2)
    out = compensate_recording_tiled(x, y, t_ns, cfg, mesh, halo=32, esc_cap=32768)
    np.testing.assert_array_equal(out["noise"], ref["noise"])
    np.testing.assert_array_equal(out["iters"], ref["iters"])


@needs_8
def test_tiled_recording_pipeline_fast_schedule():
    """The tiled pipeline drives the fast secant schedule through the same
    _drive_loop as the untiled scan (seed carry included): both schedules
    must land on the same converged flow, the fast one in fewer
    iterations."""
    from better_flow_tpu.config import PipelineConfig, SliceConfig
    from better_flow_tpu.parallel.spatial import compensate_recording_tiled

    base = dict(
        sensor=SensorConfig(720, 1280),
        slice=SliceConfig(max_events=60_000, span_ns=int(0.07e9),
                          refresh_events=25_000,
                          refresh_time_ns=int(0.03e9)),
    )
    d = synthetic_events(300_000, duration_s=0.2, res_x=720, res_y=1280,
                         vx=120.0, vy=-80.0, rot=0.1, div=0.03,
                         n_points=600, jitter_px=1.5, seed=4)
    mesh = _tiled_mesh(4, 2)
    ref = compensate_recording_tiled(
        d["x"], d["y"], d["t_ns"],
        PipelineConfig(optimizer=OptimizerConfig(scale=1, min_events=1000),
                       **base), mesh, halo=32, esc_cap=32768)
    fast = compensate_recording_tiled(
        d["x"], d["y"], d["t_ns"],
        PipelineConfig(optimizer=OptimizerConfig.fast(scale=1,
                                                      min_events=1000),
                       **base), mesh, halo=32, esc_cap=32768)
    assert fast["stats"]["escaped_dropped"] == 0
    ok = ~(ref["noise"] | fast["noise"])
    speed = float(np.hypot(ref["u"][ok], ref["v"][ok]).mean())
    assert speed > 50.0, speed  # real flow, not a vacuous zero
    assert np.median(np.abs(fast["u"][ok] - ref["u"][ok])) < 0.02 * speed
    assert np.median(np.abs(fast["v"][ok] - ref["v"][ok])) < 0.02 * speed
    assert fast["iters"].sum() < ref["iters"].sum(), (
        int(fast["iters"].sum()), int(ref["iters"].sum()))


def test_splat_local_call_matches_scatter():
    """Unit (round-5): the tiled path's Pallas local splat — counts EXACT,
    time sums to the hi+lo bf16 pair's ~1e-6 s, identical for sorted
    (windowed fast path) and unsorted (full-joint fallback) input."""
    from better_flow_tpu.ops.pallas.fused_model import splat_local_call

    rng = np.random.default_rng(0)
    n, H, W = 5000, 250, 300
    lx = rng.integers(-1, H, n).astype(np.float32)
    ly = rng.integers(0, W, n).astype(np.float32)
    ly[lx < 0] = -1
    t = rng.random(n).astype(np.float32) * 0.2
    ok = lx >= 0
    lin = (lx[ok] * W + ly[ok]).astype(np.int64)
    cnt_ref = np.zeros(H * W)
    np.add.at(cnt_ref, lin, 1.0)
    tsum_ref = np.zeros(H * W)
    np.add.at(tsum_ref, lin, t[ok].astype(np.float64))
    for sort in (True, False):
        if sort:
            o = np.lexsort((ly, lx))
            a, b, c = lx[o], ly[o], t[o]
        else:
            a, b, c = lx, ly, t
        tsum_k, cnt_k = splat_local_call(jnp.asarray(a), jnp.asarray(b),
                                         jnp.asarray(c), H, W)
        np.testing.assert_array_equal(np.asarray(cnt_k).ravel(), cnt_ref)
        np.testing.assert_allclose(np.asarray(tsum_k).ravel(), tsum_ref,
                                   atol=5e-6)


@needs_4
def test_tiled_recording_pallas_matches_xla():
    """The tiled pipeline's Pallas local splat (the real-hardware path —
    the XLA scatter it replaces measured 16 ms/iteration on v5e,
    BASELINE.md round 5) against the XLA scatter path on the same 2x2
    mesh: identical iteration counts, gates and noise; flow to ulp
    level."""
    from better_flow_tpu.config import PipelineConfig, SliceConfig
    from better_flow_tpu.parallel.spatial import compensate_recording_tiled

    d = synthetic_events(60_000, duration_s=0.15, res_x=720, res_y=1280,
                         vx=120.0, vy=-80.0, rot=0.1, div=0.03,
                         n_points=600, jitter_px=1.5, seed=4)
    mesh = _tiled_mesh(2, 2)
    outs = {}
    for mode in ("xla", "pallas"):
        cfg = PipelineConfig(
            sensor=SensorConfig(720, 1280),
            slice=SliceConfig(max_events=20_000, span_ns=int(0.07e9),
                              refresh_events=9_000,
                              refresh_time_ns=int(0.03e9)),
            optimizer=OptimizerConfig(scale=1, max_iter=10,
                                      min_events=1000,
                                      scatter_mode=mode))
        outs[mode] = compensate_recording_tiled(
            d["x"], d["y"], d["t_ns"], cfg, mesh, halo=32, esc_cap=32768)
    a, b = outs["xla"], outs["pallas"]
    np.testing.assert_array_equal(np.asarray(a["iters"]),
                                  np.asarray(b["iters"]))
    np.testing.assert_array_equal(a["noise"], b["noise"])
    assert b["stats"]["escaped_dropped"] == 0
    ok = ~(a["noise"] | b["noise"])
    speed = float(np.hypot(a["u"][ok], a["v"][ok]).mean())
    assert speed > 20.0, speed   # non-vacuous (round-3 lesson)
    du = np.abs(a["u"][ok] - b["u"][ok])
    dv = np.abs(a["v"][ok] - b["v"][ok])
    assert np.median(du) <= 0.001 * speed, (np.median(du), speed)
    assert np.median(dv) <= 0.001 * speed
    assert du.max() <= 0.05 * speed, (du.max(), speed)
