"""BASELINE.json configuration coverage: DAVIS 346x260, low-latency preset,
megapixel spatial tiling."""

import numpy as np
import jax
import pytest

from better_flow_tpu.config import (
    OptimizerConfig,
    PipelineConfig,
    SensorConfig,
    SliceConfig,
    low_latency_config,
)
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.runtime.scan_pipeline import compensate_recording_scan
from better_flow_tpu.parallel.spatial import bucket_events, process_slice_tiled


def test_davis_346x260():
    """Config 3's sensor: DAVIS 346x260 through the full pipeline."""
    sensor = SensorConfig(res_x=260, res_y=346)
    d = synthetic_events(40000, duration_s=0.3, res_x=260, res_y=346,
                         vx=50.0, vy=30.0, n_points=500, seed=13)
    cfg = PipelineConfig(
        sensor=sensor,
        slice=SliceConfig(max_events=20000, span_ns=int(0.15e9),
                          refresh_events=8000, refresh_time_ns=int(0.05e9)),
        optimizer=OptimizerConfig(scale=3),
    )
    out = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg)
    ok = ~out["noise"]
    assert abs(np.median(out["u"][ok]) - 50.0) < 12.0
    assert abs(np.median(out["v"][ok]) - 30.0) < 12.0


def test_low_latency_preset():
    """The ROS live preset (scale 1, max 10 iterations) converges usefully."""
    cfg = low_latency_config()
    d = synthetic_events(60000, duration_s=0.3, res_x=180, res_y=240,
                         vx=40.0, vy=0.0, n_points=500, seed=14)
    out = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg)
    assert out["iters"].max() <= 11
    ok = ~out["noise"]
    # 10 capped iterations at scale 1 under-converge by design (the
    # reference's live preset trades accuracy for latency); require the
    # right direction and a substantial fraction of the magnitude.
    med = np.median(out["u"][ok])
    assert 1.0 < med < 70.0, med   # right direction, capped progress
    assert abs(np.median(out["v"][ok])) < 15.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_megapixel_tiled_smoke():
    """Config 5: a megapixel-class sensor tiled over an 8x1 mesh (scaled
    down in event count for CI; full-sensor image plane is real)."""
    sensor = SensorConfig(res_x=1024, res_y=1024)
    cfg = OptimizerConfig(scale=1, max_iter=2, min_events=100)
    # Megapixel caveat: the masked Scharr's all-nine rule needs >=3x3 solid
    # support; 1-px-thin streaks from point textures yield zero gradient, so
    # the scene uses jitter to give edges realistic thickness.
    d = synthetic_events(120000, duration_s=0.05, res_x=1024, res_y=1024,
                         vx=200.0, vy=-100.0, n_points=300, seed=15,
                         jitter_px=1.5)
    mesh = jax.make_mesh((8, 1), ("tile_x", "tile_y"),
                         devices=jax.devices()[:8])
    t = d["t_ns"].astype(np.float32)
    xb, yb, tb, okb = bucket_events(d["x"], d["y"], t, 1024, 1, 8, 32768)
    r = process_slice_tiled(xb, yb, tb, okb, MotionModel.zero(), cfg, sensor,
                            mesh, halo=32, n_iters=6)
    assert np.isfinite(float(r.model.total_dx))
    u = np.asarray(r.u)[okb]
    assert np.isfinite(u).all()
    assert 120.0 < np.median(u) < 280.0  # tracks GT 200 px/s
