"""Device-resident scanned pipeline vs the streaming runtime."""

import numpy as np

from better_flow_tpu.config import (
    OptimizerConfig,
    PipelineConfig,
    SensorConfig,
    SliceConfig,
)
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.runtime.offline import compensate_recording
from better_flow_tpu.runtime.scan_pipeline import (
    compensate_recording_scan,
    plan_slices,
)

SMALL = SensorConfig(24, 32)


def small_cfg(**kw):
    return PipelineConfig(
        sensor=SMALL,
        slice=SliceConfig(
            max_events=4000,
            span_ns=int(0.1e9),
            refresh_events=1500,
            refresh_time_ns=int(0.04e9),
        ),
        optimizer=OptimizerConfig(scale=3, min_events=500),
        **kw,
    )


def test_plan_matches_streaming_triggers():
    d = synthetic_events(20000, duration_s=0.5, res_x=24, res_y=32,
                         vx=20.0, vy=-14.0, seed=2)
    cfg = small_cfg()
    plan = plan_slices(d["t_ns"], cfg)
    out = compensate_recording(d["x"], d["y"], d["t_ns"], cfg)
    eng = out["engine"]
    # same number of slices, same trigger timestamps, same window sizes
    assert len(plan.ends) == len(eng.slices)
    for s, rec in zip(range(len(plan.ends)), eng.slices):
        assert d["t_ns"][plan.ends[s]] == rec.timestamp[-1]
        assert plan.ends[s] - plan.starts[s] + 1 == rec.n_events
        assert plan.slice_start_ns[s] == rec.slice_start_time


def test_scan_matches_streaming_results():
    d = synthetic_events(20000, duration_s=0.5, res_x=24, res_y=32,
                         vx=20.0, vy=-14.0, seed=2)
    cfg = small_cfg()
    scan = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg)
    stream = compensate_recording(d["x"], d["y"], d["t_ns"], cfg)
    # identical slice structure and per-slice iteration counts
    iters_stream = [r.iters for r in stream["engine"].slices]
    np.testing.assert_array_equal(scan["iters"], iters_stream)
    # final models agree
    m1, m2 = scan["model"], stream["engine"].last_model
    np.testing.assert_allclose(float(m1.total_dx), float(m2.total_dx), rtol=1e-5)
    np.testing.assert_allclose(float(m1.total_dy), float(m2.total_dy), rtol=1e-5)
    # flow recovery
    ok = ~scan["noise"]
    assert abs(np.median(scan["u"][ok]) - 20.0) < 8.0
    assert abs(np.median(scan["v"][ok]) + 14.0) < 8.0


def test_scan_throughput_counts_all_events():
    d = synthetic_events(8000, duration_s=0.2, res_x=24, res_y=32, seed=9)
    out = compensate_recording_scan(d["x"], d["y"], d["t_ns"], small_cfg())
    assert out["stats"]["n_events"] == len(d["x"])
    assert out["stats"]["events_per_s"] > 0
