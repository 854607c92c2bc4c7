"""Accuracy gates for the fast step-size schedule (OptimizerConfig.schedule
== "fast"): same gradient signal and tolerances as the reference divider
schedule, secant-sized steps.  bench.py measures with this schedule, so the
gates here are what make that headline number honest — the fast schedule
must land on the same converged warp, in no more iterations."""

import numpy as np

from better_flow_tpu.config import (
    OptimizerConfig,
    PipelineConfig,
    SensorConfig,
    SliceConfig,
)
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.runtime.scan_pipeline import compensate_recording_scan


def _cfg(sched, **opt):
    return PipelineConfig(
        sensor=SensorConfig(24, 32),
        slice=SliceConfig(max_events=4000, span_ns=int(0.1e9),
                          refresh_events=1500, refresh_time_ns=int(0.04e9)),
        optimizer=OptimizerConfig(scale=3, min_events=500, schedule=sched,
                                  **opt),
    )


def test_fast_matches_reference_production_sensor():
    """The regime bench.py measures: full 180x240 sensor, production slice
    geometry.  Here the gradient signal is clean and the secant must land
    on the same converged warp in materially fewer iterations."""
    d = synthetic_events(200_000, duration_s=0.2, res_x=180, res_y=240,
                         vx=60.0, vy=-40.0, rot=0.12, div=0.05,
                         n_points=800, seed=42)  # 1 Mev/s: bench density
    cfg_ref = PipelineConfig(optimizer=OptimizerConfig(schedule="reference"))
    cfg_fast = PipelineConfig(optimizer=OptimizerConfig.fast())  # bench cfg
    ref = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg_ref)
    fast = compensate_recording_scan(d["x"], d["y"], d["t_ns"], cfg_fast)
    ok = ~(ref["noise"] | fast["noise"])
    speed = float(np.hypot(ref["u"][ok], ref["v"][ok]).mean())
    du = np.abs(fast["u"][ok] - ref["u"][ok])
    dv = np.abs(fast["v"][ok] - ref["v"][ok])
    # Same converged warp: sub-percent flow deviation...
    assert np.median(du) < 0.01 * speed, (np.median(du), speed)
    assert np.median(dv) < 0.01 * speed
    # ...at no accuracy cost vs ground truth...
    def aee_med(out):
        m = ~out["noise"]
        return float(np.median(
            np.hypot(out["u"][m] - d["u"][m], out["v"][m] - d["v"][m])))
    assert aee_med(fast) <= 1.02 * aee_med(ref), (aee_med(fast), aee_med(ref))
    # ...in materially fewer iterations.
    assert fast["iters"].sum() <= 0.7 * ref["iters"].sum(), (
        int(fast["iters"].sum()), int(ref["iters"].sum()))


def test_fast_small_sensor_quality_bounded():
    """On tiny windows the gradients are noisy and the secant falls back to
    the reference step most of the time — no speedup to claim, but accuracy
    vs ground truth must stay within a small factor of the reference
    schedule and iterations must not blow up."""
    d = synthetic_events(24000, duration_s=0.4, res_x=24, res_y=32,
                         n_points=80, seed=5, vx=4.0, vy=-3.0, rot=0.5,
                         div=0.15)
    ref = compensate_recording_scan(d["x"], d["y"], d["t_ns"], _cfg("reference"))
    fast = compensate_recording_scan(d["x"], d["y"], d["t_ns"], _cfg("fast"))

    def aee(out):
        ok = ~out["noise"]
        return float(np.median(
            np.hypot(out["u"][ok] - d["u"][ok], out["v"][ok] - d["v"][ok])
        ))

    assert aee(fast) <= 1.2 * aee(ref), (aee(fast), aee(ref))
    assert fast["iters"].sum() <= 1.1 * ref["iters"].sum()


def test_fast_degenerate_and_gates_identical():
    """The window/count gates and noise marking are schedule-independent."""
    rng = np.random.default_rng(0)
    t = np.sort(rng.integers(0, int(3e8), 5000)).astype(np.int64)
    x = np.full(5000, 3.0)
    y = np.full(5000, 4.0)
    ref = compensate_recording_scan(x, y, t, _cfg("reference"))
    fast = compensate_recording_scan(x, y, t, _cfg("fast"))
    np.testing.assert_array_equal(ref["noise"], fast["noise"])
    assert fast["noise"].all()
