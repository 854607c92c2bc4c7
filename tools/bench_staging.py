#!/usr/bin/env python
"""Decompose cold-path staging (plan_s) at the bench protocol.

Phases timed separately on the same recording bench.py uses:
  plan        trigger-plan arithmetic (numpy searchsorted loop)
  coords_u16  native one-pass coordinate narrowing
  sort        native threaded counting sort (all batches, no device_put)
  put         jax.device_put of the slabs + block_until_ready
  total       prepare_recording end to end (sort/put pipelined)
  run         steady-state scan (prepared reused)

Prints one JSON line.  The transfer number is TUNNEL-DOMINATED on the
axon relay (0.03-1.5 GB/s across sessions) — compare phases within one
session only.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bf_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np


def main():
    import jax

    from better_flow_tpu.config import OptimizerConfig, PipelineConfig
    from better_flow_tpu.io import native as _native
    from better_flow_tpu.io.synthetic import synthetic_events
    from better_flow_tpu.ops.pallas.fused_model import CHUNK
    from better_flow_tpu.runtime.scan_pipeline import (
        compensate_recording_scan,
        plan_slices,
        prepare_recording,
    )

    n_events = int(float(sys.argv[1])) if len(sys.argv) > 1 else 12_000_000
    cfg = PipelineConfig(optimizer=OptimizerConfig.fast())
    seg_events = min(n_events, 500_000)
    seg_dur = seg_events / 1_000_000
    n_segments = max(1, round(n_events / seg_events))
    base = synthetic_events(seg_events, duration_s=seg_dur, res_x=180,
                            res_y=240, vx=60.0, vy=-40.0, rot=0.12,
                            div=0.05, n_points=800, seed=42)
    step_ns = int(seg_dur * 1e9)
    x = np.tile(base["x"], n_segments)
    y = np.tile(base["y"], n_segments)
    t_ns = np.concatenate(
        [base["t_ns"] + k * step_ns for k in range(n_segments)])
    t_ns = np.ascontiguousarray(t_ns, np.int64)

    out = {"n_events": len(x)}
    t0 = time.perf_counter()
    plan = plan_slices(t_ns, cfg)
    out["plan_s"] = round(time.perf_counter() - t0, 4)

    t0 = time.perf_counter()
    x16y16 = _native.coords_u16(x, y)
    out["coords_s"] = round(time.perf_counter() - t0, 4)

    from better_flow_tpu.runtime.scan_pipeline import BAND_ROWS
    band_rows = BAND_ROWS  # the production sort-band layout, not a copy
    n_bands = (cfg.sensor.res_x + band_rows - 1) // band_rows
    cap = cfg.slice.max_events
    capp = -(-(cap + n_bands * (CHUNK - 1)) // CHUNK) * CHUNK
    t0 = time.perf_counter()
    sort_out = _native.materialize_bandpad_u16(
        x16y16[0], x16y16[1], t_ns, plan.starts, plan.ends,
        plan.slice_start_ns, capp, band_rows, CHUNK, n_bands,
        cfg.sensor.res_y)
    out["sort_s"] = round(time.perf_counter() - t0, 4)
    S = len(plan.ends)
    slab_mb = sum(a.nbytes for a in sort_out[:4]) / 1e6
    out["slab_mb"] = round(slab_mb, 1)

    t0 = time.perf_counter()
    devs = [jax.device_put(a) for a in sort_out[:4]]
    jax.block_until_ready(devs)
    out["put_s"] = round(time.perf_counter() - t0, 4)
    out["put_gbps"] = round(slab_mb / 1000 / max(out["put_s"], 1e-9), 3)
    del devs

    t0 = time.perf_counter()
    prepared = prepare_recording(x, y, t_ns, cfg)
    jax.block_until_ready([prepared[k] for k in
                           ("xs16", "ys16", "ts", "perm")
                           if k in prepared])
    out["prepare_total_s"] = round(time.perf_counter() - t0, 4)

    warm = compensate_recording_scan(None, None, None, cfg,
                                     prepared=prepared)
    run = compensate_recording_scan(None, None, None, cfg,
                                    prepared=prepared)
    out["run_s"] = round(run["stats"]["run_s"], 4)
    out["warm_run_s"] = round(warm["stats"]["run_s"], 4)
    out["n_slices"] = S
    out["cold_ev_s"] = round(len(x) / (out["prepare_total_s"] + out["run_s"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
