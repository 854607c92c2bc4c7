#!/usr/bin/env python
"""Device-trace profile of the scan pipeline — the round-4 perf workflow.

jax.profiler traces WORK through the axon relay (unlike sub-100 ms
wall-clock probes, which the relay's async completion makes unreliable).
This tool runs a short bench-shaped recording under jax.profiler.trace,
then prints the per-slice timeline the way round 4 used it to find the
split-megastep and packed-output wins: XLA-Ops rows around one slice,
plus a per-op aggregate.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_scan.py [n_events]

Reading the output (names from the current program structure):
  body.2 / body.3        one optimizer while-iteration's front (warp+splat)
                         and finish kernels
  branch_1_fun.12/.13    the unconditional first iteration's pair
  branch_1_fun.14        the warp_uv epilogue kernel
  cond.66-ish            the whole per-slice process_slice span
  dynamic_update_slice.* scan output stacking (mostly fixed cost per op —
                         why the per-event ys is ONE packed array)
"""

import collections
import glob
import gzip
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    from better_flow_tpu.config import OptimizerConfig, PipelineConfig
    from better_flow_tpu.io.synthetic import synthetic_events
    from better_flow_tpu.runtime.scan_pipeline import (
        compensate_recording_scan,
        prepare_recording,
    )

    n_events = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
    cfg = PipelineConfig(optimizer=OptimizerConfig.fast())
    d = synthetic_events(n_events, duration_s=n_events / 1e6, res_x=180,
                         res_y=240, vx=60.0, vy=-40.0, rot=0.12, div=0.05,
                         n_points=800, seed=42)
    prepared = prepare_recording(d["x"], d["y"], d["t_ns"], cfg)
    compensate_recording_scan(None, None, None, cfg, prepared=prepared)

    tdir = tempfile.mkdtemp(prefix="bf_trace_")
    with jax.profiler.trace(tdir):
        out = compensate_recording_scan(None, None, None, cfg,
                                        prepared=prepared)
    print(f"run_s {out['stats']['run_s']:.4f}  "
          f"slices {out['stats']['n_slices']}  "
          f"mean_iters {out['stats']['mean_iters']:.2f}")

    traces = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not traces:
        print("no trace emitted (profiler unsupported on this backend?)")
        return
    ev = json.load(gzip.open(traces[0]))
    events = ev["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev = [e for e in events if e.get("ph") == "X"
           and "TPU" in pids.get(e["pid"], "")
           and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    if not dev:
        print("no device XLA-Ops rows in the trace")
        return

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in dev:
        agg[e["name"][:44]] += e.get("dur", 0)
        cnt[e["name"][:44]] += 1
    print("\nper-op total (inclusive) device time:")
    for name, dur in agg.most_common(20):
        print(f"  {dur / 1e3:8.2f} ms x{cnt[name]:5d} "
              f"avg {dur / max(cnt[name], 1):7.1f} us  {name}")

    # One ~500 us window mid-run: the per-slice timeline.
    t0 = dev[len(dev) // 2]["ts"]
    win = sorted((e for e in dev if t0 <= e["ts"] <= t0 + 500),
                 key=lambda e: e["ts"])
    print("\ntimeline window (us offsets):")
    for e in win[:60]:
        print(f"  {e['ts'] - t0:7.1f} +{e.get('dur', 0):6.1f} "
              f"{e['name'][:44]}")
    print(f"\ntrace dir kept at {tdir} (tensorboard-compatible)")


if __name__ == "__main__":
    main()
