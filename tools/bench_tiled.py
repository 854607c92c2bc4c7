#!/usr/bin/env python
"""Tiled (config-5) pipeline cost on REAL hardware — round-5 VERDICT #4.

Runs compensate_recording_tiled at 720x1280 scale 1 on a 1x1 device mesh
on the live backend (halo machinery compiled for real — Mosaic/XLA, not
interpret), and the untiled compensate_recording_scan on the same
recording, reporting per-iteration and per-slice device cost for both.

A 1-device mesh exercises compile + compute cost, NOT collectives: the
halo ppermutes and the escape-lane all_gather are size-1-axis no-ops.
Measures BOTH tiled splat modes: "pallas" (windowed one-hot MXU splat +
in-kernel finish — the production path on hardware) and "xla" (scatter
splat + XLA image chain, kept as the interpret-free CPU path).  Round-5
history at this protocol: first measurement 16,059 us/iter (per-call
recompile, XLA) -> 4,455 (recompile fixed) -> 3,769 (pallas splat) ->
1,937 (escape lane cond-gated) -> 554 us/iter (pallas finish) — parity
with the untiled fused path at 1x1, so per-device image work now scales
~1/N on real tiles.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_tiled.py [n_events]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    from better_flow_tpu.config import (
        OptimizerConfig,
        PipelineConfig,
        SensorConfig,
        SliceConfig,
    )
    from better_flow_tpu.io.synthetic import synthetic_events
    from better_flow_tpu.parallel.spatial import compensate_recording_tiled
    from better_flow_tpu.runtime.scan_pipeline import (
        compensate_recording_scan,
        prepare_recording,
    )

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 600_000
    cfg = PipelineConfig(
        sensor=SensorConfig(720, 1280),
        slice=SliceConfig(max_events=60_000, span_ns=int(0.07e9),
                          refresh_events=25_000,
                          refresh_time_ns=int(0.03e9)),
        optimizer=OptimizerConfig(scale=1, max_iter=10, min_events=1000),
    )
    d = synthetic_events(n, duration_s=n / 1.5e6, res_x=720, res_y=1280,
                         vx=120.0, vy=-80.0, rot=0.1, div=0.03,
                         n_points=600, jitter_px=1.5, seed=4)

    # Untiled: prepared shared across warmup + measure.
    prep = prepare_recording(d["x"], d["y"], d["t_ns"], cfg)
    compensate_recording_scan(None, None, None, cfg, prepared=prep)
    out_u = compensate_recording_scan(None, None, None, cfg, prepared=prep)
    su = out_u["stats"]
    it_u = int(np.asarray(out_u["iters"]).sum())

    mesh = jax.make_mesh((1, 1), ("tile_x", "tile_y"),
                         devices=jax.devices()[:1])
    from better_flow_tpu.parallel.spatial import prepare_recording_tiled

    detail = {
        "n_events": int(n), "n_slices": int(su["n_slices"]),
        "untiled_run_s": round(su["run_s"], 4),
        "untiled_iters": it_u,
        "untiled_us_per_iter": round(su["run_s"] / max(it_u, 1) * 1e6, 1),
        "device": str(jax.devices()[0]),
    }
    rows = {}
    for mode in ("pallas", "xla"):
        import dataclasses

        cfg_m = cfg.replace(optimizer=dataclasses.replace(
            cfg.optimizer, scatter_mode=mode))
        prep_t = prepare_recording_tiled(d["x"], d["y"], d["t_ns"],
                                         cfg_m, 1, 1)
        compensate_recording_tiled(d["x"], d["y"], d["t_ns"], cfg_m, mesh,
                                   halo=32, esc_cap=32768, prepared=prep_t)
        out_t = compensate_recording_tiled(d["x"], d["y"], d["t_ns"],
                                           cfg_m, mesh, halo=32,
                                           esc_cap=32768, prepared=prep_t)
        # stats["run_s"] is the checksum-forced device scan time — the
        # apples-to-apples row vs the untiled stats (the call's wall
        # additionally pays ~0.7 s of [S, cap] u/v fetch + the numpy
        # first-wins accumulation, which the untiled path does device-side)
        run_t = out_t["stats"]["run_s"]
        it_t = int(np.asarray(out_t["iters"]).sum())
        ok = ~(out_u["noise"] | out_t["noise"])
        du = float(np.median(np.abs(out_t["u"][ok] - out_u["u"][ok]))) \
            if ok.any() else 0.0
        rows[mode] = round(run_t / max(it_t, 1) * 1e6, 1)
        detail.update({
            f"tiled_{mode}_run_s": round(run_t, 4),
            f"tiled_{mode}_iters": it_t,
            f"tiled_{mode}_us_per_iter": rows[mode],
            f"tiled_{mode}_escaped_dropped": int(
                out_t["stats"]["escaped_dropped"]),
            f"tiled_{mode}_flow_median_dev_vs_untiled": du,
        })

    print(json.dumps({
        "metric": "tiled_1x1_per_iter_us",
        "value": rows["pallas"],
        "unit": "us/iteration (720x1280 scale 1, 1x1 mesh, pallas splat)",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
