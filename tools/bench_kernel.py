#!/usr/bin/env python
"""Microbenchmark the fused warp+splat Pallas kernel in isolation.

Separates the kernel's cost structure by timing a jitted fori_loop of K
back-to-back fused_warp_splat calls (the relay's ~26 ms dispatch cost is
paid once per program, so the K2-K1 delta cancels it) at several chunk
counts:

    time(n_chunks, K) ~= fixed_dispatch + K * (finish + n_chunks * per_chunk)

Events come from the bench's clustered-scene generator through the REAL
band-padded materialization (runtime/scan_pipeline.materialize_slices), so
chunks are spatially local and the windowed splat path is exercised the way
the production scan exercises it.  The warp applied per iteration is a
fixed small model (~0.05 n-units), matching converged-slice magnitudes.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernel.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from better_flow_tpu.config import PipelineConfig
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.models.global_flow import static_image_shape
from better_flow_tpu.ops.pallas.fused_model import (
    CHUNK,
    fused_warp_splat,
    pack_act,
    prepare_chunk_layouts,
)
from better_flow_tpu.runtime.scan_pipeline import SlicePlan, materialize_slices


def make_slice(n_events: int, cfg: PipelineConfig, seed: int = 42):
    """One band-padded, spatially sorted slice slab of clustered-scene
    events, via the production materialization."""
    d = synthetic_events(
        n_events * 2, duration_s=0.2,
        res_x=cfg.sensor.res_x, res_y=cfg.sensor.res_y,
        vx=60.0, vy=-40.0, rot=0.12, div=0.05, n_points=800, seed=seed,
    )
    n = min(n_events, len(d["x"]))
    x = d["x"][:n].astype(np.float32)
    y = d["y"][:n].astype(np.float32)
    t = d["t_ns"][:n].astype(np.int64)
    plan = SlicePlan(
        starts=np.array([0]), ends=np.array([n - 1]),
        slice_start_ns=np.array([0]),
    )
    xs, ys, ts, idx, _ = materialize_slices(
        x, y, t, plan, cap=n, band_pad=True, res_x=cfg.sensor.res_x
    )
    return xs[0], ys[0], ts[0], (idx[0] >= 0)


def bench_probes(n_events: int, iters: int, cfg: PipelineConfig, reps: int = 3):
    """Dissect the per-iteration fixed cost: splat-only kernel loop (no
    finish phase), pure scalar-glue loop (no pallas), and a minimal
    pallas-launch loop."""
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from better_flow_tpu.core.model import MotionModel
    from better_flow_tpu.ops.reductions import model_from_partials

    scale = cfg.optimizer.scale
    H, W = static_image_shape(scale, cfg.sensor)
    x, y, t, valid = make_slice(n_events, cfg)
    stat = prepare_chunk_layouts(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t))
    act = pack_act(jnp.asarray(valid, jnp.float32))

    x_sh = jnp.float32(scale // 2)
    y_sh = jnp.float32(scale // 2)
    w_dyn = jnp.float32((cfg.sensor.res_x - 1) * scale)
    h_dyn = jnp.float32((cfg.sensor.res_y - 1) * scale)

    @jax.jit
    def run_splat_only(stat, act, k):
        def body(i, carry):
            pr, acc = carry
            npr, p = fused_warp_splat(
                stat, act, pr, scale, x_sh, y_sh, w_dyn, h_dyn,
                jnp.float32(0.05), jnp.float32(-0.03),
                jnp.float32(90.0), jnp.float32(120.0),
                jnp.float32(1e-4), jnp.float32(1e-4), H, W,
                _probe_skip_finish=True,
            )
            return npr, acc + p["cnt"]

        _, acc = lax.fori_loop(0, k, body, (stat[:, 0:2], jnp.float32(0)))
        return acc

    @jax.jit
    def run_glue(k):
        # the scalar chain of one optimizer iteration, no pallas
        m0 = MotionModel.zero()

        def body(i, carry):
            m, v = carry
            p = {"cnt": v + 100, "s_row": v * 2, "s_col": v * 3,
                 "s_gx": v - 1, "s_gy": v + 1, "s_rg": v, "s_dg": v * 0.5}
            cx, cy, terms = model_from_partials(p)
            m = m._replace(cx=cx, cy=cy, dx=terms.dx, dy=terms.dy,
                           rot=terms.rot, div=terms.div, cnt=terms.cnt)
            m = m.update_accumulators(
                jnp.float32(1e4), jnp.float32(1e4), jnp.float32(1), jnp.float32(1))
            return m, v + jnp.cos(m.total_rot) + jnp.sin(m.total_div)

        m, v = lax.fori_loop(0, k, body, (m0, jnp.float32(1.0)))
        return v + m.total_dx

    def tiny_kernel(s_ref, o_ref):
        o_ref[0, 0] = s_ref[0, 0] + 1.0

    tiny = pl.pallas_call(
        tiny_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )

    @jax.jit
    def run_launch(k):
        def body(i, s):
            return tiny(s)

        return lax.fori_loop(0, k, body, jnp.zeros((1, 8), jnp.float32))

    for name, fn, args in (
        ("splat-only", run_splat_only, (stat, act)),
        ("scalar-glue", run_glue, ()),
        ("pallas-launch", run_launch, ()),
    ):
        lo, hi = 32, 96
        float(jnp.sum(fn(*args, jnp.int32(lo))))
        float(jnp.sum(fn(*args, jnp.int32(hi))))
        ts = {}
        for k in (lo, hi):
            t0 = time.perf_counter()
            for _ in range(reps):
                float(jnp.sum(fn(*args, jnp.int32(k))))
            ts[k] = (time.perf_counter() - t0) / reps
        d = (ts[hi] - ts[lo]) / (hi - lo)
        print(f"probe {name:14s} marginal per-iter = {d * 1e6:7.1f} us",
              flush=True)


def bench(n_events: int, iters: int, cfg: PipelineConfig, reps: int = 3):
    scale = cfg.optimizer.scale
    H, W = static_image_shape(scale, cfg.sensor)
    x, y, t, valid = make_slice(n_events, cfg)
    stat = prepare_chunk_layouts(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t))
    act = pack_act(jnp.asarray(valid, jnp.float32))
    n_chunks = stat.shape[0]

    x_sh = jnp.float32(scale // 2)
    y_sh = jnp.float32(scale // 2)
    w_dyn = jnp.float32((cfg.sensor.res_x - 1) * scale)
    h_dyn = jnp.float32((cfg.sensor.res_y - 1) * scale)

    @jax.jit
    def run(stat, act, k):
        def body(i, carry):
            pr, acc = carry
            npr, p = fused_warp_splat(
                stat, act, pr, scale, x_sh, y_sh, w_dyn, h_dyn,
                jnp.float32(0.05), jnp.float32(-0.03),
                jnp.float32(90.0), jnp.float32(120.0),
                jnp.float32(1e-4), jnp.float32(1e-4), H, W,
            )
            return npr, acc + p["cnt"] + p["s_gx"]

        pr0 = stat[:, 0:2]
        _, acc = lax.fori_loop(0, k, body, (pr0, jnp.float32(0)))
        return acc

    @jax.jit
    def diag(stat, act):
        _, p = fused_warp_splat(
            stat, act, stat[:, 0:2], scale, x_sh, y_sh, w_dyn, h_dyn,
            jnp.float32(0.05), jnp.float32(-0.03),
            jnp.float32(90.0), jnp.float32(120.0),
            jnp.float32(1e-4), jnp.float32(1e-4), H, W,
        )
        return p["fallback_chunks"]

    fb = float(diag(stat, act))
    float(run(stat, act, iters))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(stat, act, iters))
    dt = (time.perf_counter() - t0) / reps
    return n_chunks, dt, fb


def main():
    cfg = PipelineConfig()
    print(f"backend={jax.default_backend()} CHUNK={CHUNK}")
    results = {}
    for n_events in (8 * CHUNK, 26 * CHUNK):
        for iters in (32, 96):
            n_chunks, dt, fb = bench(n_events, iters, cfg)
            results[(n_chunks, iters)] = dt
            print(f"n_chunks={n_chunks:3d} iters={iters:3d}  "
                  f"total={dt * 1e3:8.2f} ms  per-iter={dt / iters * 1e6:7.1f} us"
                  f"  fallback={fb:.0f}/{n_chunks}",
                  flush=True)

    per_iter = {}
    for n in sorted({k[0] for k in results}):
        its = sorted({k[1] for k in results if k[0] == n})
        d = (results[(n, its[-1])] - results[(n, its[0])]) / (its[-1] - its[0])
        per_iter[n] = d
        print(f"n_chunks={n:3d}  marginal per-iter = {d * 1e6:7.1f} us")
    ns = sorted(per_iter)
    if len(ns) >= 2:
        n1, n2 = ns[0], ns[-1]
        per_chunk = (per_iter[n2] - per_iter[n1]) / (n2 - n1)
        finish = per_iter[n1] - n1 * per_chunk
        print(f"per-chunk = {per_chunk * 1e6:.2f} us   "
              f"finish+fixed per-iter = {finish * 1e6:.1f} us")


if __name__ == "__main__":
    main()
