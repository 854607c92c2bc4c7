"""Windowed (block-local) Pallas kernel vs full-joint and jnp paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from better_flow_tpu.config import OptimizerConfig, SensorConfig
from better_flow_tpu.core.events import make_slice, EventSlice
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.models import global_flow as gf
from better_flow_tpu.ops.gradient import masked_scharr
from better_flow_tpu.ops.pallas.fused_model import (
    fused_model_partials_windowed,
    sort_key_blocks,
)
from better_flow_tpu.ops.reductions import model_compute_partial
from better_flow_tpu.ops.time_image import time_image

SMALL = SensorConfig(24, 32)


def _sorted_setup(scale=3, n=1500, warp_px=0.0, seed=1):
    d = synthetic_events(n, duration_s=0.1, res_x=24, res_y=32,
                         vx=18.0, vy=-12.0, n_points=60, seed=seed)
    ev = make_slice(d["x"], d["y"], d["t_ns"].astype(np.float64),
                    capacity=((n + 2047) // 2048) * 2048)
    order = jnp.argsort(sort_key_blocks(ev.x, ev.y, ev.valid))
    ev = EventSlice(*(jnp.take(f, order, axis=0) for f in ev))
    H, W = gf.static_image_shape(scale, SMALL)
    geom = gf.slice_geometry(ev, scale, SMALL)
    prx, pry = ev.x, ev.y
    if warp_px:
        prx = prx + warp_px * ev.t / float(ev.t.max())
        pry = pry - warp_px * ev.t / float(ev.t.max())
    return ev, geom, prx, pry, H, W


@pytest.mark.parametrize("warp_px", [0.0, 3.0, 60.0])
def test_windowed_matches_jnp(warp_px):
    """warp 60 px pushes events far outside any chunk window -> exercises
    the full-joint fallback path; results must stay exact."""
    ev, geom, prx, pry, H, W = _sorted_setup(warp_px=warp_px)
    img = time_image(prx, pry, ev.t, ev.active, 3,
                     geom.x_shift, geom.y_shift, geom.w_dyn, geom.h_dyn, H, W)
    gx, gy = masked_scharr(img)
    ref = model_compute_partial(img, gx, gy)
    with pltpu.force_tpu_interpret_mode():
        got = fused_model_partials_windowed(
            prx, pry, ev.t, ev.active, 3,
            geom.x_shift, geom.y_shift, geom.w_dyn, geom.h_dyn, H, W,
        )
    assert float(got["cnt"]) == float(ref["cnt"])
    for k in ("s_row", "s_col", "s_gx", "s_gy", "s_rg", "s_dg"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]),
                                   rtol=2e-5, atol=1e-3)


def test_process_slice_sorted_pallas_matches_xla():
    """End-to-end pallas mode (with the per-slice sort + unsort) reproduces
    the default path, including per-event output ORDER."""
    d = synthetic_events(1500, duration_s=0.1, res_x=24, res_y=32,
                         vx=18.0, vy=-12.0, n_points=60, seed=1)
    ev = make_slice(d["x"], d["y"], d["t_ns"].astype(np.float64), capacity=2048)
    with pltpu.force_tpu_interpret_mode():
        r_p = gf.process_slice(ev, MotionModel.zero(),
                               OptimizerConfig(scale=3, scatter_mode="pallas"),
                               SMALL)
    r_x = gf.process_slice(ev, MotionModel.zero(),
                           OptimizerConfig(scale=3), SMALL)
    assert int(r_p.iters) == int(r_x.iters)
    np.testing.assert_allclose(float(r_p.model.total_dx),
                               float(r_x.model.total_dx), rtol=1e-4, atol=1e-6)
    # exact per-event alignment after the inverse permutation
    np.testing.assert_allclose(np.asarray(r_p.pr_x), np.asarray(r_x.pr_x),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u),
                               rtol=1e-3, atol=1e-2)
