"""Fused Pallas kernel vs the composed jnp path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from better_flow_tpu.config import OptimizerConfig, SensorConfig
from better_flow_tpu.core.events import make_slice
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.io.synthetic import synthetic_events
from better_flow_tpu.models import global_flow as gf
from better_flow_tpu.ops.gradient import masked_scharr
from better_flow_tpu.ops.pallas.fused_model import fused_model_partials
from better_flow_tpu.ops.reductions import model_compute_partial, model_from_partials
from better_flow_tpu.ops.time_image import time_image

SMALL = SensorConfig(24, 32)


def _setup(scale=3, n=1500, seed=1, warp=0.0):
    d = synthetic_events(n, duration_s=0.1, res_x=24, res_y=32,
                         vx=18.0, vy=-12.0, n_points=60, seed=seed)
    ev = make_slice(d["x"], d["y"], d["t_ns"].astype(np.float64),
                    capacity=((n + 511) // 512) * 512)
    H, W = gf.static_image_shape(scale, SMALL)
    geom = gf.slice_geometry(ev, scale, SMALL)
    prx, pry = ev.x, ev.y
    if warp:
        prx = prx + warp * ev.t / 1e8
        pry = pry - warp * ev.t / 2e8
    return ev, geom, prx, pry, H, W


@pytest.mark.parametrize("scale", [1, 3])
@pytest.mark.parametrize("warp", [0.0, 3.0])
def test_fused_kernel_matches_jnp(scale, warp):
    ev, geom, prx, pry, H, W = _setup(scale=scale, warp=warp)
    img = time_image(prx, pry, ev.t, ev.active, scale,
                     geom.x_shift, geom.y_shift, geom.w_dyn, geom.h_dyn, H, W)
    gx, gy = masked_scharr(img)
    ref = model_compute_partial(img, gx, gy)
    with pltpu.force_tpu_interpret_mode():
        got = fused_model_partials(prx, pry, ev.t, ev.active, scale,
                                   geom.x_shift, geom.y_shift,
                                   geom.w_dyn, geom.h_dyn, H, W)
    assert float(got["cnt"]) == float(ref["cnt"])
    for k in ("s_row", "s_col", "s_gx", "s_gy", "s_rg", "s_dg"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]),
                                   rtol=1e-5, atol=1e-3)


def test_fused_kernel_model_terms():
    ev, geom, prx, pry, H, W = _setup()
    with pltpu.force_tpu_interpret_mode():
        p = fused_model_partials(prx, pry, ev.t, ev.active, 3,
                                 geom.x_shift, geom.y_shift,
                                 geom.w_dyn, geom.h_dyn, H, W)
    cx, cy, terms = model_from_partials(p)
    from better_flow_tpu.ops.reductions import center_of_mass, model_compute

    img = time_image(prx, pry, ev.t, ev.active, 3,
                     geom.x_shift, geom.y_shift, geom.w_dyn, geom.h_dyn, H, W)
    dcx, dcy, _ = center_of_mass(img)
    gx, gy = masked_scharr(img)
    direct = model_compute(img, gx, gy, dcx, dcy)
    np.testing.assert_allclose(float(cx), float(dcx), rtol=1e-6)
    np.testing.assert_allclose(float(terms.dx), float(direct.dx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(terms.rot), float(direct.rot), rtol=1e-3, atol=1e-6)


def test_process_slice_pallas_mode_matches_xla():
    """End-to-end: scatter_mode='pallas' reproduces the default optimizer."""
    d = synthetic_events(1500, duration_s=0.1, res_x=24, res_y=32,
                         vx=18.0, vy=-12.0, n_points=60, seed=1)
    ev = make_slice(d["x"], d["y"], d["t_ns"].astype(np.float64), capacity=1536)
    with pltpu.force_tpu_interpret_mode():
        r_p = gf.process_slice(ev, MotionModel.zero(),
                               OptimizerConfig(scale=3, scatter_mode="pallas"),
                               SMALL)
    r_x = gf.process_slice(ev, MotionModel.zero(),
                           OptimizerConfig(scale=3), SMALL)
    assert int(r_p.iters) == int(r_x.iters)
    np.testing.assert_allclose(float(r_p.model.total_dx),
                               float(r_x.model.total_dx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_p.u), np.asarray(r_x.u),
                               rtol=1e-3, atol=1e-2)
