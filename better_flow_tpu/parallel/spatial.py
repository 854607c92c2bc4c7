"""Spatially tiled slice processing: image tiles + halo exchange.

For megapixel sensors (BASELINE.json config 5) the image plane is sharded
over a 2-D mesh ('tile_x', 'tile_y').  Each device owns a tile of the
scaled image plus a halo ring, and the events whose *original* pixels fall
in its tile.  One optimizer iteration:

1. warp local events (the shared model is replicated, so the warp needs no
   communication);
2. scatter their single-pixel centres into the local (tile + 2*halo)^2
   accumulator — a warped event may land in the halo, i.e. in a
   neighbour's territory;
3. halo exchange, phase 1 (fold-in): two ``lax.ppermute`` phases (x then y,
   so corners ride through) ADD each device's halo strips into the
   neighbours that own those pixels — the deterministic reconciliation of
   cross-tile splats the north star mandates;
4. halo exchange, phase 2 (broadcast-back): completed edge strips of width
   1 + scale//2 are copied back into neighbours' halos so the local box
   filter + masked Scharr read exact values across tile seams; then the
   image-space ops run tile-locally;
5. partial model reductions over the owned tile only, combined with one
   ``psum`` over both mesh axes (ops.reductions.model_compute_partial);
6. every device updates the identical model and re-warps its events.

Approximation (documented): an event whose warped centre drifts beyond the
halo ring is masked out of the scatter for that iteration (it would land
deeper inside a neighbour's tile).  ``halo`` therefore bounds the supported
per-slice displacement; the event-parallel path (event_parallel.py) is the
exact fallback for large drifts — on realistic sensors a replicated image
psum is cheap, and tiling is a memory/bandwidth optimization.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from better_flow_tpu.config import NONZERO_EPS, OptimizerConfig, SensorConfig
from better_flow_tpu.core.model import MotionModel
from better_flow_tpu.ops.gradient import masked_scharr
from better_flow_tpu.ops.reductions import model_compute_partial, model_from_partials
from better_flow_tpu.ops.time_image import box_filter
from better_flow_tpu.ops.warp import compute_uv, project_4param_reinit

AX_X, AX_Y = "tile_x", "tile_y"


def _halo_exchange_add(img: jnp.ndarray, halo: int, axis: int, axis_name: str):
    """Add this device's halo strips into the neighbours along one axis.

    ``img`` is (T+2h, ...) along ``axis``.  The low strip [0:h] belongs to
    the left neighbour's high interior; the high strip [-h:] to the right
    neighbour's low interior.  After the exchange the local interior
    contains every contribution whose centre landed within h of the owned
    region.  Edge tiles wrap (the mesh is a torus for ppermute); wrapped
    contributions land in the off-sensor border of the neighbour and are
    zero by the scatter bounds check, so torus wrap is harmless.
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return img
    idx = lax.axis_index(axis_name)
    h = halo

    def take(sl):
        return lax.slice_in_dim(img, *sl, axis=axis)

    T = img.shape[axis] - 2 * h
    lo_strip = take((0, h))            # goes to left neighbour
    hi_strip = take((T + h, T + 2 * h))  # goes to right neighbour
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(hi_strip, axis_name, right)   # left nb's hi strip
    from_right = lax.ppermute(lo_strip, axis_name, left)   # right nb's lo strip
    # Torus wrap would deliver the opposite sensor edge to boundary tiles;
    # those global rows do not exist, so zero the wrapped strips.
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    # left neighbour's hi strip covers our interior rows [h, 2h);
    # right neighbour's lo strip covers [T, T+h).
    out = img
    interior_lo = lax.slice_in_dim(out, h, 2 * h, axis=axis) + from_left
    out = _set_slice(out, interior_lo, h, axis)
    interior_hi = lax.slice_in_dim(out, T, T + h, axis=axis) + from_right
    out = _set_slice(out, interior_hi, T, axis)
    return out


def _halo_broadcast(img: jnp.ndarray, halo: int, g: int, axis: int, axis_name: str):
    """After fold-in, copy each neighbour's *complete* edge interior (width
    ``g``) back into this device's halo so local stencils see correct
    values: my halo rows [h-g, h) get the left neighbour's rows
    [T+h-g, T+h); rows [T+h, T+h+g) get the right neighbour's [h, h+g).
    Sensor-boundary tiles keep zeros (there is nothing beyond the image).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        return img
    idx = lax.axis_index(axis_name)
    h = halo
    T = img.shape[axis] - 2 * h
    bottom = lax.slice_in_dim(img, T + h - g, T + h, axis=axis)  # my complete bottom
    top = lax.slice_in_dim(img, h, h + g, axis=axis)             # my complete top
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(bottom, axis_name, right)
    from_right = lax.ppermute(top, axis_name, left)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    out = _set_slice(img, from_left, h - g, axis)
    out = _set_slice(out, from_right, T + h, axis)
    return out


def _set_slice(arr, val, start, axis):
    idx = [0] * arr.ndim
    idx[axis] = start
    return lax.dynamic_update_slice(arr, val, tuple(idx))


class TiledSliceResult(NamedTuple):
    model: MotionModel
    pr_x: jnp.ndarray
    pr_y: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    iters: jnp.ndarray


def _tiled_iteration(
    state, x, y, t, active, model, dividers, scale: int,
    tile_h: int, tile_w: int, halo: int, img_h: int, img_w: int,
):
    """One optimizer iteration on a tiled image (see module docstring)."""
    pr_x, pr_y = state
    x_div, y_div, rot_div, div_div = dividers
    ti = lax.axis_index(AX_X)
    tj = lax.axis_index(AX_Y)
    # Global scaled-image offsets of this tile's owned region.
    row0 = ti * tile_h
    col0 = tj * tile_w
    H = tile_h + 2 * halo
    W = tile_w + 2 * halo

    # Scatter local events' centres into the padded local image.
    # Global geometry: full-sensor image, zero shift (megapixel mode uses
    # whole-sensor windows; the bbox-window refinement stays on the
    # single-image paths).
    half = scale // 2
    fx = pr_x * scale + half
    fy = pr_y * scale + half
    gx = fx.astype(jnp.int32)
    gy = fy.astype(jnp.int32)
    # Acceptance uses the TRUE scaled-sensor extent (res*scale), matching
    # the untiled path regardless of tile rounding.
    inb = active & (gx >= half) & (gx < img_h - half) & (gy >= half) & (gy < img_w - half)
    lx = gx - row0 + halo
    ly = gy - col0 + halo
    in_halo = (lx >= 0) & (lx < H) & (ly >= 0) & (ly < W)
    ok = inb & in_halo
    lin = jnp.where(ok, lx * W + ly, H * W)
    tsum = jnp.zeros((H * W,), jnp.float32).at[lin].add(t / 1e9, mode="drop")
    cnt = jnp.zeros((H * W,), jnp.float32).at[lin].add(1.0, mode="drop")
    tsum = tsum.reshape(H, W)
    cnt = cnt.reshape(H, W)

    # Reconcile cross-tile splats: exchange+add halos (x then y; corners
    # ride through because the y-phase exchanges already-merged x strips).
    tsum = _halo_exchange_add(tsum, halo, 0, AX_X)
    tsum = _halo_exchange_add(tsum, halo, 1, AX_Y)
    cnt = _halo_exchange_add(cnt, halo, 0, AX_X)
    cnt = _halo_exchange_add(cnt, halo, 1, AX_Y)

    # Broadcast completed edge strips back so the box filter and Scharr at
    # tile edges read correct neighbour values (width: 1 for the Scharr ring
    # + scale//2 for the box support).
    g = 1 + half
    tsum = _halo_broadcast(tsum, halo, g, 0, AX_X)
    tsum = _halo_broadcast(tsum, halo, g, 1, AX_Y)
    cnt = _halo_broadcast(cnt, halo, g, 0, AX_X)
    cnt = _halo_broadcast(cnt, halo, g, 1, AX_Y)

    tsum = box_filter(tsum, scale)
    cnt_f = box_filter(cnt, scale)
    img = jnp.where(cnt_f >= 1, tsum / jnp.maximum(cnt_f, 1), 0.0)

    # Local stencil; only the owned region feeds the reductions.
    gxg, gyg = masked_scharr(img)
    own = jnp.zeros((H, W), bool).at[halo : halo + tile_h, halo : halo + tile_w].set(True)
    img_own = jnp.where(own, img, 0.0)
    gx_own = jnp.where(own, gxg, 0.0)
    gy_own = jnp.where(own, gyg, 0.0)
    p = model_compute_partial(img_own, gx_own, gy_own)
    # Shift row/col-weighted partials into global coordinates:
    off_r = jnp.float32(row0 - halo)
    off_c = jnp.float32(col0 - halo)
    p = dict(p)
    p["s_rg"] = p["s_rg"] + off_r * p["s_gy"] - off_c * p["s_gx"]
    p["s_dg"] = p["s_dg"] + off_r * p["s_gx"] + off_c * p["s_gy"]
    p["s_row"] = p["s_row"] + off_r * p["cnt"]
    p["s_col"] = p["s_col"] + off_c * p["cnt"]
    p = jax.tree_util.tree_map(lambda v: lax.psum(v, (AX_X, AX_Y)), p)
    cx_img, cy_img, terms = model_from_partials(p)

    model = model._replace(
        cx=cx_img, cy=cy_img, dx=terms.dx, dy=terms.dy,
        rot=terms.rot, div=terms.div, cnt=terms.cnt,
    )
    model = model.update_accumulators(rot_div, div_div, x_div, y_div)
    cx_ev = (model.cx - half) / scale
    cy_ev = (model.cy - half) / scale
    pr_x, pr_y, nx, ny = project_4param_reinit(
        x, y, t, pr_x, pr_y,
        -model.total_dx, -model.total_dy, cx_ev, cy_ev,
        model.total_div, -model.total_rot,
    )
    model = model._replace(cx=cx_ev, cy=cy_ev)
    return (pr_x, pr_y), nx, ny, model


def process_slice_tiled(
    x, y, t, active, init_model: MotionModel, cfg: OptimizerConfig,
    sensor: SensorConfig, mesh: Mesh, halo: int = 32, n_iters: int = None,
) -> TiledSliceResult:
    """Run the 4-param optimizer with a tiled image over mesh
    ('tile_x', 'tile_y').  Event arrays are sharded over AX_X (pre-bucketed
    per tile by the caller via bucket_events); the model is replicated.

    Uses a fixed iteration count (``n_iters``, default cfg.max_iter or 10):
    the divider schedule runs identically on all devices, but a fixed count
    keeps the collective schedule static — appropriate for the low-latency
    megapixel regime (the reference's live preset also fixes max_iter=10,
    bf_visualizer.cpp:102-104).
    """
    iters = n_iters or (cfg.max_iter if cfg.max_iter > 0 else 10)
    scale = cfg.scale
    n_x = mesh.shape[AX_X]
    n_y = mesh.shape[AX_Y]
    img_h = sensor.res_x * scale + scale
    img_w = sensor.res_y * scale + scale
    tile_h = -(-img_h // n_x)
    tile_w = -(-img_w // n_y)
    # round tiles so halo fits
    tile_h = max(tile_h, halo)
    tile_w = max(tile_w, halo)

    def local_fn(x, y, t, active, model):
        pr_x, pr_y = x, y
        nx = jnp.zeros_like(x)
        ny = jnp.zeros_like(x)
        dividers = (
            jnp.float32(cfg.init_xy_divider), jnp.float32(cfg.init_xy_divider),
            jnp.float32(cfg.init_rotdiv_divider), jnp.float32(cfg.init_rotdiv_divider),
        )

        def body(carry, _):
            (pr, model, dividers, old) = carry
            pr2, nx, ny, model2 = _tiled_iteration(
                pr, x, y, t, active, model, dividers, scale, tile_h, tile_w,
                halo, img_h, img_w,
            )
            xd, yd, rd, dd = dividers
            odx, ody, orot, odiv = old
            dividers2 = (
                jnp.where(model2.dx * odx < 0, xd * 2, xd),
                jnp.where(model2.dy * ody < 0, yd * 2, yd),
                jnp.where(model2.rot * orot < 0, rd * 2, rd),
                jnp.where(model2.div * odiv < 0, dd * 2, dd),
            )
            old2 = (model2.dx, model2.dy, model2.rot, model2.div)
            return (pr2, model2, dividers2, old2), None

        init = ((pr_x, pr_y), model, dividers,
                (jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0)))
        (pr, model, _, _), _ = lax.scan(body, init, None, length=iters)
        # Recover n from the final warp: pr = fr - (n/nz)*t/1e4, so
        # n = (fr - pr) * nz * 1e4 / t (zero at t == 0).
        safe_t = jnp.where(t == 0, 1.0, t)
        nx = jnp.where(t == 0, 0.0, (x - pr[0]) * 127.0 * 1e4 / safe_t)
        ny = jnp.where(t == 0, 0.0, (y - pr[1]) * 127.0 * 1e4 / safe_t)
        u, v = compute_uv(nx, ny)
        return TiledSliceResult(
            model=model, pr_x=pr[0], pr_y=pr[1], u=u, v=v,
            iters=jnp.int32(iters),
        )

    model_spec = jax.tree_util.tree_map(lambda _: P(), init_model)
    out_spec = TiledSliceResult(
        model=model_spec, pr_x=P(AX_X), pr_y=P(AX_X),
        u=P(AX_X), v=P(AX_X), iters=P(),
    )
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AX_X), P(AX_X), P(AX_X), P(AX_X), model_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(x, y, t, active, init_model)


def bucket_events(x, y, t, res_x: int, scale: int, n_tiles_x: int, cap_per_tile: int):
    """Host-side bucketing of events by home tile row (AX_X sharding):
    returns [n_tiles_x * cap] arrays ordered tile-major with validity."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    t = np.asarray(t, np.float32)
    img_h = res_x * scale + scale
    tile_h = -(-img_h // n_tiles_x)
    home = np.minimum((x * scale).astype(np.int64) // tile_h, n_tiles_x - 1)
    xs = np.zeros(n_tiles_x * cap_per_tile, np.float32)
    ys = np.zeros_like(xs)
    ts = np.zeros_like(xs)
    ok = np.zeros(n_tiles_x * cap_per_tile, bool)
    for tile in range(n_tiles_x):
        sel = np.nonzero(home == tile)[0][:cap_per_tile]
        base = tile * cap_per_tile
        xs[base : base + len(sel)] = x[sel]
        ys[base : base + len(sel)] = y[sel]
        ts[base : base + len(sel)] = t[sel]
        ok[base : base + len(sel)] = True
    return xs, ys, ts, ok
