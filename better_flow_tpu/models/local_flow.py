"""Local 2-parameter flow: per-window sharpness ascent, vmapped into a
per-pixel flow field.

Reference: OptimizerLocal (optimizer_sampler.h/.cpp) — coordinate ascent on
the nonzero-mean sharpness of a windowed count image, with the step-halving
rule "if the score did not improve, halve and flip the step"
(optimizer_sampler.cpp:90-117).  The reference only ever runs one window at
a time; here the same optimizer is ``vmap``-ed over a grid of windows to
produce a dense local flow field (BASELINE.json config 3), coarse-to-fine
over ``scale``.

TPU design: each window owns a fixed gathered subset of K events (the C++
constructor also fixes the window's event subset at construction,
optimizer_sampler.h:31-35).  A window iteration projects its K events,
splats a small static (wsz*scale+scale)^2 count image (single-pixel scatter
+ box filter, like ops.time_image), Gaussian-blurs it with the same kernel
OpenCV uses, and scores it.  The data-dependent descent runs as
``lax.while_loop``; vmap batches the while loops across windows.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from better_flow_tpu.config import NZ, T_DIVIDER
from better_flow_tpu.ops.time_image import box_filter
from better_flow_tpu.ops.warp import apply_project, compute_uv


_CV_SMALL_GAUSS = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def gaussian_kernel_1d(ksize: int) -> np.ndarray:
    """OpenCV's getGaussianKernel(ksize, 0) — used by
    cv::GaussianBlur(img, (scale, scale), 0, 0) (optimizer_sampler.cpp:
    148-150).  OpenCV hardcodes the small kernels (ksize <= 7, sigma <= 0);
    larger ones use sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if ksize in _CV_SMALL_GAUSS:
        return _CV_SMALL_GAUSS[ksize].astype(np.float32)
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(xs**2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _gauss_blur(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Separable Gaussian blur with zero (border-replicate-free) padding.

    OpenCV uses BORDER_DEFAULT (reflect-101); window interiors dominate the
    sharpness score so zero padding is an accepted deviation, covered by the
    field-level tests rather than bit-parity ones.
    """
    if ksize <= 1:
        return img
    k = jnp.asarray(gaussian_kernel_1d(ksize))
    pad = ksize // 2
    img = jnp.pad(img, ((pad, pad), (0, 0)))
    img = jnp.convolve(img.ravel(), jnp.zeros(1), mode="same") if False else img
    # separable conv via correlation with lax.conv_general_dilated
    img4 = img[None, None, :, :]
    kr = k[None, None, :, None]
    img4 = lax.conv_general_dilated(img4, kr, (1, 1), "VALID")
    img2 = img4[0, 0]
    img2 = jnp.pad(img2, ((0, 0), (pad, pad)))
    img4 = img2[None, None, :, :]
    kc = k[None, None, None, :]
    img4 = lax.conv_general_dilated(img4, kc, (1, 1), "VALID")
    return img4[0, 0]


class LocalWindow(NamedTuple):
    """One window's fixed event subset (K gathered events + validity)."""

    x: jnp.ndarray       # f32[K] original pixels
    y: jnp.ndarray
    t: jnp.ndarray       # f32[K] slice-local ns
    valid: jnp.ndarray   # bool[K]
    cx: jnp.ndarray      # f32 window centre (original pixel coords)
    cy: jnp.ndarray


class LocalState(NamedTuple):
    nx: jnp.ndarray
    ny: jnp.ndarray
    dnx: jnp.ndarray
    dny: jnp.ndarray
    last_score: jnp.ndarray
    iters: jnp.ndarray


def _count_image(win: LocalWindow, nx, ny, scale: int, wsz: int):
    """OptimizerLocal::iteration_step (optimizer_sampler.cpp:120-153):
    project all window events and the centre with (nx, ny), splat a
    saturating count image shifted so the warped centre stays centred,
    Gaussian blur."""
    prx, pry = apply_project(win.x, win.y, win.t, nx, ny)
    ccx, ccy = apply_project(win.cx, win.cy, jnp.float32(0.0), nx, ny)
    wsx = wsz * scale
    wsy = wsz * scale
    H = wsx + scale
    W = wsy + scale
    x_sh = -ccx * scale + wsx / 2.0
    y_sh = -ccy * scale + wsy / 2.0
    fx = prx * scale + x_sh
    fy = pry * scale + y_sh
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    ok = win.valid & (ix >= 0) & (ix < wsx) & (iy >= 0) & (iy < wsy)
    half = scale // 2
    lin = jnp.where(ok, (ix + half) * W + (iy + half), H * W)
    flat = jnp.zeros((H * W,), jnp.float32).at[lin].add(1.0, mode="drop")
    cnt = jnp.minimum(box_filter(flat.reshape(H, W), scale), 255.0)
    return jnp.floor(_gauss_blur(cnt, scale if scale > 1 else 0) + 0.5)


def _score(img: jnp.ndarray) -> jnp.ndarray:
    """nonzero mean (optimizer_sampler.cpp:192-204)."""
    mask = img != 0
    n = jnp.sum(mask)
    return jnp.where(n == 0, 0.0, jnp.sum(jnp.where(mask, img, 0.0)) / jnp.maximum(n, 1))


def local_flow_window(
    win: LocalWindow,
    scale: int,
    wsz: int,
    max_time_ms: int = 100,
    max_iters: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the 2-param descent for one window; returns (nx, ny, iters).

    Transcribes OptimizerLocal::run (optimizer_sampler.cpp:4-38):
    dn threshold = NZ*T_DIVIDER*1000 / (10*scale*FROM_MS(MAX_TIME_MS)),
    initial steps 0.01, alternating nx/ny updates with halve-and-flip.
    """
    dn_th = (NZ * T_DIVIDER * 1000.0) / (10.0 * scale * (1e6 * max_time_ms))

    def score_at(nx, ny):
        return _score(_count_image(win, nx, ny, scale, wsz))

    init = LocalState(
        nx=jnp.float32(0), ny=jnp.float32(0),
        dnx=jnp.float32(0.01), dny=jnp.float32(0.01),
        last_score=score_at(jnp.float32(0), jnp.float32(0)),
        iters=jnp.int32(0),
    )

    def cond(s: LocalState):
        return (jnp.hypot(s.dnx, s.dny) > dn_th) & (s.iters < max_iters)

    def body(s: LocalState):
        # compute_new_nx (optimizer_sampler.cpp:90-102)
        nx_new = s.nx + s.dnx
        sc = score_at(nx_new, s.ny)
        dnx = jnp.where(sc - s.last_score <= 0, -s.dnx / 2.0, s.dnx)
        last = sc
        # compute_new_ny (:105-117)
        ny_new = s.ny + s.dny
        sc2 = score_at(nx_new, ny_new)
        dny = jnp.where(sc2 - last <= 0, -s.dny / 2.0, s.dny)
        return LocalState(nx=nx_new, ny=ny_new, dnx=dnx, dny=dny,
                          last_score=sc2, iters=s.iters + 1)

    out = lax.while_loop(cond, body, init)
    return out.nx, out.ny, out.iters


def gather_windows(
    x, y, t, valid, centers_x, centers_y, wsz: int, k: int
) -> LocalWindow:
    """Fix each window's event subset: the first K events within the wsz
    window around each centre (original positions, like the C++ window
    constructor).  Pure jnp; [G] centers -> LocalWindow with [G, K] fields."""
    x = jnp.asarray(x); y = jnp.asarray(y); t = jnp.asarray(t)
    valid = jnp.asarray(valid)

    def one(cx, cy):
        inside = (
            valid
            & (jnp.abs(x - cx) <= wsz / 2)
            & (jnp.abs(y - cy) <= wsz / 2)
        )
        # stable top-K: indices of first K inside-events
        order = jnp.argsort(~inside, stable=True)[:k]
        sel = inside[order]
        return LocalWindow(
            x=x[order], y=y[order], t=t[order], valid=sel,
            cx=jnp.float32(cx), cy=jnp.float32(cy),
        )

    return jax.vmap(one)(jnp.asarray(centers_x, jnp.float32),
                         jnp.asarray(centers_y, jnp.float32))


@partial(jax.jit, static_argnames=("scale", "wsz", "min_events"))
def local_flow_field(
    windows: LocalWindow, scale: int, wsz: int, min_events: int = 30
):
    """vmapped per-window descent -> (u, v, n_events, iters) per window.

    Windows with fewer than ``min_events`` events keep zero flow (the
    reference's window-size gate analogue, optimizer_sampler.cpp:9-13).
    """
    nx, ny, iters = jax.vmap(
        lambda w: local_flow_window(w, scale, wsz)
    )(windows)
    n_ev = jnp.sum(windows.valid, axis=1)
    ok = n_ev >= min_events
    u, v = compute_uv(jnp.where(ok, nx, 0.0), jnp.where(ok, ny, 0.0))
    return u, v, n_ev, jnp.where(ok, iters, 0)


def flow_field_grid(
    x, y, t_ns, res_x: int, res_y: int,
    step: int = 16, wsz: int = 31, scales=(3,), k: int = 1024,
) -> dict:
    """Dense local flow on a regular grid, coarse-to-fine over ``scales``.

    Returns grid centres and per-window flow (px/s).  Event inputs are the
    raw recording slice (x, y, slice-local t in ns).
    """
    centers_x, centers_y = np.meshgrid(
        np.arange(wsz // 2, res_x - wsz // 2, step),
        np.arange(wsz // 2, res_y - wsz // 2, step),
        indexing="ij",
    )
    cx = centers_x.ravel().astype(np.float32)
    cy = centers_y.ravel().astype(np.float32)
    valid = np.ones(len(x), bool)
    wins = gather_windows(
        np.asarray(x, np.float32), np.asarray(y, np.float32),
        np.asarray(t_ns, np.float32), valid, cx, cy, wsz, k,
    )
    out = {}
    for scale in scales:
        u, v, n_ev, iters = local_flow_field(wins, scale, wsz)
        out = {
            "grid_x": centers_x, "grid_y": centers_y,
            "u": np.asarray(u).reshape(centers_x.shape),
            "v": np.asarray(v).reshape(centers_x.shape),
            "n_events": np.asarray(n_ev).reshape(centers_x.shape),
            "iters": np.asarray(iters).reshape(centers_x.shape),
            "scale": scale,
        }
    return out
