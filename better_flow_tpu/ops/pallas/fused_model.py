"""Fused Pallas TPU kernel: events -> model-update terms in one pass.

This is the hot path of the whole engine — the reference executes it as
four separate stages per optimizer iteration (scatter-add time image,
normalize, masked Scharr, four reductions; accel_lib.h:147-208, 513-615,
object_model.cpp:4-39), and the XLA composition of those stages spends most
of its time shuttling the ~400k-pixel image through HBM between ops.

Here one `pallas_call` keeps the image resident in VMEM end to end:

1. grid over event chunks: each chunk contributes its center-pixel splat via
   **one-hot matmuls on the MXU** — ``img += (onehot_rows * w) @ onehot_colsT^T`` — whose cost is independent of index collisions (XLA's
   scatter serializes colliding updates, which is exactly what converged,
   concentrated slices produce).  Counts are exact; the time weights use a
   3-way bf16 split (hi+lo+lo2) for ~f32 accuracy.
2. on the final grid step, still in VMEM: scale x scale box filter
   (the footprint factorization), count-normalize, all-nine masked Scharr,
   and the seven psum-combinable model partial sums
   (ops.reductions.model_compute_partial semantics) written to a (1, 8)
   output.

The centroid correction happens outside via model_from_partials, making the
same kernel usable per-tile under shard_map (partials are psum-combinable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from better_flow_tpu.config import NONZERO_EPS
from better_flow_tpu.config import NZ as _NZ
from better_flow_tpu.config import UV_FACTOR as _UV_FACTOR
from better_flow_tpu.config import WARP_TIME_DIV as _WARP_TIME_DIV

# Events per grid step.  Larger chunks amortize per-step overhead and give
# the MXU a deeper contraction (K=2048); swept 512/1024/2048 on v5e -> 2048
# fastest end to end (797k vs 644k events/s).
CHUNK = 2048


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interp() -> bool:
    """Resolve pallas interpretation at trace time: off-TPU backends run the
    kernels through the generic interpreter, which (unlike
    force_tpu_interpret_mode's callback path) composes with shard_map on the
    virtual CPU mesh without deadlocking — that is what lets the sharded
    pallas path be CI-tested on 8 virtual devices."""
    return jax.default_backend() != "tpu"


def _roll(a, shift: int, axis: int):
    """pltpu.roll with negative shifts (circular; wraps handled by the
    caller's validity masking)."""
    size = a.shape[axis]
    return pltpu.roll(a, shift % size, axis)


def _kernel(scal_ref, prx_r_ref, pry_r_ref, t_r_ref, act_r_ref, out_ref,
            acc_t, acc_c, *, scale: int, HP: int, WP: int, H: int, W: int):
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)
    half = scale // 2

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)

    # ---- per-chunk splat via one-hot matmuls -----------------------------
    x_sh = scal_ref[0, 0]
    y_sh = scal_ref[0, 1]
    wd = scal_ref[0, 2]
    hd = scal_ref[0, 3]

    def accept(prx, pry, act):
        fx = prx * jnp.float32(scale) + x_sh
        fy = pry * jnp.float32(scale) + y_sh
        ix = fx.astype(jnp.int32)   # trunc toward zero, like the C++ cast
        iy = fy.astype(jnp.int32)
        ok = (
            (act > 0)
            & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
            & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
        )
        return ix, iy, ok

    # All event data rides in ROW layout (1, CHUNK); the column one-hot is
    # built transposed (WP, CHUNK) and contracted with a transposed-rhs
    # dot_general (see _splat_window).
    prx_r = prx_r_ref[0]
    pry_r = pry_r_ref[0]
    t_sec = t_r_ref[0]
    act_r = act_r_ref[0]
    ix_r, iy_r, ok_r = accept(prx_r, pry_r, act_r)
    row = jnp.where(ok_r, ix_r, -1)                        # (1, CHUNK)
    colr = jnp.where(ok_r, iy_r, -1)                       # (1, CHUNK)

    # Chunk-relative time base: sum(t) = t0*cnt + sum(t - t0), with the
    # residual in two bf16 passes (hi + lo) for ~f32 absolute accuracy.
    # Padded/rejected events have row == -1, so their (possibly large)
    # residuals never reach the accumulators.
    t0 = t_sec[0, 0]
    tr = t_sec - t0
    w_hi = tr.astype(jnp.bfloat16)
    w_lo = (tr - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    _splat_window(acc_t, acc_c, row, colr, t0, w_hi, w_lo, 0, 0, HP, WP,
                  HP, WP)

    # ---- final step: box filter + normalize + Scharr + reductions --------
    @pl.when(pid == n_prog - 1)
    def _finish():
        _finish_phase(acc_t, acc_c, out_ref, scale, HP, WP, H, W)


def _finish_values(acc_t, acc_c, scale: int, HP: int, WP: int,
                   H: int, W: int, own=None):
    """Box filter + normalize + masked Scharr + the seven partial sums, as
    in-kernel VALUES (tuple of scalars) so callers can either write them to
    an SMEM output (_finish_phase) or feed the in-kernel model update
    (_kernel_megastep).

    ``own`` (optional static (r0, r1, c0, c1)) restricts the REDUCTIONS to
    an ownership window while the stencils still read the full image —
    the tiled path's owned-region partials, whose halo ring carries the
    neighbours' completed edge values (parallel/spatial)."""
    half = scale // 2
    if True:
        # (A column-stacked shared box filter halved the roll passes but
        # sent the Mosaic compile time through the roof — the (HP, 2*WP)
        # concatenate of two scratch refs took the remote compiler >14 min.
        # Separable per-image boxes compile in normal time.)
        def box(acc):
            a = acc[:, :]
            r = a
            for dr in range(1, half + 1):
                r = r + _roll(a, -dr, 0) + _roll(a, dr, 0)
            out = r
            for dc in range(1, half + 1):
                out = out + _roll(r, -dc, 1) + _roll(r, dc, 1)
            return out

        if scale > 1:
            t_box = box(acc_t)
            c_box = box(acc_c)
        else:
            t_box = acc_t[:, :]
            c_box = acc_c[:, :]

        img = jnp.where(c_box >= 1, t_box / jnp.maximum(c_box, 1.0), 0.0)

        # pltpu.roll is circular: padding rows/cols pick up wrapped garbage
        # from the box filter.  Masking the normalized image to the logical
        # region restores exact zero-padding semantics for the Scharr phase
        # (broadcast 1-D iotas; wraps INTO the valid region are zeros).
        rr_i = lax.broadcasted_iota(jnp.int32, (HP, 1), 0)
        cc_i = lax.broadcasted_iota(jnp.int32, (1, WP), 1)
        img = jnp.where((rr_i < H) & (cc_i < W), img, 0.0)

        eps = jnp.float32(NONZERO_EPS)
        # separable forms: Kx = [1,0,-1]_rows (x) [3,10,3]_cols,
        # Ky = [3,10,3]_rows (x) [1,0,-1]_cols; all-nine = rowAND o colAND.
        # boolean rolls are unsupported (Mosaic: 32-bit rotate only), so the
        # all-nine AND runs on 0/1 floats via multiplication
        nz = img > eps
        nzf = nz.astype(jnp.float32)
        col_and = nzf * _roll(nzf, -1, 1) * _roll(nzf, 1, 1)
        allnine = (col_and * _roll(col_and, -1, 0) * _roll(col_and, 1, 0)) > 0.5

        col_smooth = 3.0 * _roll(img, 1, 1) + 10.0 * img + 3.0 * _roll(img, -1, 1)
        gx = _roll(col_smooth, 1, 0) - _roll(col_smooth, -1, 0)
        row_smooth = 3.0 * _roll(img, 1, 0) + 10.0 * img + 3.0 * _roll(img, -1, 0)
        gy = _roll(row_smooth, 1, 1) - _roll(row_smooth, -1, 1)
        # The all-nine mask implies the center-nonzero mask (m), so the
        # masked gradients ARE the model reduction integrands: no extra
        # gx*m / gy*m passes (ObjectModel::compute sums gx over img > eps
        # pixels, and gx is zero unless all nine neighbors are nonzero).
        gxm = jnp.where(allnine, gx, 0.0)
        gym = jnp.where(allnine, gy, 0.0)

        # Every model sum derives from ROW and COLUMN partial sums of
        # (m, gxm, gym): 6 axis reductions instead of 9 full-array ones.
        m = nzf
        if own is not None:
            r0, r1, c0, c1 = own
            rr_o = lax.broadcasted_iota(jnp.int32, (HP, 1), 0)
            cc_o = lax.broadcasted_iota(jnp.int32, (1, WP), 1)
            own_m = ((rr_o >= r0) & (rr_o < r1)
                     & (cc_o >= c0) & (cc_o < c1)).astype(jnp.float32)
            m = m * own_m
            gxm = gxm * own_m
            gym = gym * own_m
        row_i = lax.broadcasted_iota(jnp.int32, (HP, 1), 0).astype(jnp.float32)
        col_i = lax.broadcasted_iota(jnp.int32, (1, WP), 1).astype(jnp.float32)
        rs_m = jnp.sum(m, 1, keepdims=True)      # (HP, 1)
        cs_m = jnp.sum(m, 0, keepdims=True)      # (1, WP)
        rs_gx = jnp.sum(gxm, 1, keepdims=True)
        cs_gx = jnp.sum(gxm, 0, keepdims=True)
        rs_gy = jnp.sum(gym, 1, keepdims=True)
        cs_gy = jnp.sum(gym, 0, keepdims=True)
        cnt = jnp.sum(rs_m)
        s_row = jnp.sum(rs_m * row_i)
        s_col = jnp.sum(cs_m * col_i)
        s_gx = jnp.sum(rs_gx)
        s_gy = jnp.sum(rs_gy)
        s_rg = jnp.sum(rs_gy * row_i) - jnp.sum(cs_gx * col_i)
        s_dg = jnp.sum(rs_gx * row_i) + jnp.sum(cs_gy * col_i)
        return cnt, s_row, s_col, s_gx, s_gy, s_rg, s_dg


def _finish_phase(acc_t, acc_c, out_ref, scale: int, HP: int, WP: int,
                  H: int, W: int):
    vals = _finish_values(acc_t, acc_c, scale, HP, WP, H, W)
    for j, v in enumerate(vals):
        out_ref[0, j] = v
    out_ref[0, 7] = jnp.float32(0)


@functools.partial(jax.jit, static_argnames=("scale", "H", "W"))
def fused_model_partials(
    pr_x, pr_y, t_ns, active, scale: int, x_sh, y_sh, w_dyn, h_dyn,
    H: int, W: int,
) -> dict:
    """Run the fused kernel; returns model_compute_partial-compatible sums.

    Events are padded to a CHUNK multiple (padding is inactive).  ``H, W``
    are the logical image dims (scale*res + scale); internally padded to
    TPU-friendly (8, 128) multiples with a guard ring for the stencils.
    """
    n = pr_x.shape[0]
    n_pad = _round_up(max(n, CHUNK), CHUNK)
    HP = _round_up(H + 8, 32)   # 32: int8 MXU tile rows
    WP = _round_up(W + 8, 128)

    def pad_row(a):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad - n)).reshape(
            n_pad // CHUNK, 1, CHUNK
        )

    prx_r = pad_row(pr_x)
    pry_r = pad_row(pr_y)
    t_r = pad_row(t_ns / jnp.float32(1e9))
    act_r = pad_row(active.astype(jnp.float32))

    scal = jnp.stack(
        [jnp.float32(x_sh), jnp.float32(y_sh),
         jnp.asarray(w_dyn, jnp.float32), jnp.asarray(h_dyn, jnp.float32),
         jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0)]
    ).reshape(1, 8)

    n_chunks = n_pad // CHUNK
    kern = functools.partial(_kernel, scale=scale, HP=HP, WP=WP, H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(scal, prx_r, pry_r, t_r, act_r)

    return {
        "cnt": out[0, 0],
        "s_row": out[0, 1],
        "s_col": out[0, 2],
        "s_gx": out[0, 3],
        "s_gy": out[0, 4],
        "s_rg": out[0, 5],
        "s_dg": out[0, 6],
    }


# --------------------------------------------------------------------------
# Fully fused iteration: 4-param re-warp + windowed splat + finish in ONE
# pallas_call.  The re-warp (Event::project_4param_reinit, event.h:99-110;
# dispatched per iteration in optimizer_rolling.h:340-344) previously ran as
# a separate XLA pass over all events, followed by 14 pad/reshape ops to
# build the kernel's dual-orientation inputs — all per optimizer iteration.
# Fusing the warp makes the (fr, t, active) layouts loop-INVARIANT (prepared
# once per slice); the while_loop body becomes one pallas_call whose carry is
# the warped positions in both orientations, plus scalar model math.
#
# The warp is iterative in pr (the rotation delta reads the previous
# projected position), so prev-pr rides the carry; the direction vector n is
# never needed mid-loop and is recomputed once at the end by a single XLA
# project_4param_reinit epilogue (models/global_flow._run_fused).


def _warp_chunk(frx, fry, t_ns, prx_p, pry_p,
                dnx_, dny_, cx, cy, divp, cosv, sinv):
    """In-kernel Event::project_4param_reinit — op order matches ops/warp.py
    exactly (f32 throughout) so results are identical to the XLA path."""
    rx = prx_p - cx
    ry = pry_p - cy
    rpx = cosv * rx - sinv * ry
    rpy = sinv * rx + cosv * ry
    nx = -rpx * divp + (rpx - rx) + dnx_
    ny = -rpy * divp + (rpy - ry) + dny_
    kx = nx / jnp.float32(_NZ)
    ky = ny / jnp.float32(_NZ)
    ts = t_ns / jnp.float32(_WARP_TIME_DIV)
    return frx - kx * ts, fry - ky * ts


def _kernel_warp_windowed(
    scal_ref, stat_ref, act_ref, pr_ref, npr_ref, out_ref,
    acc_t, acc_c, fb, *, scale: int, HP: int, WP: int, H: int, W: int,
    probe_skip_finish: bool = False,
):
    """Per chunk: unpack the (3, CHUNK) static block [fr_x, fr_y, t_ns]
    plus the (1, CHUNK) activity row (separate because noise flags change
    per slice while the static pack is built once per scan) and the
    (2, CHUNK) position carry [pr_x, pr_y]; warp; write the new positions;
    transpose the warped column indices to (CHUNK, 1) for the col one-hot
    (Mosaic supports the (1, C) -> (C, 1) transpose); splat."""
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)
    half = scale // 2

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)
        fb[0, 0] = jnp.float32(0)

    x_sh = scal_ref[0, 0]
    y_sh = scal_ref[0, 1]
    wd = scal_ref[0, 2]
    hd = scal_ref[0, 3]
    dnx_ = scal_ref[0, 4]
    dny_ = scal_ref[0, 5]
    cx = scal_ref[0, 6]
    cy = scal_ref[0, 7]
    divp = scal_ref[0, 8]
    cosv = scal_ref[0, 9]
    sinv = scal_ref[0, 10]

    stat = stat_ref[0]          # (3, CHUNK)
    frx = stat[0:1]
    fry = stat[1:2]
    t_ns = stat[2:3]
    act = act_ref[0]            # (1, CHUNK)
    prb = pr_ref[0]             # (2, CHUNK)

    prx, pry = _warp_chunk(
        frx, fry, t_ns, prb[0:1], prb[1:2],
        dnx_, dny_, cx, cy, divp, cosv, sinv,
    )
    npr_ref[0, 0:1] = prx
    npr_ref[0, 1:2] = pry

    fx = prx * jnp.float32(scale) + x_sh
    fy = pry * jnp.float32(scale) + y_sh
    ix = fx.astype(jnp.int32)   # trunc toward zero, like the C++ cast
    iy = fy.astype(jnp.int32)
    ok = (
        (act > 0)
        & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
        & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
    )
    row = jnp.where(ok, ix, -1)     # (1, CHUNK)
    colr = jnp.where(ok, iy, -1)    # (1, CHUNK) — row layout throughout

    t_sec = t_ns / jnp.float32(1e9)
    _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP, fb=fb)

    if probe_skip_finish:   # perf-dissection probe: splat grid only
        @pl.when(pid == n_prog - 1)
        def _finish_stub():
            for j in range(8):   # SMEM accepts scalar stores only
                out_ref[0, j] = jnp.float32(0)
    else:
        @pl.when(pid == n_prog - 1)
        def _finish():
            _finish_phase(acc_t, acc_c, out_ref, scale, HP, WP, H, W)
            out_ref[0, 7] = fb[0, 0]


def _kernel_warp_images(
    scal_ref, stat_ref, act_ref, pr_ref, npr_ref, acc_t, acc_c, fb_ref,
    *, scale: int, HP: int, WP: int,
):
    """Shard-local half of the fused iteration (the psum seam): identical
    warp + windowed splat to _kernel_warp_windowed, but the pre-filter
    (acc_t, acc_c) images are pallas OUTPUTS instead of feeding the finish
    phase in-kernel.  Under event-parallel shard_map the caller psums the
    images across shards BEFORE the nonlinear normalize/Scharr (the exact
    seam the XLA path uses: ops/time_image with axis_name), then runs
    _kernel_finish on the summed images.  The one-hot MXU splat — the reason
    the sharded path previously had to fall back to XLA's serializing
    scatter (gpu_impl.cl:24-53 lesson) — is preserved per shard."""
    pid = pl.program_id(0)
    half = scale // 2

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)
        fb_ref[0, 0] = jnp.float32(0)

    x_sh = scal_ref[0, 0]
    y_sh = scal_ref[0, 1]
    wd = scal_ref[0, 2]
    hd = scal_ref[0, 3]
    dnx_ = scal_ref[0, 4]
    dny_ = scal_ref[0, 5]
    cx = scal_ref[0, 6]
    cy = scal_ref[0, 7]
    divp = scal_ref[0, 8]
    cosv = scal_ref[0, 9]
    sinv = scal_ref[0, 10]

    stat = stat_ref[0]
    frx = stat[0:1]
    fry = stat[1:2]
    t_ns = stat[2:3]
    act = act_ref[0]
    prb = pr_ref[0]

    prx, pry = _warp_chunk(
        frx, fry, t_ns, prb[0:1], prb[1:2],
        dnx_, dny_, cx, cy, divp, cosv, sinv,
    )
    npr_ref[0, 0:1] = prx
    npr_ref[0, 1:2] = pry

    fx = prx * jnp.float32(scale) + x_sh
    fy = pry * jnp.float32(scale) + y_sh
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    ok = (
        (act > 0)
        & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
        & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
    )
    row = jnp.where(ok, ix, -1)
    colr = jnp.where(ok, iy, -1)

    t_sec = t_ns / jnp.float32(1e9)
    _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP, fb=fb_ref)


def padded_image_shape(H: int, W: int) -> Tuple[int, int]:
    """The kernel's padded accumulator geometry for logical dims (H, W)."""
    return _round_up(max(H + 8, RH), 32), _round_up(max(W + 8, WC), 128)


def fused_warp_splat_images(
    stat, act, pr, scale: int,
    x_sh, y_sh, w_dyn, h_dyn, dnx_, dny_, cx, cy, divp, crl,
    H: int, W: int,
):
    """Shard-local warp + splat producing the PRE-FILTER images.

    Returns (new_pr, acc_t, acc_c, fallback_chunks).  acc_t/acc_c are the
    (HP, WP) padded sum-of-time / count images BEFORE the box filter —
    linear in events, hence psum-combinable across an event-parallel mesh
    axis.  Complete the iteration with finish_partials on the summed images.
    """
    HP, WP = padded_image_shape(H, W)
    n_chunks = stat.shape[0]

    scal = jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in
         (x_sh, y_sh, w_dyn, h_dyn, dnx_, dny_, cx, cy, divp,
          jnp.cos(crl), jnp.sin(crl))]
        + [jnp.float32(0)] * 5
    ).reshape(1, 16)

    kern = functools.partial(_kernel_warp_images, scale=scale, HP=HP, WP=WP)
    npr, acc_t, acc_c, fb = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 2, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(scal, stat, act, pr)
    return npr, acc_t, acc_c, fb[0, 0]


def _kernel_finish(acc_t_ref, acc_c_ref, out_ref, *, scale: int, HP: int,
                   WP: int, H: int, W: int):
    _finish_phase(acc_t_ref, acc_c_ref, out_ref, scale, HP, WP, H, W)


def finish_partials(acc_t, acc_c, scale: int, H: int, W: int) -> dict:
    """Box filter + normalize + masked Scharr + the seven partial sums on a
    (psum'd) pre-filter image pair — the second half of the sharded fused
    iteration.  Runs replicated on every shard (identical inputs after the
    psum, so the model stays exactly replicated with no extra collective)."""
    HP, WP = acc_t.shape
    kern = functools.partial(_kernel_finish, scale=scale, HP=HP, WP=WP,
                             H=H, W=W)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(acc_t, acc_c)
    return {
        "cnt": out[0, 0],
        "s_row": out[0, 1],
        "s_col": out[0, 2],
        "s_gx": out[0, 3],
        "s_gy": out[0, 4],
        "s_rg": out[0, 5],
        "s_dg": out[0, 6],
    }


def prepare_chunk_layouts(x, y, t_ns):
    """Pack the loop-invariant event data into the fused kernel's chunked
    layout: (n_chunks, 3, CHUNK) with rows [fr_x, fr_y, t_ns].  Times stay
    in f32 nanoseconds (the warp's unit; the kernel derives seconds for
    the splat weights itself).  The activity row rides separately
    (pack_act) because it changes per slice."""
    n = x.shape[0]
    n_pad = _round_up(max(n, CHUNK), CHUNK)

    def pad(a):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad - n)).reshape(
            n_pad // CHUNK, 1, CHUNK
        )

    return jnp.concatenate([pad(x), pad(y), pad(t_ns)], axis=1)


def pack_act(active):
    """(n_chunks, 1, CHUNK) activity row for fused_warp_splat."""
    n = active.shape[0]
    n_pad = _round_up(max(n, CHUNK), CHUNK)
    return jnp.pad(active.astype(jnp.float32), (0, n_pad - n)).reshape(
        n_pad // CHUNK, 1, CHUNK
    )


def _kernel_act(hist_ref, sidx_ref, act_ref, *, K: int):
    """Per-chunk activity row from original indices + window-gate history:
    act = (sidx >= 0) & ~noise, where an event is noise iff any of the
    last K slices fired the window gate (ws) and its ORIGINAL index falls
    in that slice's [start, end] range (scan_pipeline._run_scan's noise
    reconstruction, optimizer_rolling.h:52-54)."""
    s = sidx_ref[0]                           # (1, CHUNK) i32
    ok = s >= 0
    for j in range(K):
        noise_j = (
            (hist_ref[0, j] > 0) & (s >= hist_ref[1, j])
            & (s <= hist_ref[2, j])
        )
        ok = ok & ~noise_j
    act_ref[0] = ok.astype(jnp.float32)


def act_rows_call(sidx, ws_h, st_h, en_h):
    """Activity rows (nch, 1, CHUNK) f32 for the fused kernels, built in
    ONE device pass.  Replaces the per-slice XLA chain (valid compare +
    hist_k range compares + bool->f32 pack, ~10 us of elementwise passes
    over the 61k slab per slice at bench shapes).  ``sidx`` is the
    (capp,) i32 original-index slab (capp a CHUNK multiple, -1 padding);
    ``ws_h``/``st_h``/``en_h`` the (K,) window-gate history."""
    capp = sidx.shape[0]
    nch = capp // CHUNK
    K = int(ws_h.shape[0])
    hist = jnp.stack([ws_h.astype(jnp.int32), st_h.astype(jnp.int32),
                      en_h.astype(jnp.int32)])
    kern = functools.partial(_kernel_act, K=K)
    return pl.pallas_call(
        kern,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((3, K), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, 1, CHUNK), jnp.float32),
        interpret=_interp(),
    )(hist, sidx.reshape(nch, 1, CHUNK))


def fused_warp_splat(
    stat, act, pr, scale: int,
    x_sh, y_sh, w_dyn, h_dyn, dnx_, dny_, cx, cy, divp, crl,
    H: int, W: int, _probe_skip_finish: bool = False,
):
    """One optimizer iteration's event phase: re-warp every event with the
    accumulated model (about event-coordinate centroid (cx, cy)) and splat
    the warped positions.  ``stat`` is prepare_chunk_layouts' static pack,
    ``act`` is pack_act's activity row; ``pr`` is the (n_chunks, 2, CHUNK)
    position carry.  Returns (new_pr, partials).  cos/sin of the rotation
    are taken on ``crl`` exactly as ops/warp._divcrl_dn does."""
    HP = _round_up(max(H + 8, RH), 32)   # 32: int8 MXU tile rows
    WP = _round_up(max(W + 8, WC), 128)
    n_chunks = stat.shape[0]

    scal = jnp.stack(
        [jnp.asarray(v, jnp.float32) for v in
         (x_sh, y_sh, w_dyn, h_dyn, dnx_, dny_, cx, cy, divp,
          jnp.cos(crl), jnp.sin(crl))]
        + [jnp.float32(0)] * 5
    ).reshape(1, 16)

    kern = functools.partial(_kernel_warp_windowed, scale=scale,
                             HP=HP, WP=WP, H=H, W=W,
                             probe_skip_finish=_probe_skip_finish)
    npr, out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 2, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(scal, stat, act, pr)
    partials = {
        "cnt": out[0, 0],
        "s_row": out[0, 1],
        "s_col": out[0, 2],
        "s_gx": out[0, 3],
        "s_gy": out[0, 4],
        "s_rg": out[0, 5],
        "s_dg": out[0, 6],
        "fallback_chunks": out[0, 7],
    }
    return npr, partials


# --------------------------------------------------------------------------
# Block-windowed variant: events pre-sorted by original (row-band, column)
# make each chunk spatially local, so its one-hot joint only spans an
# (RH x WC) window of the image instead of (HP x WP) — ~9x fewer MXU flops
# at the default geometry.  Chunks whose warped events escape the window
# (large accumulated warps) fall back to the full-height joint under
# @pl.when, preserving exactness for any motion.

RH = 128   # window rows (multiple of 8; must hold a 32-row band at scale 3
           # plus footprint and differential warp — spread beyond it takes
           # the exact full-joint fallback, so smaller is pure perf trade)
WC = 256   # window cols (multiple of 128)


def _splat_window(acc_t, acc_c, row, colr, t0, w_hi, w_lo, r_lo, c_lo,
                  rh: int, wc: int, HP: int, WP: int, lo: bool = True):
    """One chunk's one-hot contribution into acc[r_lo:+rh, c_lo:+wc]: three
    bf16 MXU passes (counts + hi/lo time weights).  The kernel is VPU-bound
    (one-hot construction), not MXU-bound, so the counts ride the SAME bf16
    one-hots as the time weights — still exact, since 0/1 products accumulate
    in f32 — rather than a separate int8 pair (saves two full-matrix casts).

    Both index vectors arrive in ROW layout (1, C): the column one-hot is
    built directly TRANSPOSED as (wc, C) and contracted with a transposed-rhs
    dot_general, which the MXU handles natively.  The earlier (C, 1) column
    layout forced 1-lane-wide vregs for the per-event column vector and a
    Mosaic (1, C) -> (C, 1) transpose per chunk — both pure overhead.  The
    window offsets fold into the small per-event index vectors, not the
    (rh, C)/(wc, C) iota matrices."""
    C = row.shape[1]
    rows_i = lax.broadcasted_iota(jnp.int32, (rh, C), 0)
    colsT_i = lax.broadcasted_iota(jnp.int32, (wc, C), 0)
    oh_r = (rows_i == row - r_lo).astype(jnp.bfloat16)   # rejected: row == -1
    oh_cT = (colsT_i == colr - c_lo).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    # One stacked (3*rh, C) x (wc, C)^T MXU pass instead of three separate
    # dots: identical products and f32 accumulation per output element
    # (each stacked row is exactly one of the original dots' rows), but a
    # single pipelined matmul — three small-M dots pay the MXU drain
    # latency three times per chunk.
    # ``lo=False`` (OptimizerConfig.splat_time_lo=False, fast schedule only)
    # drops the low-order time row: times quantize to bf16 (8-bit mantissa,
    # ~0.4 ms worst-case on a 0.2 s slice) and the stacked pass shrinks from
    # (3*rh, C) to (2*rh, C) — a third off the splat's MXU cost.  Gradients
    # integrate the quantization over many pixels; the converged warp is
    # quality-gated against the full-precision schedule in
    # tests/test_fast_schedule.py.  Parity mode always keeps the pair.
    if lo:
        lhs = jnp.concatenate([oh_r, oh_r * w_hi, oh_r * w_lo], axis=0)
    else:
        lhs = jnp.concatenate([oh_r, oh_r * w_hi], axis=0)
    out = lax.dot_general(lhs, oh_cT, dn,
                          preferred_element_type=jnp.float32)
    contrib_c = out[:rh]
    contrib_t = t0 * contrib_c + out[rh:2 * rh]
    if lo:
        contrib_t = contrib_t + out[2 * rh:]
    if rh == HP and wc == WP:
        acc_t[:, :] += contrib_t
        acc_c[:, :] += contrib_c
    else:
        acc_t[pl.ds(r_lo, rh), pl.ds(c_lo, wc)] += contrib_t
        acc_c[pl.ds(r_lo, rh), pl.ds(c_lo, wc)] += contrib_c


def _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP: int, WP: int,
                    fb=None, lo: bool = True):
    """Shared window-placement + splat: picks an aligned (RH, WC) window from
    the chunk's accepted extent, falls back to the full joint on escape, and
    skips entirely when the chunk has no accepted events (padding tails).

    ``row`` / ``colr`` are (1, C) scaled image indices with -1 for rejected
    events (both row layout — see _splat_window).  ``fb`` (optional (1, 1)
    SMEM scratch) counts chunks that took the full-joint fallback — the
    first-order cost driver."""
    big = jnp.int32(1 << 20)
    r_min = jnp.min(jnp.where(row >= 0, row, big))
    c_min = jnp.min(jnp.where(colr >= 0, colr, big))
    r_max = jnp.max(row)
    c_max = jnp.max(colr)
    r_lo = jnp.clip((r_min // 8) * 8, 0, HP - RH)
    c_lo = jnp.clip((c_min // 128) * 128, 0, WP - WC)
    r_lo = pl.multiple_of(r_lo, 8)
    c_lo = pl.multiple_of(c_lo, 128)
    nonempty = r_min < big
    row_fits = (r_max < r_lo + RH) & nonempty
    fits = row_fits & (c_max < c_lo + WC)
    # Mid-level fallback: pre-sorted chunks sit in one row band (band_pad
    # guarantees it; only the warp can push rows out), so a chunk that
    # escapes only in COLUMNS takes an (RH x full-width) window — 2.9x the
    # windowed MXU cost at default geometry instead of the 13.5x full joint.
    row_only = row_fits & ~fits

    t0 = t_sec[0, 0]
    tr = t_sec - t0
    w_hi = tr.astype(jnp.bfloat16)
    w_lo = (tr - w_hi.astype(jnp.float32)).astype(jnp.bfloat16) if lo \
        else None

    @pl.when(fits)
    def _windowed():
        _splat_window(acc_t, acc_c, row, colr, t0, w_hi, w_lo,
                      r_lo, c_lo, RH, WC, HP, WP, lo=lo)

    @pl.when(row_only)
    def _row_band():
        if fb is not None:
            fb[0, 0] += jnp.float32(1)
        _splat_window(acc_t, acc_c, row, colr, t0, w_hi, w_lo,
                      r_lo, 0, RH, WP, HP, WP, lo=lo)

    @pl.when(~row_fits & nonempty)
    def _full():
        if fb is not None:
            fb[0, 0] += jnp.float32(1)
        _splat_window(acc_t, acc_c, row, colr, t0, w_hi, w_lo,
                      0, 0, HP, WP, HP, WP, lo=lo)


def _kernel_windowed(scal_ref, prx_r_ref, pry_r_ref, t_r_ref, act_r_ref,
                     out_ref, acc_t, acc_c, *, scale: int, HP: int, WP: int,
                     H: int, W: int):
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)
    half = scale // 2

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)

    x_sh = scal_ref[0, 0]
    y_sh = scal_ref[0, 1]
    wd = scal_ref[0, 2]
    hd = scal_ref[0, 3]

    def accept(prx, pry, act):
        fx = prx * jnp.float32(scale) + x_sh
        fy = pry * jnp.float32(scale) + y_sh
        ix = fx.astype(jnp.int32)
        iy = fy.astype(jnp.int32)
        ok = (
            (act > 0)
            & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
            & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
        )
        return ix, iy, ok

    prx_r = prx_r_ref[0]
    pry_r = pry_r_ref[0]
    t_sec = t_r_ref[0]
    act_r = act_r_ref[0]
    ix_r, iy_r, ok_r = accept(prx_r, pry_r, act_r)

    row = jnp.where(ok_r, ix_r, -1)
    colr = jnp.where(ok_r, iy_r, -1)
    _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP)

    @pl.when(pid == n_prog - 1)
    def _finish():
        _finish_phase(acc_t, acc_c, out_ref, scale, HP, WP, H, W)


def _kernel_local_splat(lx_ref, ly_ref, t_ref, out_t_ref, out_c_ref,
                        acc_t, acc_c, *, HP: int, WP: int, lo: bool):
    """Raw time/count splat into a LOCAL image from precomputed integer
    positions (round-5, for the tiled config-5 path): the caller already
    warped, scaled and halo-shifted the events and encoded rejects as
    -1, so the kernel is just the windowed one-hot MXU accumulation —
    the piece whose XLA scatter equivalent measured 16 ms/iteration on
    real v5e (colliding updates serialize; tools/bench_tiled.py)."""
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)

    row = lx_ref[0].astype(jnp.int32)
    colr = ly_ref[0].astype(jnp.int32)
    _windowed_splat(acc_t, acc_c, row, colr, t_ref[0], HP, WP, lo=lo)

    @pl.when(pid == n_prog - 1)
    def _emit():
        out_t_ref[:, :] = acc_t[:, :]
        out_c_ref[:, :] = acc_c[:, :]


@functools.partial(jax.jit, static_argnames=("H", "W", "time_lo"))
def splat_local_call(lx, ly, t_sec, H: int, W: int, time_lo: bool = True):
    """(tsum, cnt) images [H, W] from local integer positions.

    ``lx``/``ly`` are f32 event positions in the target image frame with
    -1 for rejected/padded events; ``t_sec`` their timestamps in seconds
    (summed raw into tsum — the tiled iteration divides by the
    box-filtered count afterwards).  Events should be pre-sorted
    spatially (e.g. by (x, y)) so chunks stay within the (RH, WC)
    window; unsorted input is still exact via the full-joint fallback.
    ``time_lo`` keeps the bf16 hi+lo time pair (~16-bit effective —
    matching the XLA scatter's f32 sums to ulp level on 0.2 s slices)."""
    n = lx.shape[0]
    n_pad = _round_up(max(n, CHUNK), CHUNK)
    HP = _round_up(max(H, RH), 32)
    WP = _round_up(max(W, WC), 128)

    def pad_row(a, fill):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad - n),
                       constant_values=fill).reshape(
            n_pad // CHUNK, 1, CHUNK)

    lx_r = pad_row(lx, -1.0)
    ly_r = pad_row(ly, -1.0)
    t_r = pad_row(t_sec, 0.0)
    n_chunks = n_pad // CHUNK
    kern = functools.partial(_kernel_local_splat, HP=HP, WP=WP, lo=time_lo)
    out_t, out_c = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=[
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(lx_r, ly_r, t_r)
    return out_t[:H, :W], out_c[:H, :W]


def _kernel_local_finish(t_ref, c_ref, out_ref, *, scale: int, HP: int,
                         WP: int, H: int, W: int, own):
    vals = _finish_values(t_ref, c_ref, scale, HP, WP, H, W, own=own)
    for j, v in enumerate(vals):
        out_ref[0, j] = v
    out_ref[0, 7] = jnp.float32(0)


@functools.partial(jax.jit, static_argnames=(
    "scale", "H", "W", "r0", "r1", "c0", "c1"))
def finish_local_call(tsum, cnt, scale: int, H: int, W: int,
                      r0: int, r1: int, c0: int, c1: int):
    """model_compute_partial-compatible sums over the OWNED window of a
    local (tiled) image, with box filter + normalize + masked Scharr in
    one kernel — the tiled path's XLA image chain (box / divide / scharr
    / 9 reductions, ~1.3 ms/iteration at a 850x1410 local image on v5e)
    as ~tens of us of VMEM-resident vector work.  Stencils read the full
    image (the halo ring carries neighbours' completed edges); only the
    reductions are ownership-masked — exactly the XLA path's
    `where(own, ...)` semantics.  Row/col weights are LOCAL indices;
    the caller shifts to global coordinates on the scalars."""
    HP = _round_up(max(H, RH), 32)
    WP = _round_up(max(W, WC), 128)
    tp = jnp.pad(tsum, ((0, HP - H), (0, WP - W)))
    cp = jnp.pad(cnt, ((0, HP - H), (0, WP - W)))
    kern = functools.partial(_kernel_local_finish, scale=scale, HP=HP,
                             WP=WP, H=H, W=W, own=(r0, r1, c0, c1))
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(tp, cp)
    return {
        "cnt": out[0, 0],
        "s_row": out[0, 1],
        "s_col": out[0, 2],
        "s_gx": out[0, 3],
        "s_gy": out[0, 4],
        "s_rg": out[0, 5],
        "s_dg": out[0, 6],
    }


def sort_key_blocks(x, y, valid, band_rows: int = 32):
    """Spatial sort key from ORIGINAL event pixels: row-band major, column
    minor.  Sorting once per slice by this key makes every CHUNK of events
    spatially local, which is what lets the windowed kernel shrink its
    one-hot joint.  Invalid events sort to the end.  band_rows=32 swept
    fastest on v5e (2.03M vs 1.81M events/s at 64: the narrower band leaves
    more of the 192-row window as warp margin, so fewer chunks fall back to
    the full-height joint)."""
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    key = (xi // band_rows) * 4096 + yi
    return jnp.where(valid, key, jnp.int32(1 << 30))


@functools.partial(jax.jit, static_argnames=("scale", "H", "W"))
def fused_model_partials_windowed(
    pr_x, pr_y, t_ns, active, scale: int, x_sh, y_sh, w_dyn, h_dyn,
    H: int, W: int,
) -> dict:
    """Windowed variant of fused_model_partials: requires events pre-sorted
    by sort_key_blocks (spatially local chunks).  Exact for any warp — a
    chunk whose warped extent escapes its (RH, WC) window falls back to the
    full-height joint for that chunk."""
    n = pr_x.shape[0]
    n_pad = _round_up(max(n, CHUNK), CHUNK)
    HP = _round_up(max(H + 8, RH), 32)   # 32: int8 MXU tile rows
    WP = _round_up(max(W + 8, WC), 128)

    def pad_row(a):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad - n)).reshape(
            n_pad // CHUNK, 1, CHUNK
        )

    prx_r = pad_row(pr_x)
    pry_r = pad_row(pr_y)
    t_r = pad_row(t_ns / jnp.float32(1e9))
    act_r = pad_row(active.astype(jnp.float32))

    scal = jnp.stack(
        [jnp.float32(x_sh), jnp.float32(y_sh),
         jnp.asarray(w_dyn, jnp.float32), jnp.asarray(h_dyn, jnp.float32),
         jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0)]
    ).reshape(1, 8)

    n_chunks = n_pad // CHUNK
    kern = functools.partial(_kernel_windowed, scale=scale, HP=HP, WP=WP,
                             H=H, W=W)
    out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(scal, prx_r, pry_r, t_r, act_r)

    return {
        "cnt": out[0, 0],
        "s_row": out[0, 1],
        "s_col": out[0, 2],
        "s_gx": out[0, 3],
        "s_gy": out[0, 4],
        "s_rg": out[0, 5],
        "s_dg": out[0, 6],
    }


# --------------------------------------------------------------------------
# Megastep: the ENTIRE optimizer iteration — warp + windowed splat + finish
# + the scalar model update (model_from_partials, the divider or secant
# schedule, Kahan total accumulation, divider doubling) + the convergence
# predicate — in ONE pallas_call.  The XLA while_loop body shrinks to a
# single kernel launch and its cond to one SMEM scalar compare: on v5e the
# XLA-composed scalar chain between kernel calls measured tens of us per
# iteration (tools/bench_kernel.bench_probes "scalar-glue"), all of which
# runs for free on the TPU scalar core inside the final grid step here.
#
# The per-iteration state rides an SMEM (1, 32) f32 vector:

ST_TDX, ST_TDY, ST_TROT, ST_TDIV = 0, 1, 2, 3       # accumulated totals
ST_CDX, ST_CDY, ST_CROT, ST_CDIV = 4, 5, 6, 7       # Kahan compensations
ST_CX, ST_CY = 8, 9                                  # event-coord centroid
ST_XDIV, ST_YDIV, ST_RDIV, ST_DDIV = 10, 11, 12, 13  # step dividers
ST_SL = 14    # slope memory[4] (rot,div,dx,dy): last valid in-slice secant
              # slope, carried ACROSS slices as the seed — curvature is a
              # stable property of the objective, unlike the (g, d) pair,
              # whose cross-slice difference quotient mixes in the
              # objective shift from ~40% new events per retrigger.
ST_PD = 18                                           # prev_d[4]: last deltas
ST_ITERS = 22
ST_CONT = 23                                         # while cond flag
ST_DX, ST_DY, ST_ROT, ST_DIV = 24, 25, 26, 27        # last gradient g
              # (dx,dy,rot,div) — read back as prev_g by the fast secant's
              # two-point quotient and by the divider-doubling sign gate.
ST_CNT = 28
ST_FB = 29                                           # fallback chunks (cum.)
# Slot 30 is ST_HAS (megastep2's head-finish gate, defined below) and is
# PASSED THROUGH by _model_update_phase; slot 31 is spare (zeroed).


def _kernel_megastep(
    geo_ref, st_ref, stat_ref, act_ref, pr_ref, npr_ref, st_out_ref,
    acc_t, acc_c, fb, *, scale: int, HP: int, WP: int, H: int, W: int,
    schedule: str, rot_tol: float, div_tol: float, dx_tol: float,
    dy_tol: float, xy_cap: float, rotdiv_cap: float, max_iter: int,
    hard_cap: int, time_lo: bool = True, exit_grad: float = 0.0,
    exit_pred: float = 0.0,
):
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)
    half = scale // 2
    f32 = jnp.float32

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)
        fb[0, 0] = f32(0)

    x_sh = geo_ref[0, 0]
    y_sh = geo_ref[0, 1]
    wd = geo_ref[0, 2]
    hd = geo_ref[0, 3]

    # Warp scalars from the state (sign pattern of optimizer_rolling.h:340).
    dnx_ = -st_ref[0, ST_TDX]
    dny_ = -st_ref[0, ST_TDY]
    crl = -st_ref[0, ST_TROT]
    divp = st_ref[0, ST_TDIV]
    cx = st_ref[0, ST_CX]
    cy = st_ref[0, ST_CY]
    cosv = jnp.cos(crl)
    sinv = jnp.sin(crl)

    stat = stat_ref[0]          # (3, CHUNK)
    frx = stat[0:1]
    fry = stat[1:2]
    t_ns = stat[2:3]
    act = act_ref[0]            # (1, CHUNK)
    prb = pr_ref[0]             # (2, CHUNK)

    prx, pry = _warp_chunk(
        frx, fry, t_ns, prb[0:1], prb[1:2],
        dnx_, dny_, cx, cy, divp, cosv, sinv,
    )
    npr_ref[0, 0:1] = prx
    npr_ref[0, 1:2] = pry

    fx = prx * f32(scale) + x_sh
    fy = pry * f32(scale) + y_sh
    ix = fx.astype(jnp.int32)   # trunc toward zero, like the C++ cast
    iy = fy.astype(jnp.int32)
    ok = (
        (act > 0)
        & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
        & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
    )
    row = jnp.where(ok, ix, -1)
    colr = jnp.where(ok, iy, -1)

    t_sec = t_ns / f32(1e9)
    _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP, fb=fb,
                    lo=time_lo)

    @pl.when(pid == n_prog - 1)
    def _finish():
        vals = _finish_values(acc_t, acc_c, scale, HP, WP, H, W)
        _model_update_phase(
            st_ref, st_out_ref, vals, x_sh, fb[0, 0], scale=scale,
            schedule=schedule, rot_tol=rot_tol, div_tol=div_tol,
            dx_tol=dx_tol, dy_tol=dy_tol, xy_cap=xy_cap,
            rotdiv_cap=rotdiv_cap, max_iter=max_iter, hard_cap=hard_cap,
            y_sh=y_sh, exit_grad=exit_grad, exit_pred=exit_pred,
        )


def _model_update_phase(st_ref, st_out_ref, vals, x_sh, fb_val, *,
                        scale: int, schedule: str, rot_tol: float,
                        div_tol: float, dx_tol: float, dy_tol: float,
                        xy_cap: float, rotdiv_cap: float, max_iter: int,
                        hard_cap: int, y_sh, exit_grad: float = 0.0,
                        exit_pred: float = 0.0):
    """The scalar model update + convergence predicate shared by the
    single-device megastep (run in its final grid step) and the sharded
    finish kernel (run on the psum'd images): model_from_partials, both
    step schedules, Kahan totals, divider doubling, ST_* state write."""
    f32 = jnp.float32
    cnt, s_row, s_col, s_gx, s_gy, s_rg, s_dg = vals
    if True:
        # model_from_partials (ops/reductions.py) on scalars.
        denom = jnp.maximum(cnt, 1.0)
        cx_img = s_row / denom
        cy_img = s_col / denom
        g_dx = s_gx / denom
        g_dy = s_gy / denom
        g_rot = (s_rg - cx_img * s_gy + cy_img * s_gx) / denom
        g_div = (s_dg - cx_img * s_gx - cy_img * s_gy) / denom

        iters = st_ref[0, ST_ITERS]
        x_div = st_ref[0, ST_XDIV]
        y_div = st_ref[0, ST_YDIV]
        rot_div = st_ref[0, ST_RDIV]
        div_div = st_ref[0, ST_DDIV]

        # Reference step sizes (update_accumulators argument order:
        # rot, div, x, y — object_model.h:48-53).
        ref_rot = g_rot / rot_div
        ref_div = g_div / div_div
        ref_dx = g_dx / x_div
        ref_dy = g_dy / y_div

        if schedule == "fast":
            # Safeguarded secant (models/global_flow._fast_loop): Newton on
            # the root of each gradient component.  The slope comes from
            # the in-slice two-point estimate when one exists (a real
            # previous step on THIS slice's objective), else from the
            # slope memory seeded by the previous slice (ST_SL) — so a
            # warm-started slice's FIRST step is already curvature-sized.
            # Falls back to the reference step when neither slope is
            # usable, clamped to 4x it.  prev_g lives in the gradient
            # slots (ST_ROT/ST_DIV/ST_DX/ST_DY hold last iteration's g).
            def secant(g, pg, pd, sl, ref):
                # Unusable quotients (no step yet, or non-concave) fall
                # back to the carried slope memory, under a tighter trust
                # region than fresh in-slice quotients.  Mirrors
                # models/global_flow._fast_loop.two_point exactly.
                slope2 = (g - pg) / pd
                stepped = jnp.abs(pd) > 0
                valid2 = stepped & jnp.isfinite(slope2) & (slope2 < 0)
                slope = jnp.where(valid2, slope2, sl)
                newton = -0.9 * g / slope
                # Trust region: fresh in-slice quotients earn 4x the
                # reference step, carried/stale slopes only 1x (see
                # models/global_flow._fast_loop).
                lim = jnp.where(valid2, 4.0, 1.0) * jnp.abs(ref)
                okp = (slope < 0) & jnp.isfinite(newton)
                return jnp.where(okp, jnp.clip(newton, -lim, lim), ref), \
                    slope
            _pg = (st_ref[0, ST_ROT], st_ref[0, ST_DIV],
                   st_ref[0, ST_DX], st_ref[0, ST_DY])
            d_rot, sl_rot = secant(g_rot, _pg[0], st_ref[0, ST_PD + 0],
                                   st_ref[0, ST_SL + 0], ref_rot)
            d_div, sl_div = secant(g_div, _pg[1], st_ref[0, ST_PD + 1],
                                   st_ref[0, ST_SL + 1], ref_div)
            d_dx, sl_dx = secant(g_dx, _pg[2], st_ref[0, ST_PD + 2],
                                 st_ref[0, ST_SL + 2], ref_dx)
            d_dy, sl_dy = secant(g_dy, _pg[3], st_ref[0, ST_PD + 3],
                                 st_ref[0, ST_SL + 3], ref_dy)
        else:
            d_rot, d_div, d_dx, d_dy = ref_rot, ref_div, ref_dx, ref_dy
            sl_rot = sl_div = sl_dx = sl_dy = f32(0)

        # Kahan total += delta (core/model.add_totals).
        def kadd(total, comp, delta):
            y = delta - comp
            t = total + y
            return t, (t - total) - y

        t_rot, c_rot = kadd(st_ref[0, ST_TROT], st_ref[0, ST_CROT], d_rot)
        t_div, c_div = kadd(st_ref[0, ST_TDIV], st_ref[0, ST_CDIV], d_div)
        t_dx, c_dx = kadd(st_ref[0, ST_TDX], st_ref[0, ST_CDX], d_dx)
        t_dy, c_dy = kadd(st_ref[0, ST_TDY], st_ref[0, ST_CDY], d_dy)

        # Divider doubling on sign flips vs the previous iteration's deltas
        # (optimizer_rolling.h:98-101); gated per component on a real
        # previous step (|prev_d| > 0 — no-op on the unseeded first call).
        _pgd = (st_ref[0, ST_ROT], st_ref[0, ST_DIV],
                st_ref[0, ST_DX], st_ref[0, ST_DY])

        def dbl(div, g, k):
            gate = (jnp.abs(st_ref[0, ST_PD + k]) > 0) & (
                g * _pgd[k] < 0
            )
            return jnp.where(gate, div * 2.0, div)

        x_div = dbl(x_div, g_dx, 2)
        y_div = dbl(y_div, g_dy, 3)
        rot_div = dbl(rot_div, g_rot, 0)
        div_div = dbl(div_div, g_div, 1)

        new_iters = iters + 1.0
        over_max = (max_iter > 0) & (new_iters > max_iter)
        under_cap = new_iters < hard_cap
        if schedule == "fast":
            # A seeded first step can look converged against a STALE
            # cross-slice slope, so iteration 1 normally refreshes the slope
            # in-slice before the exit test.  Exception: when even the
            # REFERENCE divider step is below tolerance (the parity
            # schedule's own convergence test, post-doubling dividers), the
            # gradient is genuinely tiny and the refresh buys nothing —
            # well-seeded slices on smooth motion exit after one iteration.
            # 4x headroom on the gradient gate: the tolerance sweep showed
            # a further 4x relaxation changes nothing on the gate scenes
            # (the refresh floor was what bound), so a reference step
            # within 4x tolerance marks a genuinely converged slice.
            ref_small = (
                (jnp.abs(g_rot / rot_div) < 4.0 * rot_tol)
                & (jnp.abs(g_div / div_div) < 4.0 * div_tol)
                & (jnp.abs(g_dx / x_div) < 4.0 * dx_tol)
                & (jnp.abs(g_dy / y_div) < 4.0 * dy_tol)
            )
            sm_rot = jnp.abs(d_rot) < rot_tol
            sm_div = jnp.abs(d_div) < div_tol
            sm_dx = jnp.abs(d_dx) < dx_tol
            sm_dy = jnp.abs(d_dy) < dy_tol
            if exit_grad > 0:
                # Gradient-qualified exit (mirrors _fast_loop.cond): a
                # trust-region-clamped secant step can be sub-tolerance
                # while the gradient is still large; require the
                # reference step |g|/divider (post-doubling dividers,
                # same as the JAX copy) below exit_grad * tol too.
                sm_rot = sm_rot & (
                    jnp.abs(g_rot / rot_div) < exit_grad * rot_tol)
                sm_div = sm_div & (
                    jnp.abs(g_div / div_div) < exit_grad * div_tol)
                sm_dx = sm_dx & (
                    jnp.abs(g_dx / x_div) < exit_grad * dx_tol)
                sm_dy = sm_dy & (
                    jnp.abs(g_dy / y_div) < exit_grad * dy_tol)
            if exit_pred > 0:
                # Model-validated one-step-ahead exit (mirrors
                # _fast_loop exactly — see the design rationale there):
                # a component may exit, bypassing the delta+gradient
                # tests, when the secant's linear model predicted THIS
                # gradient well (relerr < 0.75) and predicts the next
                # step and next reference step both sub-tolerance.
                # (ST_SL / ST_PD / the gradient slots still hold the
                # PREVIOUS iteration's values here — the new ones are
                # written after the exit test.)
                def pred(g, pg, pd, psl, sl, d, div, tol):
                    g_pred = pg + psl * pd
                    relerr = jnp.abs(g - g_pred) / jnp.maximum(
                        jnp.abs(pg), 1e-30)
                    png = g + sl * d
                    pnd = jnp.abs(
                        0.9 * png / jnp.where(sl < 0, sl, f32(-1e-30)))
                    pngr = jnp.abs(png) / div
                    return ((jnp.abs(pd) > 0) & (relerr < 0.75)
                            & (sl < 0) & (pnd < tol) & (pngr < tol)
                            & (jnp.abs(d) < exit_pred * tol))

                sm_rot = sm_rot | pred(
                    g_rot, _pg[0], st_ref[0, ST_PD + 0],
                    st_ref[0, ST_SL + 0], sl_rot, d_rot, rot_div,
                    rot_tol)
                sm_div = sm_div | pred(
                    g_div, _pg[1], st_ref[0, ST_PD + 1],
                    st_ref[0, ST_SL + 1], sl_div, d_div, div_div,
                    div_tol)
                sm_dx = sm_dx | pred(
                    g_dx, _pg[2], st_ref[0, ST_PD + 2],
                    st_ref[0, ST_SL + 2], sl_dx, d_dx, x_div, dx_tol)
                sm_dy = sm_dy | pred(
                    g_dy, _pg[3], st_ref[0, ST_PD + 3],
                    st_ref[0, ST_SL + 3], sl_dy, d_dy, y_div, dy_tol)
            small = (sm_rot & sm_div & sm_dx & sm_dy) & (
                (new_iters >= 2) | ref_small)
            cont = (~small) & (~over_max) & under_cap
        else:
            dividers_open = (
                (x_div < xy_cap) | (y_div < xy_cap)
                | (rot_div < rotdiv_cap) | (div_div < rotdiv_cap)
            )
            small = (
                (jnp.abs(g_dx / x_div) < dx_tol)
                & (jnp.abs(g_dy / y_div) < dy_tol)
                & (jnp.abs(g_rot / rot_div) < rot_tol)
                & (jnp.abs(g_div / div_div) < div_tol)
            )
            cont = dividers_open & (~small) & (~over_max) & under_cap

        # Centroid back to event coordinates (optimizer_rolling.h:330-331).
        cx_ev = (cx_img - x_sh) / f32(scale)
        cy_ev = (cy_img - y_sh) / f32(scale)

        st_out_ref[0, ST_TDX] = t_dx
        st_out_ref[0, ST_TDY] = t_dy
        st_out_ref[0, ST_TROT] = t_rot
        st_out_ref[0, ST_TDIV] = t_div
        st_out_ref[0, ST_CDX] = c_dx
        st_out_ref[0, ST_CDY] = c_dy
        st_out_ref[0, ST_CROT] = c_rot
        st_out_ref[0, ST_CDIV] = c_div
        st_out_ref[0, ST_CX] = cx_ev
        st_out_ref[0, ST_CY] = cy_ev
        st_out_ref[0, ST_XDIV] = x_div
        st_out_ref[0, ST_YDIV] = y_div
        st_out_ref[0, ST_RDIV] = rot_div
        st_out_ref[0, ST_DDIV] = div_div
        st_out_ref[0, ST_SL + 0] = sl_rot
        st_out_ref[0, ST_SL + 1] = sl_div
        st_out_ref[0, ST_SL + 2] = sl_dx
        st_out_ref[0, ST_SL + 3] = sl_dy
        st_out_ref[0, ST_PD + 0] = d_rot
        st_out_ref[0, ST_PD + 1] = d_div
        st_out_ref[0, ST_PD + 2] = d_dx
        st_out_ref[0, ST_PD + 3] = d_dy
        st_out_ref[0, ST_ITERS] = new_iters
        st_out_ref[0, ST_CONT] = jnp.where(cont, f32(1), f32(0))
        st_out_ref[0, ST_DX] = g_dx
        st_out_ref[0, ST_DY] = g_dy
        st_out_ref[0, ST_ROT] = g_rot
        st_out_ref[0, ST_DIV] = g_div
        st_out_ref[0, ST_CNT] = cnt
        st_out_ref[0, ST_FB] = st_ref[0, ST_FB] + fb_val
        # Slot 30 is ST_HAS (megastep2's head-finish gate) — pass it
        # through rather than zeroing so callers that repurpose it do not
        # depend on re-writing it after this phase (the merged kernel's
        # head still sets it explicitly; every other drive leaves it 0).
        st_out_ref[0, 30] = st_ref[0, 30]
        st_out_ref[0, 31] = f32(0)


def megastep_call(stat, act, pr, st, geo, *, scale: int, H: int, W: int,
                  schedule: str, rot_tol: float, div_tol: float,
                  dx_tol: float, dy_tol: float, xy_cap: float,
                  rotdiv_cap: float, max_iter: int, hard_cap: int,
                  time_lo: bool = True, exit_grad: float = 0.0,
                  exit_pred: float = 0.0):
    """One full optimizer iteration as a single pallas_call.

    ``st`` is the (1, 32) SMEM state vector (ST_* layout above), ``geo`` the
    loop-invariant (1, 8) geometry [x_sh, y_sh, w_dyn, h_dyn, ...].  Returns
    (new_pr, new_st).  Schedule/tolerance parameters are compile-time
    constants (cfg is static under jit)."""
    HP, WP = padded_image_shape(H, W)
    n_chunks = stat.shape[0]
    kern = functools.partial(
        _kernel_megastep, scale=scale, HP=HP, WP=WP, H=H, W=W,
        schedule=schedule, rot_tol=rot_tol, div_tol=div_tol, dx_tol=dx_tol,
        dy_tol=dy_tol, xy_cap=xy_cap, rotdiv_cap=rotdiv_cap,
        max_iter=max_iter, hard_cap=hard_cap, time_lo=time_lo,
        exit_grad=exit_grad, exit_pred=exit_pred,
    )
    npr, st_out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 2, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, 32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(geo, st, stat, act, pr)
    return npr, st_out


def _kernel_warp_uv(scal_ref, stat_ref, pr_ref, act_ref, out_ref,
                    uvn_ref):
    """Final-warp epilogue: one warp-only pass producing (pr_x, pr_y, nx,
    ny) AND the scan's finished per-event output row (u, v, noise) per
    chunk.  This is the project_4param_reinit epilogue of the fused loop
    (the megastep exits with pr one warp behind the model) as a kernel
    instead of ~15 XLA elementwise passes per slice; emitting (u, v,
    noise) here — flow = n * UV_FACTOR/NZ (event.h:135-142), noise =
    ~active | window_small (optimizer_rolling.h:52-54, via the packed
    activity row: ~act == the pre-loop noise flags on valid slots, and
    padding slots are dropped by the accumulate's perm sentinel) — makes
    the slice scan's stacked ys THIS kernel's second output verbatim,
    with no per-event XLA passes after the loop.  Same f32 op order as
    ops/warp.py."""
    dnx_ = scal_ref[0, 0]
    dny_ = scal_ref[0, 1]
    cx = scal_ref[0, 2]
    cy = scal_ref[0, 3]
    divp = scal_ref[0, 4]
    crl = scal_ref[0, 5]
    wsmall = scal_ref[0, 6]     # window_small gate as 0/1
    cosv = jnp.cos(crl)
    sinv = jnp.sin(crl)

    stat = stat_ref[0]
    frx = stat[0:1]
    fry = stat[1:2]
    t_ns = stat[2:3]
    prb = pr_ref[0]
    act = act_ref[0]

    rx = prb[0:1] - cx
    ry = prb[1:2] - cy
    rpx = cosv * rx - sinv * ry
    rpy = sinv * rx + cosv * ry
    nx = -rpx * divp + (rpx - rx) + dnx_
    ny = -rpy * divp + (rpy - ry) + dny_
    kx = nx / jnp.float32(_NZ)
    ky = ny / jnp.float32(_NZ)
    ts = t_ns / jnp.float32(_WARP_TIME_DIV)
    out_ref[0, 0:1] = frx - kx * ts
    out_ref[0, 1:2] = fry - ky * ts
    out_ref[0, 2:3] = nx
    out_ref[0, 3:4] = ny
    uv_k = jnp.float32(_UV_FACTOR / _NZ)
    uvn_ref[0, 0:1] = nx * uv_k
    uvn_ref[0, 1:2] = ny * uv_k
    # noise = (valid & pre-loop-noise) | window_small; padding slots get 1,
    # which every consumer drops via the perm/idx sentinel.
    uvn_ref[0, 2:3] = jnp.maximum(1.0 - act, wsmall)


def warp_uv_call(stat, pr, act, window_small, dnx_, dny_, cx, cy, divp,
                 crl):
    """Run the final-warp epilogue kernel.  Returns
    (out (nch, 4, CHUNK): [pr_x, pr_y, nx, ny],
     uvn (nch, 3, CHUNK): [u, v, noise]) — the latter is the slice scan's
    per-event ys, finished in-kernel."""
    n_chunks = stat.shape[0]
    scal = jnp.stack(
        [jnp.asarray(v, jnp.float32)
         for v in (dnx_, dny_, cx, cy, divp, crl, window_small)]
        + [jnp.float32(0)]
    ).reshape(1, 8)
    kern = _kernel_warp_uv
    return pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 4, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 3, CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(scal, stat, pr, act)


# --------------------------------------------------------------------------
# Sharded megastep: the event-parallel iteration split at the psum seam,
# with BOTH halves as kernels and the scalar model update in-kernel.
# Kernel A (below) = shard-local warp + windowed splat emitting pre-filter
# images, reading its warp scalars from the same SMEM ST_* state the
# single-device megastep uses; after lax.psum over the event axis, kernel B
# (megastep_finish_call) runs box+normalize+Scharr+partials AND the model
# update + convergence predicate on the summed images — replicated per
# shard, so every device computes the identical next state with no further
# collective and no XLA scalar chain.

def _kernel_warp_images_st(
    geo_ref, st_ref, stat_ref, act_ref, pr_ref, npr_ref, acc_t, acc_c,
    fb_ref, *, scale: int, HP: int, WP: int, time_lo: bool = True,
    pair: int = 1, predicated: int = 0,
):
    pid = pl.program_id(0)
    half = scale // 2
    f32 = jnp.float32

    @pl.when(pid == 0)
    def _init():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)
        fb_ref[0, 0] = f32(0)

    def _body():
        x_sh = geo_ref[0, 0]
        y_sh = geo_ref[0, 1]
        wd = geo_ref[0, 2]
        hd = geo_ref[0, 3]
        dnx_ = -st_ref[0, ST_TDX]
        dny_ = -st_ref[0, ST_TDY]
        crl = -st_ref[0, ST_TROT]
        divp = st_ref[0, ST_TDIV]
        cx = st_ref[0, ST_CX]
        cy = st_ref[0, ST_CY]
        cosv = jnp.cos(crl)
        sinv = jnp.sin(crl)

        # ``pair`` > 1 processes several chunks per grid step (block
        # leading dim), amortizing the per-step pipeline overhead.
        for j in range(pair):
            stat = stat_ref[j]
            frx = stat[0:1]
            fry = stat[1:2]
            t_ns = stat[2:3]
            act = act_ref[j]
            prb = pr_ref[j]

            prx, pry = _warp_chunk(
                frx, fry, t_ns, prb[0:1], prb[1:2],
                dnx_, dny_, cx, cy, divp, cosv, sinv,
            )
            npr_ref[j, 0:1] = prx
            npr_ref[j, 1:2] = pry

            fx = prx * f32(scale) + x_sh
            fy = pry * f32(scale) + y_sh
            ix = fx.astype(jnp.int32)
            iy = fy.astype(jnp.int32)
            ok = (
                (act > 0)
                & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
                & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
            )
            row = jnp.where(ok, ix, -1)
            colr = jnp.where(ok, iy, -1)
            t_sec = t_ns / f32(1e9)
            _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP,
                            fb=fb_ref, lo=time_lo)

    if not predicated:
        # Production shape: an unguarded body — wrapping the whole kernel
        # in pl.when(CONT) measurably slows Mosaic's pipelining.
        _body()
    else:
        # Loop-unrolled drive: a pair's second half may run past the
        # exit; a CONVERGED state (CONT == 0) passes pr through
        # untouched, so the unrolled loop is bit-identical to the
        # one-iteration body.
        live = st_ref[0, ST_CONT] > 0
        pl.when(live)(_body)

        @pl.when(~live)
        def _noop():
            npr_ref[:, :, :] = pr_ref[:, :, :]


def warp_images_st_call(stat, act, pr, st, geo, *, scale: int, H: int,
                        W: int, time_lo: bool = True, pair: int = 1,
                        predicated: int = 0):
    """Shard-local half of the sharded megastep.  Returns
    (new_pr, acc_t, acc_c) — the pre-filter images are linear in events,
    hence psum-combinable over the event mesh axis.  ``pair`` chunks are
    processed per grid step when it divides the chunk count (amortizes
    per-step pipeline overhead)."""
    HP, WP = padded_image_shape(H, W)
    n_chunks = stat.shape[0]
    if n_chunks % pair != 0:
        pair = 1
    kern = functools.partial(_kernel_warp_images_st, scale=scale, HP=HP,
                             WP=WP, time_lo=time_lo, pair=pair,
                             predicated=predicated)
    npr, acc_t, acc_c, _fb = pl.pallas_call(
        kern,
        grid=(n_chunks // pair,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((pair, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pair, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pair, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((pair, 2, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 2, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(geo, st, stat, act, pr)
    return npr, acc_t, acc_c


def _kernel_finish_st(
    geo_ref, st_ref, acc_t_ref, acc_c_ref, st_out_ref, *, scale: int,
    HP: int, WP: int, H: int, W: int, schedule: str, rot_tol: float,
    div_tol: float, dx_tol: float, dy_tol: float, xy_cap: float,
    rotdiv_cap: float, max_iter: int, hard_cap: int,
    exit_grad: float = 0.0,
    exit_pred: float = 0.0, predicated: int = 0,
):
    def _body():
        vals = _finish_values(acc_t_ref, acc_c_ref, scale, HP, WP, H, W)
        _model_update_phase(
            st_ref, st_out_ref, vals, geo_ref[0, 0], jnp.float32(0),
            scale=scale, schedule=schedule, rot_tol=rot_tol,
            div_tol=div_tol, dx_tol=dx_tol, dy_tol=dy_tol, xy_cap=xy_cap,
            rotdiv_cap=rotdiv_cap, max_iter=max_iter, hard_cap=hard_cap,
            y_sh=geo_ref[0, 1], exit_grad=exit_grad,
            exit_pred=exit_pred,
        )

    if not predicated:
        _body()
    else:
        live = st_ref[0, ST_CONT] > 0
        pl.when(live)(_body)

        # Converged pass-through (loop-unrolled drive; see
        # _kernel_warp_images_st).
        @pl.when(~live)
        def _noop():
            for k in range(32):
                st_out_ref[0, k] = st_ref[0, k]


def megastep_finish_call(acc_t, acc_c, st, geo, *, scale: int, H: int,
                         W: int, schedule: str, rot_tol: float,
                         div_tol: float, dx_tol: float, dy_tol: float,
                         xy_cap: float, rotdiv_cap: float, max_iter: int,
                         hard_cap: int, exit_grad: float = 0.0,
                         exit_pred: float = 0.0,
                         predicated: int = 0):
    """Finish + model update on (psum'd) pre-filter images: the replicated
    second half of the sharded megastep.  Returns the next ST_* state."""
    HP, WP = acc_t.shape
    kern = functools.partial(
        _kernel_finish_st, scale=scale, HP=HP, WP=WP, H=H, W=W,
        schedule=schedule, rot_tol=rot_tol, div_tol=div_tol, dx_tol=dx_tol,
        dy_tol=dy_tol, xy_cap=xy_cap, rotdiv_cap=rotdiv_cap,
        max_iter=max_iter, hard_cap=hard_cap, exit_grad=exit_grad,
        exit_pred=exit_pred, predicated=predicated,
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((1, 8), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(geo, st, acc_t, acc_c)


# --------------------------------------------------------------------------
# Merged megastep ("megastep2"): ONE kernel call per iteration, with the
# finish/model-update phase of the PREVIOUS iteration's images running in
# grid step 0 of the NEXT call.  Vs the split megastep this removes one
# kernel launch + one SMEM state round trip per iteration, resolves the
# while-loop cond EARLY (CONT is computed at the START of a call, so the
# cond for the next launch is ready before the 30 chunk splats run instead
# of after), and folds the final-warp epilogue away entirely: the call
# whose head-finish exits still warps every event with the FINAL model (and
# emits nx/ny), then skips its splat — exactly the warp_uv epilogue, for
# free.  Written op sequence per phase is identical to the split kernels
# (_finish_values / _model_update_phase / _warp_chunk / _windowed_splat).

ST_HAS = 30   # head-finish gate: 0 on a slice's first call (no images yet)


def _kernel_megastep2(
    geo_ref, st_ref, stat_ref, act_ref, pr_ref, img_t_ref, img_c_ref,
    npr_ref, st_out_ref, acc_t, acc_c, fb_ref, *, scale: int, HP: int,
    WP: int, H: int, W: int, schedule: str, rot_tol: float, div_tol: float,
    dx_tol: float, dy_tol: float, xy_cap: float, rotdiv_cap: float,
    max_iter: int, hard_cap: int, time_lo: bool = True,
    exit_grad: float = 0.0,
    exit_pred: float = 0.0,
):
    pid = pl.program_id(0)
    half = scale // 2
    f32 = jnp.float32

    @pl.when(pid == 0)
    def _head():
        acc_t[:, :] = jnp.zeros((HP, WP), jnp.float32)
        acc_c[:, :] = jnp.zeros((HP, WP), jnp.float32)
        fb_ref[0, 0] = f32(0)
        has = st_ref[0, ST_HAS] > 0.5

        @pl.when(has)
        def _finish_prev():
            vals = _finish_values(img_t_ref, img_c_ref, scale, HP, WP, H, W)
            _model_update_phase(
                st_ref, st_out_ref, vals, geo_ref[0, 0], f32(0),
                scale=scale, schedule=schedule, rot_tol=rot_tol,
                div_tol=div_tol, dx_tol=dx_tol, dy_tol=dy_tol,
                xy_cap=xy_cap, rotdiv_cap=rotdiv_cap, max_iter=max_iter,
                hard_cap=hard_cap, y_sh=geo_ref[0, 1],
                exit_grad=exit_grad,
                exit_pred=exit_pred,
            )
            # _model_update_phase dropped the carried fallback count into
            # ST_FB already (fb_val=0 here; this call's own splat adds at
            # the tail step below).

        @pl.when(~has)
        def _first_call():
            for k in range(32):
                st_out_ref[0, k] = st_ref[0, k]
            st_out_ref[0, ST_CONT] = f32(1)

        st_out_ref[0, ST_HAS] = f32(1)

    # All grid steps read the head-updated state (grid steps run
    # sequentially on the core; pid 0 has already written st_out).
    x_sh = geo_ref[0, 0]
    y_sh = geo_ref[0, 1]
    wd = geo_ref[0, 2]
    hd = geo_ref[0, 3]
    dnx_ = -st_out_ref[0, ST_TDX]
    dny_ = -st_out_ref[0, ST_TDY]
    crl = -st_out_ref[0, ST_TROT]
    divp = st_out_ref[0, ST_TDIV]
    cx = st_out_ref[0, ST_CX]
    cy = st_out_ref[0, ST_CY]
    cosv = jnp.cos(crl)
    sinv = jnp.sin(crl)

    stat = stat_ref[0]
    frx = stat[0:1]
    fry = stat[1:2]
    t_ns = stat[2:3]
    act = act_ref[0]
    prb = pr_ref[0]

    prx, pry = _warp_chunk(
        frx, fry, t_ns, prb[0:1], prb[1:2],
        dnx_, dny_, cx, cy, divp, cosv, sinv,
    )
    npr_ref[0, 0:1] = prx
    npr_ref[0, 1:2] = pry
    # Direction vectors (event.h:99-110 n overwrite) — free here, and they
    # make the exit call the warp_uv epilogue.
    rx = prb[0:1] - cx
    ry = prb[1:2] - cy
    rpx = cosv * rx - sinv * ry
    rpy = sinv * rx + cosv * ry
    npr_ref[0, 2:3] = -rpx * divp + (rpx - rx) + dnx_
    npr_ref[0, 3:4] = -rpy * divp + (rpy - ry) + dny_

    @pl.when(st_out_ref[0, ST_CONT] > 0)
    def _splat():
        fx = prx * f32(scale) + x_sh
        fy = pry * f32(scale) + y_sh
        ix = fx.astype(jnp.int32)
        iy = fy.astype(jnp.int32)
        ok = (
            (act > 0)
            & (ix >= half) & (ix.astype(jnp.float32) < wd + half)
            & (iy >= half) & (iy.astype(jnp.float32) < hd + half)
        )
        row = jnp.where(ok, ix, -1)
        colr = jnp.where(ok, iy, -1)
        t_sec = t_ns / f32(1e9)
        _windowed_splat(acc_t, acc_c, row, colr, t_sec, HP, WP, fb=fb_ref,
                        lo=time_lo)

    @pl.when(pid == pl.num_programs(0) - 1)
    def _tail():
        st_out_ref[0, ST_FB] = st_out_ref[0, ST_FB] + fb_ref[0, 0]


def megastep2_call(stat, act, pr, st, img_t, img_c, geo, *, scale: int,
                   H: int, W: int, schedule: str, rot_tol: float,
                   div_tol: float, dx_tol: float, dy_tol: float,
                   xy_cap: float, rotdiv_cap: float, max_iter: int,
                   hard_cap: int, time_lo: bool = True,
                   exit_grad: float = 0.0,
                   exit_pred: float = 0.0):
    """One merged iteration: head-finish of the previous images + warp +
    splat.  Returns (npr[(nch, 4, CHUNK): pr_x, pr_y, nx, ny], st_out,
    new_img_t, new_img_c)."""
    HP, WP = padded_image_shape(H, W)
    n_chunks = stat.shape[0]
    kern = functools.partial(
        _kernel_megastep2, scale=scale, HP=HP, WP=WP, H=H, W=W,
        schedule=schedule, rot_tol=rot_tol, div_tol=div_tol, dx_tol=dx_tol,
        dy_tol=dy_tol, xy_cap=xy_cap, rotdiv_cap=rotdiv_cap,
        max_iter=max_iter, hard_cap=hard_cap, time_lo=time_lo,
        exit_grad=exit_grad, exit_pred=exit_pred,
    )
    npr, st_out, acc_t, acc_c, _fb = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, WP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 4, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, 32), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((HP, WP), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(),
    )(geo, st, stat, act, pr, img_t, img_c)
    return npr, st_out, acc_t, acc_c
