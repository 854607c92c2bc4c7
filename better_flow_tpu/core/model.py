"""The 4-parameter global motion model as an immutable pytree.

Reference: ObjectModel (object_model.h:8-72) — centroid (cx, cy),
per-iteration deltas (dx, dy, rot, div), nonzero-pixel count, and the
accumulated totals that define the current warp.  Here it is a NamedTuple of
f32 scalars, carried through ``lax.while_loop`` and across slices as the
warm-start state (dvs_flow.h:38-39, 218-224).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MotionModel(NamedTuple):
    cx: jnp.ndarray   # centroid, image or event coords depending on stage
    cy: jnp.ndarray
    dx: jnp.ndarray   # last iteration's raw deltas (means of gradients)
    dy: jnp.ndarray
    rot: jnp.ndarray
    div: jnp.ndarray
    cnt: jnp.ndarray  # nonzero-pixel count of the last time image (f32)
    total_dx: jnp.ndarray   # accumulated warp parameters
    total_dy: jnp.ndarray
    total_rot: jnp.ndarray
    total_div: jnp.ndarray
    comp_dx: jnp.ndarray    # Kahan compensation of the totals: the reference
    comp_dy: jnp.ndarray    # accumulates in double (object_model.h:10-13);
    comp_rot: jnp.ndarray   # naive f32 sums drift over the hundreds of
    comp_div: jnp.ndarray   # iterations a recording chains through, and the
    # warm-start slice chain is chaotic enough to bifurcate on that drift
    # (PARITY.md "Known behavioural divergence").

    @staticmethod
    def zero(totals_dtype=jnp.float32) -> "MotionModel":
        """Fresh model.  ``totals_dtype=jnp.float64`` (requires jax x64)
        makes the accumulated-warp carry exactly double precision, matching
        the reference's double accumulators (object_model.h:10-13) instead
        of emulating them with Kahan-compensated f32; the per-event warp
        stays f32 either way (project_4param_reinit casts on entry, as the
        C++ apply_project truncates to float, event.h:156-167)."""
        z = jnp.float32(0.0)
        zt = jnp.zeros((), totals_dtype)
        return MotionModel(
            cx=z, cy=z, dx=z, dy=z, rot=z, div=z, cnt=z,
            total_dx=zt, total_dy=zt, total_rot=zt, total_div=zt,
            comp_dx=zt, comp_dy=zt, comp_rot=zt, comp_div=zt,
        )

    def update_accumulators(self, d_rot, d_div, d_x, d_y) -> "MotionModel":
        """total_p += p / divider — the gradient step.

        Argument order matches ObjectModel::update_accumulators(d1..d4)
        (object_model.h:48-53): d1 divides rot, d2 div, d3 dx, d4 dy.  The
        production call site passes (rot_divider, div_divider, x_divider,
        y_divider) (optimizer_rolling.h:328).  Sums are Kahan-compensated.
        """

        return self.add_totals(
            self.rot / d_rot, self.div / d_div, self.dx / d_x, self.dy / d_y
        )

    def add_totals(self, d_rot, d_div, d_x, d_y) -> "MotionModel":
        """Kahan-compensated ``total_p += d_p`` for explicit step sizes."""

        def kadd(total, comp, delta):
            y = delta - comp
            t = total + y
            return t, (t - total) - y

        total_rot, comp_rot = kadd(self.total_rot, self.comp_rot, d_rot)
        total_div, comp_div = kadd(self.total_div, self.comp_div, d_div)
        total_dx, comp_dx = kadd(self.total_dx, self.comp_dx, d_x)
        total_dy, comp_dy = kadd(self.total_dy, self.comp_dy, d_y)
        return self._replace(
            total_rot=total_rot, comp_rot=comp_rot,
            total_div=total_div, comp_div=comp_div,
            total_dx=total_dx, comp_dx=comp_dx,
            total_dy=total_dy, comp_dy=comp_dy,
        )

    def pretty(self) -> str:
        """Host-side pretty print (ObjectModel::operator<<, object_model.h:55-63)."""
        return (
            f"C: ({float(self.cx)}, {float(self.cy)}); \n"
            f"\t Shift: ({float(self.dx)}, {float(self.dy)}); "
            f" total: ({float(self.total_dx)}, {float(self.total_dy)});\n"
            f"\t Rot: {float(self.rot)} total: {float(self.total_rot)}\n"
            f"\t Div: {float(self.div)} total: {float(self.total_div)}\n"
            f"\t cnt: {int(self.cnt)}"
        )
