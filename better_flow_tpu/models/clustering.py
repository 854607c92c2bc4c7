"""Event clustering — the reference's unreleased segmentation stage.

The reference ships only a stub (clustering.h/.cpp: a Cluster with a static
id counter, ``add`` setting a back-pointer, and ``operator+=`` merging by id
overwrite; Event carries cl/cl_id fields, event.h:23-24) — the
detection/segmentation stage was never released (README.md:6-7).

This module keeps the stub's surface (cluster ids per event, merge) and adds
a working baseline segmentation so the capability exists end to end:
connected components over the *motion-compensated* count image, with
per-cluster mean flow.  Components are computed by pooling label propagation
(iterated max-pool of seed labels), which is jit-friendly and deterministic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class ClusterAssignment(NamedTuple):
    cluster_id: jnp.ndarray   # i32[N] per-event cluster id, -1 = unclustered
    n_clusters: jnp.ndarray   # i32 number of distinct clusters
    label_img: jnp.ndarray    # i32[H, W] pixel labels (0 = background)


@partial(jax.jit, static_argnames=("n_iters",))
def label_components(occ: jnp.ndarray, n_iters: int = 64) -> jnp.ndarray:
    """4-connected components of a boolean image by label propagation.

    Each occupied pixel starts with a unique seed label (its linear index +
    1); ``n_iters`` rounds of neighbourhood max merge touching pixels.
    n_iters bounds the component diameter — adequate for event blobs.
    """
    H, W = occ.shape
    seeds = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1) * occ

    def body(_, lab):
        p = jnp.pad(lab, 1)
        nb = jnp.maximum(
            jnp.maximum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.maximum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        return jnp.where(occ, jnp.maximum(lab, nb), 0)

    return lax.fori_loop(0, n_iters, body, seeds)


def cluster_events(
    pr_x, pr_y, u, v, mask, scale: int, res_x: int, res_y: int,
    min_count: int = 2, n_iters: int = 64,
) -> dict:
    """Segment events by connected compensated-image support.

    Returns per-event cluster ids (compacted to 0..K-1, -1 for events
    outside any component), cluster count, and per-cluster mean flow — the
    data the reference's color_clusters_img visualization consumes
    (event_file.h:560-646).
    """
    pr_x = np.asarray(pr_x, np.float64)
    pr_y = np.asarray(pr_y, np.float64)
    H, W = res_x * scale + scale, res_y * scale + scale
    ix = np.trunc(pr_x * scale).astype(np.int64) + scale // 2
    iy = np.trunc(pr_y * scale).astype(np.int64) + scale // 2
    ok = (
        np.asarray(mask, bool)
        & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
    )
    occ = np.zeros((H, W), bool)
    occ[ix[ok], iy[ok]] = True
    cnt = np.zeros((H, W), np.int32)
    np.add.at(cnt, (ix[ok], iy[ok]), 1)
    occ &= cnt >= min_count

    labels = np.asarray(label_components(jnp.asarray(occ), n_iters=n_iters))

    ev_label = np.full(len(pr_x), 0, np.int64)
    ev_label[ok] = labels[ix[ok], iy[ok]]
    uniq = np.unique(ev_label[ev_label > 0])
    remap = {int(l): i for i, l in enumerate(uniq)}
    cluster_id = np.array([remap.get(int(l), -1) for l in ev_label], np.int32)

    k = len(uniq)
    mean_u = np.zeros(k)
    mean_v = np.zeros(k)
    sizes = np.zeros(k, np.int64)
    u = np.asarray(u)
    v = np.asarray(v)
    for i in range(k):
        sel = cluster_id == i
        sizes[i] = sel.sum()
        if sizes[i]:
            mean_u[i] = u[sel].mean()
            mean_v[i] = v[sel].mean()
    return {
        "cluster_id": cluster_id,
        "n_clusters": k,
        "sizes": sizes,
        "mean_u": mean_u,
        "mean_v": mean_v,
        "label_img": labels,
    }


def merge_clusters(cluster_id: np.ndarray, a: int, b: int) -> np.ndarray:
    """Cluster::operator+= (clustering.cpp:22-25): absorb b into a."""
    out = np.asarray(cluster_id).copy()
    out[out == b] = a
    return out
