"""Exact self-kNN for large clouds via the tile sweep + dense fallback.

The prep-path filters (SurfaceNormal and friends) need TRUE k nearest
neighbors with no radius bound (reference: SurfaceNormal.cpp:82-290 queries
the kd-tree unbounded). The dense sweep is O(N²) — 4·10¹⁰ cells at 2·10⁵
points — so above a size threshold this module runs the bounded tile sweep
at a density-derived radius and finishes the (typically tiny) unresolved
remainder with one dense sweep over just those rows:

1. pick a cell edge so an edge-cube holds ~4k points at the cloud's mean
   density — the covered ball of radius ``edge`` then contains ≥ k
   neighbors with high probability in near-uniform regions;
2. tile-sweep top-k at ``max_dist = edge``. Rows whose k-th neighbor lies
   within ``edge`` are EXACT: the 3^d cell neighborhood covers the whole
   ball of radius ``edge`` around every query in the cell;
3. rows with fewer than k hits inside ``edge`` (sparse regions, gaps)
   fall back to the dense kernel against the full cloud — a [B_f, N]
   sweep over only the failed rows, padded to a bucket.

Exactness never depends on the density heuristic — a bad edge only moves
rows between the cheap pass and the fallback."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["knn_self_culled", "CULL_MIN_POINTS"]

#: below this valid-point count the dense sweep is cheaper than building
#: the grid (measured crossover region, tools/large_knn_bench.py)
CULL_MIN_POINTS = 60_000


def knn_self_culled(points, mask, k: int, max_dist: float = np.inf):
    """kNN of a cloud against itself: → (dists2 [N, k], ids [N, k])
    ascending, (+inf, -1) invalid — same contract as
    ``ops.dispatch.knn_search(points, mask, points, mask, k)`` (with
    ``max_dist`` applied), exact."""
    from .dispatch import knn_search
    from .tilesweep import (TILE_KNN_MAX, assign_tiles, build_sub_blocks,
                            gather_candidates, tile_knnk_from_candidates,
                            tile_nn1_from_candidates)

    if k > TILE_KNN_MAX:
        dists, ids = knn_search(points, mask, points, mask, k=k)
        return _apply_max_dist(dists, ids, max_dist)

    pts_h, mask_h = jax.device_get((points, mask))
    pts_h = np.asarray(pts_h)
    mask_h = np.asarray(mask_h, bool)
    valid = pts_h[mask_h]
    n_valid, d = valid.shape if valid.size else (0, pts_h.shape[1])
    if n_valid < 2:
        dists, ids = knn_search(points, mask, points, mask, k=k)
        return _apply_max_dist(dists, ids, max_dist)

    extent = np.maximum(valid.max(axis=0) - valid.min(axis=0), 1e-9)
    edge = float(1.0 * (np.prod(extent) * 4.0 * k / n_valid) ** (1.0 / d))
    edge = min(edge, float(extent.max()))
    sweep_r = min(edge, float(max_dist))

    sub = build_sub_blocks(pts_h, mask_h, edge)
    ta = assign_tiles(pts_h, mask_h, sub, tile_q=256, block_cap=1024)
    cand_t, pen, cid = gather_candidates(sub, ta.blocks)
    if k == 1:
        d1, i1 = tile_nn1_from_candidates(
            points, mask, ta.q_rows, cand_t, pen, cid, sweep_r,
            parent=ta.parent, vrows=ta.vrows,
        )
        dk, ik = d1[:, None], i1[:, None]
    else:
        dk, ik = tile_knnk_from_candidates(
            points, mask, ta.q_rows, cand_t, pen, cid, sweep_r,
            parent=ta.parent, vrows=ta.vrows, k=k,
        )
    if max_dist <= edge:
        return dk, ik  # the sweep covered the full requested radius

    # rows whose k-th hit is not provably inside the covered ball
    kth = dk[:, k - 1]
    bad = jnp.logical_and(mask, kth > jnp.float32(edge) ** 2)
    bad_h = np.asarray(jax.device_get(bad))
    rows = np.flatnonzero(bad_h)
    if len(rows) == 0:
        return dk, ik

    from ..cloud import bucket_size

    cap = int(bucket_size(len(rows), granule=256))
    rows_pad = np.full(cap, 0, np.int64)
    rows_pad[: len(rows)] = rows
    sub_mask = np.zeros(cap, bool)
    sub_mask[: len(rows)] = True
    rj = jnp.asarray(rows_pad)
    dd, di = knn_search(
        points[rj], jnp.asarray(sub_mask), points, mask, k=k
    )
    dd, di = _apply_max_dist(dd, di, max_dist)
    dk = dk.at[rj].set(jnp.where(jnp.asarray(sub_mask)[:, None], dd, dk[rj]))
    ik = ik.at[rj].set(jnp.where(jnp.asarray(sub_mask)[:, None], di, ik[rj]))
    return dk, ik


def _apply_max_dist(dists, ids, max_dist: float):
    if max_dist == np.inf:
        return dists, ids
    keep = dists <= jnp.float32(max_dist) ** 2
    return jnp.where(keep, dists, jnp.inf), jnp.where(keep, ids, -1)
