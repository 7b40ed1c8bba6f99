"""Cell-grid (cell-list) bounded-radius kNN for large clouds.

Brute force is exact and MXU/VPU-friendly but O(N·M): past ~10⁵ points per
side even a TPU-rate dense sweep loses to culling. When the matcher has a
finite ``maxDist`` (the bounded-radius search the reference's kd-tree also
exploits), a classical cell list becomes shape-static and TPU-friendly:

- **build** (host, once per reference — the analogue of the kd-tree build):
  hash points into cubic cells of edge ``maxDist``, sort by cell, record
  per-cell start offsets into the sorted order;
- **query** (device, per iteration): each query point gathers the candidate
  points of its 3^d neighboring cells — a fixed ``[N, 3^d, M_cell]`` gather
  (M_cell = the fullest cell) — and reduces distances over them.

Exact within the radius: any reference point within ``maxDist`` of a query
lies in one of the 3^d cells around the query's (clamped) cell; matches
beyond the radius are masked to (+inf, -1) exactly like the brute-force +
maxDist path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CellGrid", "build_cell_grid", "cell_knn"]


class CellGrid(NamedTuple):
    origin: jnp.ndarray  # [d] grid origin
    inv_cell: jnp.ndarray  # scalar 1/cell_size
    dims: Tuple[int, ...]  # static cells per axis
    cell_start: jnp.ndarray  # [C+1] offsets into sorted order
    order: jnp.ndarray  # [M] point indices sorted by cell
    max_per_cell: int  # static


def build_cell_grid(points: np.ndarray, mask: np.ndarray,
                    cell_size: float) -> CellGrid:
    """Host-side build (once per reference, like the reference's
    matcher->init kd-tree build, MatchersImpl.cpp:78-83)."""
    pts = np.asarray(points, np.float64)
    msk = np.asarray(mask, bool)
    valid_idx = np.flatnonzero(msk)
    vp = pts[valid_idx]
    if len(vp) == 0:
        vp = np.zeros((1, pts.shape[1]))
        valid_idx = np.zeros(1, np.int64)
    origin = vp.min(axis=0)
    coords = np.floor((vp - origin) / cell_size).astype(np.int64)
    dims = tuple(int(c) + 1 for c in coords.max(axis=0))
    lin = coords[:, 0]
    stride = dims[0]
    for a in range(1, pts.shape[1]):
        lin = lin + coords[:, a] * stride
        stride *= dims[a]
    num_cells = int(stride)
    sort = np.argsort(lin, kind="stable")
    order = valid_idx[sort]
    lin_sorted = lin[sort]
    cell_start = np.searchsorted(
        lin_sorted, np.arange(num_cells + 1)
    ).astype(np.int32)
    counts = np.diff(cell_start)
    max_per_cell = int(counts.max()) if len(counts) else 1
    # bucket the shape-carrying pieces so repeated registrations against
    # same-scale references share one compiled query program
    mc = 1
    while mc < max_per_cell:
        mc *= 2
    from ..cloud import bucket_size

    cs_cap = bucket_size(len(cell_start), 256)
    cs = np.full(cs_cap, cell_start[-1], np.int32)
    cs[: len(cell_start)] = cell_start
    ord_cap = bucket_size(max(len(order), 1), 256)
    ordp = np.zeros(ord_cap, np.int64)
    ordp[: len(order)] = order
    return CellGrid(
        origin=jnp.asarray(origin, jnp.float32),
        inv_cell=jnp.float32(1.0 / cell_size),
        dims=dims,
        cell_start=jnp.asarray(cs),
        order=jnp.asarray(ordp, jnp.int32),
        max_per_cell=max(mc, 1),
    )


def cell_knn(query, query_mask, ref_points, grid: CellGrid, max_dist: float,
             k: int = 1):
    """kNN of ``query`` [N,d] among grid-hashed reference points within
    ``max_dist``. → (dists2 [N,k] ascending, ids [N,k]); (+inf, -1) beyond
    the radius / for invalid queries."""
    return _cell_knn(
        query, query_mask, ref_points, grid.origin, grid.inv_cell,
        grid.cell_start, grid.order, max_dist,
        dims=grid.dims, mc=grid.max_per_cell, k=k,
    )


@functools.partial(jax.jit, static_argnames=("dims", "mc", "k"))
def _cell_knn(query, query_mask, ref_points, origin, inv_cell, cell_start,
              order, max_dist, *, dims, mc, k):
    n, d = query.shape
    # chunk the query axis so the [tile, 3^d, mc, d] candidate gather stays
    # bounded regardless of cloud size
    tile = 16384
    if n > tile:
        n_pad = ((n + tile - 1) // tile) * tile
        qp = jnp.pad(query, ((0, n_pad - n), (0, 0)))
        mp = jnp.pad(query_mask, (0, n_pad - n))

        def one(args):
            qt, mt = args
            return _cell_knn_tile(
                qt, mt, ref_points, origin, inv_cell, cell_start, order,
                max_dist, dims=dims, mc=mc, k=k,
            )

        bd, bi = jax.lax.map(
            one,
            (qp.reshape(-1, tile, d), mp.reshape(-1, tile)),
        )
        return bd.reshape(n_pad, k)[:n], bi.reshape(n_pad, k)[:n]
    return _cell_knn_tile(
        query, query_mask, ref_points, origin, inv_cell, cell_start, order,
        max_dist, dims=dims, mc=mc, k=k,
    )


@functools.partial(jax.jit, static_argnames=("dims", "mc", "k"))
def _cell_knn_tile(query, query_mask, ref_points, origin, inv_cell,
                   cell_start, order, max_dist, *, dims, mc, k):
    n, d = query.shape

    coords = jnp.floor((query - origin) * inv_cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray(dims, jnp.int32) - 1)

    # 3^d neighbor cell offsets
    if d == 3:
        offs = jnp.asarray(
            [(i, j, l) for i in (-1, 0, 1) for j in (-1, 0, 1)
             for l in (-1, 0, 1)], jnp.int32,
        )
    else:
        offs = jnp.asarray(
            [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)], jnp.int32
        )
    nb = coords[:, None, :] + offs[None, :, :]  # [N, 3^d, d]
    in_grid = jnp.all(
        jnp.logical_and(nb >= 0, nb < jnp.asarray(dims, jnp.int32)), axis=-1
    )
    nbc = jnp.clip(nb, 0, jnp.asarray(dims, jnp.int32) - 1)
    lin = nbc[..., 0]
    stride = dims[0]
    for a in range(1, d):
        lin = lin + nbc[..., a] * stride
        stride *= dims[a]

    start = cell_start[lin]  # [N, 3^d]
    end = cell_start[lin + 1]
    count = jnp.where(in_grid, end - start, 0)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, mc), 2)
    cand_pos = start[..., None] + slot  # [N, 3^d, mc]
    cand_valid = slot < count[..., None]
    cand_ids = order[jnp.clip(cand_pos, 0, order.shape[0] - 1)]
    cand_pts = ref_points[cand_ids]  # [N, 3^d, mc, d]

    diff = query[:, None, None, :] - cand_pts
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, jnp.inf)
    d2 = jnp.where(d2 <= jnp.float32(max_dist) ** 2, d2, jnp.inf)

    flat_d = d2.reshape(n, -1)
    flat_i = cand_ids.reshape(n, -1)
    if k == 1:
        best = jnp.argmin(flat_d, axis=1)
        bd = jnp.take_along_axis(flat_d, best[:, None], axis=1)
        bi = jnp.take_along_axis(flat_i, best[:, None], axis=1)
    else:
        neg, pos = jax.lax.top_k(-flat_d, k)
        bd = -neg
        bi = jnp.take_along_axis(flat_i, pos, axis=1)
    bd = jnp.where(query_mask[:, None], bd, jnp.inf)
    bi = jnp.where(jnp.isfinite(bd), bi, -1)
    return bd, bi
