"""Tile-sweep bounded-radius 1-NN: culling whose compute scales with the
candidates actually touched, not with padded worst cases.

This supersedes the ``cellblocks`` sweep as the large-cloud / serving
matcher backend. That design pads every query cell to the fullest cell's
query count Q and every reference cell to the fullest cell's occupancy M,
so its [Cq, Q, 3^d·M] sweep pays for max-occupancy twice — on skewed scans
the padding exceeds the dense sweep below ~10^5 points. Two changes remove
both paddings (reference contract unchanged: exact within ``maxDist``
given the ``motionBound`` invariant; behavioral contract
reference: MatchersImpl.cpp:78-150):

1. **Fixed 8-point sub-blocks.** The reference cloud is cell-sorted once
   and each cell's points are split into sub-blocks of 8 rows (last one
   padded). Occupancy skew costs at most 7 pad rows per *cell*, not
   (M_max − M_cell) rows per cell.
2. **Query tiles with per-tile candidate lists.** Queries are sorted by
   cell and grouped into fixed tiles of TQ consecutive (hence spatially
   coherent) queries. Each tile carries the deduplicated union of the
   sub-blocks of the 3^d neighborhoods of its query cells. Per-iteration
   device work is one dense ``[T, TQ, B·8]`` masked difference-form sweep
   whose reductions fuse into the producer (same no-materialize rule as
   ops/cellblocks.py); total cells ≈ Σ_tiles |union| · TQ · 8, i.e. the
   candidates the kd-tree would visit, padded only at tile granularity.

Host-side build/assignment is vectorized numpy throughout (argsort +
searchsorted + run-length expansion — no per-point or per-tile Python
loops), run once per reference / once per registration like the
reference's kd-tree build (reference: MatchersImpl.cpp:78-83).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SubBlocks", "TileAssign", "build_sub_blocks", "assign_tiles",
           "tile_nn1"]

SB = 8  # sub-block rows (f32 sublane width)


class SubBlocks(NamedTuple):
    """Cell-sorted reference in fixed 8-row sub-blocks (built at init)."""

    pts: jnp.ndarray      # [S+1, SB, d] sub-block coordinates (last: empty)
    ids: jnp.ndarray      # [S+1, SB] original row ids (-1 = pad)
    # host-side lookup state (numpy, never traced):
    ulins: np.ndarray     # [Cn] sorted linear ids of non-empty cells
    start: np.ndarray     # [Cn] first sub-block slot of each cell
    nsub: np.ndarray      # [Cn] sub-blocks of each cell
    pcount: np.ndarray    # [Cn] valid points of each cell (touch stats)
    origin: np.ndarray    # [d]
    cell_size: float
    dims: Tuple[int, ...]


class TileAssign(NamedTuple):
    """Per-registration query tiling (host-built at loop start)."""

    q_rows: jnp.ndarray   # [T, TQ] query row indices (-1 = pad)
    blocks: jnp.ndarray   # [T, B] sub-block slots (sentinel S = empty)
    touched: int          # actual (query, candidate) pairs per sweep


def _linearize(coords: np.ndarray, dims) -> np.ndarray:
    lin = coords[:, 0].copy()
    stride = int(dims[0])
    for a in range(1, coords.shape[1]):
        lin += coords[:, a] * stride
        stride *= int(dims[a])
    return lin


def build_sub_blocks(points: np.ndarray, mask: np.ndarray,
                     cell_size: float) -> SubBlocks:
    """Host build, once per reference — the kd-tree-build analogue."""
    pts = np.asarray(points, np.float64)
    valid = np.flatnonzero(np.asarray(mask, bool))
    d = pts.shape[1]
    if len(valid) == 0:
        return SubBlocks(
            pts=jnp.zeros((1, SB, d), jnp.float32),
            ids=jnp.full((1, SB), -1, jnp.int32),
            ulins=np.zeros(0, np.int64),
            start=np.zeros(0, np.int64),
            nsub=np.zeros(0, np.int64),
            pcount=np.zeros(0, np.int64),
            origin=np.zeros(d),
            cell_size=float(cell_size),
            dims=(1,) * d,
        )
    vp = pts[valid]
    origin = vp.min(axis=0)
    coords = np.floor((vp - origin) / cell_size).astype(np.int64)
    dims = tuple(int(c) + 1 for c in coords.max(axis=0))
    lin = _linearize(coords, dims)

    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    ulins, starts_pt, counts = np.unique(
        lin_sorted, return_index=True, return_counts=True
    )
    Cn = len(ulins)
    nsub = -(-counts // SB)                       # ceil(count / SB) per cell
    sub_start = np.concatenate([[0], np.cumsum(nsub)])[:-1]
    S = int(nsub.sum())

    # slot/rank of every point: cell's sub_start + within-cell rank
    rank = np.arange(len(order)) - np.repeat(starts_pt, counts)
    slot = np.repeat(sub_start, counts) + rank // SB
    sub_rank = rank % SB
    blocks = np.zeros((S + 1, SB, d), np.float32)
    ids = np.full((S + 1, SB), -1, np.int64)
    rows = valid[order]
    blocks[slot, sub_rank] = pts[rows]
    ids[slot, sub_rank] = rows

    return SubBlocks(
        pts=jnp.asarray(blocks),
        ids=jnp.asarray(ids, jnp.int32),
        ulins=ulins,
        start=sub_start,
        nsub=nsub,
        pcount=counts,
        origin=origin,
        cell_size=float(cell_size),
        dims=dims,
    )


def assign_tiles(query: np.ndarray, mask: np.ndarray, sub: SubBlocks,
                 tile_q: int = 256, pad_tiles_to: int = 0,
                 pad_blocks_to: int = 0) -> TileAssign:
    """Host assignment (loop start, static for the whole while_loop).

    Valid queries are sorted by their (unclamped) cell id — spatial
    coherence keeps per-tile candidate unions small — and grouped into
    tiles of ``tile_q``. Each tile's candidate list is the deduplicated
    union of the sub-blocks of the 3^d neighborhoods of its query cells.
    ``pad_tiles_to`` / ``pad_blocks_to`` force minimum output shapes (the
    serving path stacks assignments of several scans)."""
    pts = np.asarray(query, np.float64)
    d = pts.shape[1]
    S = int(sub.pts.shape[0]) - 1                 # sentinel slot
    keep = np.flatnonzero(np.asarray(mask, bool))
    from ..cloud import bucket_size

    if len(keep) == 0 or len(sub.ulins) == 0:
        T = max(1, pad_tiles_to)
        B = max(8, pad_blocks_to)
        return TileAssign(
            q_rows=jnp.full((T, tile_q), -1, jnp.int32),
            blocks=jnp.full((T, B), S, jnp.int32),
            touched=0,
        )

    coords = np.floor((pts[keep] - sub.origin) / sub.cell_size).astype(np.int64)
    # collision-free linearization over the query extent (cells may lie
    # outside the reference grid; no clamping — cellblocks.py's rule)
    lo = coords.min(axis=0)
    ext = tuple(int(e) + 1 for e in (coords.max(axis=0) - lo))
    qlin = _linearize(coords - lo, ext)
    order = np.argsort(qlin, kind="stable")
    rows_sorted = keep[order]
    qlin_sorted = qlin[order]

    nq = len(rows_sorted)
    T = -(-nq // tile_q)
    # granule 16: every 1-1.5-2 ladder value (16, 24, 32, 48, …) is a
    # multiple of 8, so the tile axis always divides a ≤8-device mesh
    # (parallel/sharding.py::sharded_tile_nn1 shards this axis)
    T_pad = max(int(bucket_size(T, granule=16)), pad_tiles_to)
    q_rows = np.full((T_pad, tile_q), -1, np.int64)
    q_rows.reshape(-1)[:nq] = rows_sorted

    # (tile, distinct query cell) pairs
    tile_of = np.arange(nq) // tile_q
    new_cell = np.empty(nq, bool)
    new_cell[0] = True
    new_cell[1:] = (qlin_sorted[1:] != qlin_sorted[:-1]) | (
        tile_of[1:] != tile_of[:-1]
    )
    pair_idx = np.flatnonzero(new_cell)            # [P]
    p_tile = tile_of[pair_idx]
    p_coord = coords[order[pair_idx]]              # [P, d] query-cell coords
    # how many queries in each (tile, cell) pair — for the touch statistic
    p_qcount = np.diff(np.concatenate([pair_idx, [nq]]))

    # 3^d neighborhoods → reference cell hits
    offs = np.stack(np.meshgrid(*([[-1, 0, 1]] * d), indexing="ij"),
                    axis=-1).reshape(-1, d)        # [O, d]
    nc = p_coord[:, None, :] + offs[None, :, :]    # [P, O, d]
    dims = np.asarray(sub.dims)
    in_grid = np.all((nc >= 0) & (nc < dims), axis=-1)
    nlin = _linearize(
        np.clip(nc, 0, dims - 1).reshape(-1, d), sub.dims
    ).reshape(len(p_coord), -1)                    # [P, O]
    pos = np.clip(np.searchsorted(sub.ulins, nlin), 0, len(sub.ulins) - 1)
    hit = in_grid & (sub.ulins[pos] == nlin)       # [P, O]

    # touch statistic: every query in a cell sweeps that cell's candidate
    # points (reference: MatchersImpl.cpp:86-101 visit counts)
    cand_pts = np.where(hit, sub.pcount[pos], 0).sum(axis=1)   # [P]
    touched = int((cand_pts * p_qcount).sum())

    # expand hit cells to their sub-block runs, tagged by tile
    hp = hit.reshape(-1)
    flat_pos = pos.reshape(-1)[hp]                 # reference cell index
    flat_tile = np.repeat(p_tile, hit.shape[1])[hp]
    run_len = sub.nsub[flat_pos]
    total = int(run_len.sum())
    # run-length expansion: sub-block slot list + owning tile
    base = np.repeat(sub.start[flat_pos], run_len)
    within = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(run_len)])[:-1], run_len
    )
    sub_slots = base + within
    sub_tiles = np.repeat(flat_tile, run_len)
    # dedup (tile, slot) — neighbor unions overlap across a tile's cells
    key = sub_tiles * np.int64(S + 1) + sub_slots
    ukey = np.unique(key)
    u_tile = ukey // (S + 1)
    u_slot = ukey % (S + 1)

    # scatter per-tile block lists
    t_starts = np.searchsorted(u_tile, np.arange(T_pad))
    t_counts = np.diff(np.concatenate([t_starts, [len(ukey)]]))
    B = int(bucket_size(max(int(t_counts.max()), 8), granule=8))
    B = max(B, pad_blocks_to)
    blocks = np.full((T_pad, B), S, np.int64)
    within_t = np.arange(len(ukey)) - np.repeat(t_starts[: T], t_counts[: T])
    blocks[u_tile, within_t] = u_slot

    return TileAssign(
        q_rows=jnp.asarray(q_rows, jnp.int32),
        blocks=jnp.asarray(blocks, jnp.int32),
        touched=touched,
    )


def tile_nn1(points: jnp.ndarray, qmask: jnp.ndarray,
             q_rows: jnp.ndarray, blocks: jnp.ndarray,
             sub_pts: jnp.ndarray, sub_ids: jnp.ndarray,
             max_dist: float):
    """Exact bounded-radius 1-NN of ``points`` [N, d] through the static
    tile assignment (traceable; runs inside the fused ICP loop).

    Returns ``(dists2 [N], ids [N])`` with ``(+inf, -1)`` beyond the
    radius, for rows absent from the assignment, and for masked rows."""
    n, d = points.shape
    T, TQ = q_rows.shape
    B = blocks.shape[1]

    q = points[jnp.maximum(q_rows, 0)]                     # [T, TQ, d]
    cand = sub_pts[blocks].reshape(T, B * SB, d)           # block gather
    cid = sub_ids[blocks].reshape(T, B * SB)

    # difference-form distances; min and argmin fuse into the producer —
    # never materialize [T, TQ, B·SB] (ops/cellblocks.py measured an HBM
    # round trip at 86 ms when take_along_axis forced it)
    diff = q[:, :, None, :] - cand[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)                     # [T, TQ, B·SB]
    d2 = jnp.where(cid[:, None, :] >= 0, d2, jnp.inf)
    d2 = jnp.where(d2 <= jnp.float32(max_dist) ** 2, d2, jnp.inf)

    bd = jnp.min(d2, axis=2)                               # [T, TQ]
    best = jnp.argmin(d2, axis=2)
    bi = jnp.take_along_axis(cid, best, axis=1)            # [T, TQ]
    bi = jnp.where(jnp.isfinite(bd), bi, -1)

    out_d = jnp.full((n,), jnp.inf, jnp.float32)
    out_i = jnp.full((n,), -1, jnp.int32)
    flat = q_rows.reshape(-1)
    ok = flat >= 0
    idx = jnp.where(ok, flat, n)
    out_d = out_d.at[idx].set(
        jnp.where(ok, bd.reshape(-1), jnp.inf), mode="drop"
    )
    out_i = out_i.at[idx].set(
        jnp.where(ok, bi.reshape(-1), -1), mode="drop"
    )
    out_d = jnp.where(qmask, out_d, jnp.inf)
    out_i = jnp.where(qmask, out_i, -1)
    return out_d, out_i
