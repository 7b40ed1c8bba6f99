"""Block-grid bounded-radius 1-NN: dense cell-block sweeps, no per-point
random gathers.

``cellgrid.py``'s per-query neighbor gather is exact but random-gather bound
on TPU (measured slower than the dense brute sweep below ~1M points). This
module removes the per-point gathers with two observations:

1. **Reference blocks are static**: sort the reference by cell once at
   matcher init and pad each non-empty cell to the fullest cell's size — a
   compact ``[Cn+1, M, d]`` tensor (last block = empty sentinel). Candidate
   lookup becomes a *block* gather of contiguous rows.
2. **Query cells can be assigned once per registration**: inside the ICP
   loop points move by at most the total correction. Assigning query cells
   at loop start from the initial positions, with the cell edge inflated to
   ``maxDist + motion_bound``, keeps the 3^d neighborhood a superset of the
   true ``maxDist`` ball for every iteration — so the assignment (and with
   it every shape) is static for the whole ``lax.while_loop``, computed
   host-side exactly like the reference's per-registration kd-tree build
   (reference: MatchersImpl.h:69-120 builds a libnabo tree in init()).

Per iteration the on-device work is one ``[Cq, Q, 3^d*M]`` difference-form
distance sweep — pure streaming VPU math over dense blocks. Everything is
O(points); no array scales with grid volume (sparse-cloud safe).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RefBlocks", "QueryBlocks", "build_ref_blocks",
           "assign_query_blocks", "block_nn1"]


def _round8(n: int) -> int:
    return max(((n + 7) // 8) * 8, 8)


class RefBlocks(NamedTuple):
    """Compact cell-sorted reference (host-built, static per init)."""

    blocks: jnp.ndarray      # [Cn+1, M, d] padded cell contents (last = empty)
    block_ids: jnp.ndarray   # [Cn+1, M] original row ids (-1 = pad)
    # host-side lookup state (numpy, never traced):
    ulins: np.ndarray        # [Cn] sorted linear ids of non-empty cells
    origin: np.ndarray       # [d] grid origin
    cell_size: float
    dims: Tuple[int, ...]    # grid extent in cells (bounds checks only)
    counts: np.ndarray = None  # [Cn+1] valid points per slot (sentinel: 0)


class QueryBlocks(NamedTuple):
    """Per-registration query grouping (host-built at loop start)."""

    rows: jnp.ndarray        # [Cq, Q] query row indices (-1 = pad)
    nb_slots: jnp.ndarray    # [Cq, 3^d] slots into RefBlocks.blocks
    # host-side int: actual (query, candidate) pairs swept per iteration —
    # the analogue of libnabo's touch statistics (reference:
    # MatchersImpl.cpp:86-101 accumulates per-query visit counts)
    touched: int = 0


def _linearize(coords: np.ndarray, dims: Tuple[int, ...]) -> np.ndarray:
    lin = coords[:, 0].copy()
    stride = dims[0]
    for a in range(1, len(dims)):
        lin += coords[:, a] * stride
        stride *= dims[a]
    return lin


def build_ref_blocks(points: np.ndarray, mask: np.ndarray,
                     cell_size: float) -> RefBlocks:
    """Host build, once per reference — the kd-tree-build analogue."""
    pts = np.asarray(points, np.float64)
    valid = np.flatnonzero(np.asarray(mask, bool))
    d = pts.shape[1]
    if len(valid) == 0:
        return RefBlocks(
            blocks=jnp.zeros((1, 8, d), jnp.float32),
            block_ids=jnp.full((1, 8), -1, jnp.int32),
            ulins=np.zeros(0, np.int64),
            origin=np.zeros(d),
            cell_size=float(cell_size),
            dims=(1,) * d,
            counts=np.zeros(1, np.int64),
        )
    vp = pts[valid]
    origin = vp.min(axis=0)
    coords = np.floor((vp - origin) / cell_size).astype(np.int64)
    dims = tuple(int(c) + 1 for c in coords.max(axis=0))
    lin = _linearize(coords, dims)

    order = np.argsort(lin, kind="stable")
    lin_sorted = lin[order]
    ulins, starts, counts = np.unique(
        lin_sorted, return_index=True, return_counts=True
    )
    Cn = len(ulins)
    M = _round8(int(counts.max()))

    # vectorized fill: rank of each point within its cell
    rank = np.arange(len(order)) - np.repeat(starts, counts)
    slot = np.repeat(np.arange(Cn), counts)
    blocks = np.zeros((Cn + 1, M, d), np.float32)
    block_ids = np.full((Cn + 1, M), -1, np.int64)
    rows = valid[order]
    blocks[slot, rank] = pts[rows]
    block_ids[slot, rank] = rows
    blocks[Cn] = 0.0
    block_ids[Cn] = -1

    return RefBlocks(
        blocks=jnp.asarray(blocks),
        block_ids=jnp.asarray(block_ids, jnp.int32),
        ulins=ulins,
        origin=origin,
        cell_size=float(cell_size),
        dims=dims,
        counts=np.concatenate([counts, [0]]),
    )


def assign_query_blocks(query: np.ndarray, mask: np.ndarray,
                        ref: RefBlocks) -> QueryBlocks:
    """Host assignment of queries to grid cells (loop start, static after).

    Exactness: a query's candidate set is the 3^d cell neighborhood around
    its *unclamped* cell coordinates; out-of-grid or empty neighbor cells
    resolve to the empty sentinel block. No coordinate clamping — clamping
    could alias far-away queries onto border cells."""
    pts = np.asarray(query, np.float64)
    d = pts.shape[1]
    dims = np.asarray(ref.dims)
    coords = np.floor((pts - ref.origin) / ref.cell_size).astype(np.int64)

    keep = np.flatnonzero(np.asarray(mask, bool))
    if len(keep) == 0:
        O = 3 ** d
        return QueryBlocks(
            rows=jnp.full((1, 8), -1, jnp.int32),
            nb_slots=jnp.full((1, O), len(ref.ulins), jnp.int32),
        )
    kc = coords[keep]
    # group by (possibly out-of-grid) cell coordinate tuple: shift into a
    # positive range so linearization is collision-free
    lo = kc.min(axis=0)
    ext = tuple(int(e) + 1 for e in (kc.max(axis=0) - lo))
    qlin = _linearize(kc - lo, ext)
    order = np.argsort(qlin, kind="stable")
    qlin_sorted = qlin[order]
    uq, starts, counts = np.unique(
        qlin_sorted, return_index=True, return_counts=True
    )
    # bucket both block axes so repeated registrations of similar clouds
    # reuse the same compiled fused loop (same ladder as cloud.bucket_size;
    # Q uses a granule-8 ladder — its max-count jitters with the sampling
    # seed, and any shape change recompiles the whole loop)
    from ..cloud import bucket_size

    Cq = int(bucket_size(len(uq)))
    Q = int(bucket_size(int(counts.max()), granule=8))
    rows = np.full((Cq, Q), -1, np.int64)
    rank = np.arange(len(order)) - np.repeat(starts, counts)
    qslot = np.repeat(np.arange(len(uq)), counts)
    rows[qslot, rank] = keep[order]

    # representative coordinates per distinct query cell
    rep = kc[order[starts]]                              # [Cq, d]
    offs = np.stack(np.meshgrid(*([[-1, 0, 1]] * d), indexing="ij"),
                    axis=-1).reshape(-1, d)              # [3^d, d]
    nc = rep[:, None, :] + offs[None, :, :]              # [Cq, 3^d, d]
    in_grid = np.all((nc >= 0) & (nc < dims), axis=-1)   # [Cq, 3^d]
    nlin = _linearize(
        np.clip(nc, 0, dims - 1).reshape(-1, d), ref.dims
    ).reshape(len(uq), -1)
    # map linear cell id -> compact slot via the sorted non-empty list
    Cn = len(ref.ulins)
    if Cn == 0:
        slots = np.zeros_like(nlin)                      # all sentinel (0)
    else:
        pos = np.clip(np.searchsorted(ref.ulins, nlin), 0, Cn - 1)
        hit = in_grid & (ref.ulins[pos] == nlin)
        slots = np.where(hit, pos, Cn)                   # miss -> sentinel

    full_slots = np.full((Cq, slots.shape[1]), max(Cn, 0), np.int64)
    full_slots[: len(uq)] = slots
    # touch statistics: every valid query in a cell sweeps that cell's
    # candidate set (= Σ valid counts of its non-empty neighbor slots) —
    # the reference accumulates the same per-query visit counts out of
    # libnabo (reference: MatchersImpl.cpp:86-101)
    if ref.counts is not None:
        cand_per_cell = ref.counts[slots].sum(axis=1)     # [uq]
        touched = int((cand_per_cell * counts).sum())
    else:
        touched = 0
    return QueryBlocks(
        rows=jnp.asarray(rows, jnp.int32),
        nb_slots=jnp.asarray(full_slots, jnp.int32),
        touched=touched,
    )


def block_nn1(points: jnp.ndarray, qb: QueryBlocks,
              blocks: jnp.ndarray, block_ids: jnp.ndarray,
              max_dist: float):
    """Exact bounded-radius 1-NN of ``points`` [N, d] using the static block
    structure (traceable; runs inside the fused ICP loop).

    Returns ``(dists2 [N], ids [N])`` with ``(+inf, -1)`` beyond the radius
    or for rows not present in ``qb``."""
    n, d = points.shape
    rows = qb.rows                                        # [Cq, Q]
    q_pts = points[jnp.maximum(rows, 0)]                  # [Cq, Q, d]
    cand = blocks[qb.nb_slots]                            # [Cq, O, M, d]
    cand_ids = block_ids[qb.nb_slots]                     # [Cq, O, M]
    Cq, O, M, _ = cand.shape
    cand = cand.reshape(Cq, O * M, d)
    cand_ids = cand_ids.reshape(Cq, O * M)

    # The [Cq, Q, OM] distance tensor is huge (GBs at 10^5 points); it must
    # stay fused into its reductions, never materialized in HBM. min and
    # argmin both fuse into the difference-form producer (XLA duplicates
    # the fused producer per reduction — 2x FLOPs, which is far cheaper
    # than one HBM round trip); the id lookup is then a tiny [Cq, Q]
    # gather from the [Cq, OM] id table. take_along_axis on the distance
    # tensor itself would force the materialization — do not reintroduce.
    diff = q_pts[:, :, None, :] - cand[:, None, :, :]     # [Cq, Q, OM, d]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_ids[:, None, :] >= 0, d2, jnp.inf)
    d2 = jnp.where(d2 <= jnp.float32(max_dist) ** 2, d2, jnp.inf)

    bd = jnp.min(d2, axis=2)                              # [Cq, Q]
    best = jnp.argmin(d2, axis=2)                         # [Cq, Q]
    bi = jnp.take_along_axis(cand_ids, best, axis=1)      # [Cq, Q]
    bi = jnp.where(jnp.isfinite(bd), bi, -1)

    out_d = jnp.full((n,), jnp.inf, jnp.float32)
    out_i = jnp.full((n,), -1, jnp.int32)
    flat = rows.reshape(-1)
    ok = flat >= 0
    idx = jnp.where(ok, flat, n)
    out_d = out_d.at[idx].set(
        jnp.where(ok, bd.reshape(-1), jnp.inf), mode="drop"
    )
    out_i = out_i.at[idx].set(
        jnp.where(ok, bi.reshape(-1), -1), mode="drop"
    )
    return out_d, out_i
