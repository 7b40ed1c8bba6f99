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

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["SubBlocks", "TileAssign", "build_sub_blocks", "assign_tiles",
           "gather_candidates", "tile_nn1", "tile_nn1_from_candidates",
           "tile_knnk_from_candidates", "TILE_KNN_MAX"]

#: largest k served by the tile-sweep top-k kernel (matches the dense
#: kernel's KNNK_MAX; per-chunk extraction cost grows ~linearly in k —
#: raised 16 -> 32 in round 4 with exactness tests at k=24; beyond it the
#: XLA scan serves, still exact)
TILE_KNN_MAX = 32

SB = 8  # sub-block rows (f32 sublane width)

#: sub-blocks per GATHER UNIT (the granularity of the per-registration
#: candidate-table gather). The cell-sorted slot lists of a tile union
#: are almost perfect runs, so gathering 64-row units instead of 8-row
#: slots cuts the gather's row count ~7x for ~+11% padded candidate rows
#: (measured at the 1e5/4e5 terrain serving scenes, round 5) — and TPU
#: gathers pay per ROW (scalar-core addressing), so the unit gather
#: brought the in-program table build from ~73 to ~15 ms/batch at 4e5.
#: Exactness: a unit's extra rows belong to cells outside the union, and
#: any point within maxDist provably lies IN the union (cell edge >=
#: maxDist + motionBound), so extras are strictly beyond maxDist and the
#: post-kernel radius mask removes them before they can displace a real
#: neighbor (distances rank them last among unmasked candidates).
GATHER_G = 8


class SubBlocks(NamedTuple):
    """Cell-sorted reference in fixed 8-row sub-blocks (built at init)."""

    pts: jnp.ndarray      # [S+1, SB, d] sub-block coordinates (last: empty)
    ids: jnp.ndarray      # [S+1, SB] original row ids (-1 = pad)
    #: [U+1, GATHER_G·SB, d+1] fused gather-unit table: unit u covers
    #: slots [u·G, (u+1)·G); channel d carries the original row id as f32
    #: (exact below 2^24, guarded at build; -1 = pad). Row U is the
    #: reserved ALL-PAD unit assignment padding points at.
    units: jnp.ndarray
    # host-side lookup state (numpy, never traced):
    ulins: np.ndarray     # [Cn] sorted linear ids of non-empty cells
    start: np.ndarray     # [Cn] first sub-block slot of each cell
    nsub: np.ndarray      # [Cn] sub-blocks of each cell
    pcount: np.ndarray    # [Cn] valid points of each cell (touch stats)
    origin: np.ndarray    # [d]
    cell_size: float
    dims: Tuple[int, ...]


class TileAssign(NamedTuple):
    """Per-registration query tiling (host-built at loop start).

    ``blocks`` is indexed by *virtual* tile (a parent tile whose candidate
    union exceeds ``block_cap`` is split into consecutive cap-sized
    chunks). Everything the per-iteration path touches is laid out so the
    loop needs NO element-granularity gathers — TPU element gathers run
    at ~127 M elem/s (scalar-core rate; measured 17 ms/iter at batch 8
    when the merge was a [N, K] gather): queries are gathered once per
    *parent* tile and expanded to virtual tiles by row-gather
    (vectorizes), candidate ids resolve inside the kernel, and the
    vtile→parent merge reads whole consecutive rows (``vbase``)."""

    q_rows: jnp.ndarray   # [Tp, TQ] PARENT-tile query rows (-1 = pad)
    blocks: jnp.ndarray   # [Tv, B] virtual-tile GATHER-UNIT indices into
    #                       SubBlocks.units (the all-pad unit U = pad)
    touched: int          # actual (query, candidate) pairs per sweep
    parent: jnp.ndarray   # [Tv] parent tile of each virtual tile
    #: [K, Tp] virtual-tile row to read at merge step j (clamped to the
    #: parent's last vtile; candidate-less parents point at the reserved
    #: all-pad vtile). K is the merge depth — static via the array shape.
    vrows: jnp.ndarray

    def vtile_q_rows(self) -> jnp.ndarray:
        """Query rows expanded per VIRTUAL tile [Tv, TQ] (the layout the
        sharded path slices across devices)."""
        return self.q_rows[self.parent]


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
    if pts.shape[0] >= 1 << 24:
        # candidate row ids ride an f32 row of the fused candidate table
        # (_gather_candidates); beyond 2^24 they stop being float-exact
        raise ValueError(
            "tile sweep supports references below 2^24 rows "
            f"(got {pts.shape[0]}); shard the cloud instead"
        )
    if len(valid) == 0:
        empty_units = np.zeros((2, GATHER_G * SB, d + 1), np.float32)
        empty_units[..., d] = -1.0
        return SubBlocks(
            pts=jnp.zeros((1, SB, d), jnp.float32),
            ids=jnp.full((1, SB), -1, jnp.int32),
            units=jnp.asarray(empty_units),
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

    # fused gather-unit table (see GATHER_G): slots padded to a multiple
    # of G, plus one reserved all-pad unit at the end
    U = -(-(S + 1) // GATHER_G)
    units = np.zeros(((U + 1) * GATHER_G * SB, d + 1), np.float32)
    units[..., d] = -1.0
    flat_n = (S + 1) * SB
    units[:flat_n, :d] = blocks.reshape(flat_n, d)
    units[:flat_n, d] = ids.reshape(flat_n)
    units = units.reshape(U + 1, GATHER_G * SB, d + 1)

    return SubBlocks(
        pts=jnp.asarray(blocks),
        ids=jnp.asarray(ids, jnp.int32),
        units=jnp.asarray(units),
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
                 pad_blocks_to: int = 0, block_cap: int = 1024,
                 to_device: bool = True) -> TileAssign:
    """Host assignment (loop start, static for the whole while_loop).

    Valid queries are sorted by their (unclamped) cell id — spatial
    coherence keeps per-tile candidate unions small — and grouped into
    tiles of ``tile_q``. Each tile's candidate list is the deduplicated
    union of the sub-blocks of the 3^d neighborhoods of its query cells.
    ``pad_tiles_to`` / ``pad_blocks_to`` force minimum output shapes (the
    serving path stacks assignments of several scans).

    ``block_cap`` bounds the candidate axis: a tile whose union exceeds
    ``block_cap`` candidate rows is split into *virtual tiles* sharing its
    query rows, each carrying a ``block_cap``-row chunk of the union. The
    sweep's padded work is then Σ_t ceil(union_t / cap)·cap·TQ instead of
    T·max_t(union_t)·TQ — on skewed scans the global max is the dominant
    padding source (measured on the 25k-pt car pair at cell edge 1.5:
    101M padded cells without the split vs 31M with cap=1024, vs 13.8M
    actually touched; tools/tile_union_analysis.py). Exactness is
    preserved by min-merging virtual-tile results per query row
    (:func:`tile_nn1_from_candidates`).

    ``to_device=False`` keeps the output arrays as host numpy: the batch
    and queue serving drivers pad + stack many assignments host-side and
    ship ONE transfer per call — per-scan eager device conversion here
    measured ~250 ms/batch of relay dispatch overhead at the 4e5-map
    serving shape (tools/tile_phase_profile.py, round 5)."""
    pts = np.asarray(query, np.float64)
    d = pts.shape[1]
    S = int(sub.pts.shape[0]) - 1                 # sentinel slot
    keep = np.flatnonzero(np.asarray(mask, bool))
    from ..cloud import bucket_size

    U = int(sub.units.shape[0]) - 1          # the reserved all-pad unit
    if len(keep) == 0 or len(sub.ulins) == 0:
        T = max(16, pad_tiles_to)
        B = max(16, pad_blocks_to)
        conv = jnp.asarray if to_device else np.asarray
        return TileAssign(
            q_rows=conv(np.full((T, tile_q), -1, np.int32)),
            blocks=conv(np.full((T, B), U, np.int32)),
            touched=0,
            parent=conv(np.zeros((T,), np.int32)),
            vrows=conv(np.full((1, T), T - 1, np.int32)),
        )

    coords = np.floor((pts[keep] - sub.origin) / sub.cell_size).astype(np.int64)
    # sort queries in Morton (z-order) of their cell so each tile of TQ
    # consecutive queries covers a compact spatial blob — the candidate
    # union per tile stays small (cells may lie outside the reference
    # grid; no clamping — cellblocks.py's rule)
    lo = coords.min(axis=0)
    qlin = _morton(coords - lo).astype(np.int64)
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
    # dedup (tile, GATHER UNIT) — neighbor unions overlap across a tile's
    # cells, and consecutive slots collapse onto the same 64-row unit
    # (see GATHER_G: ~7x fewer gather rows for ~+11% padded candidates)
    key = sub_tiles * np.int64(U + 1) + sub_slots // GATHER_G
    ukey = np.unique(key)
    u_tile = ukey // (U + 1)
    u_unit = ukey % (U + 1)

    # scatter per-(virtual-)tile unit lists. The candidate axis
    # B·GATHER_G·SB must be a multiple of 128 (pallas lane width): with
    # 64-row units that means B even — the granule-4 ladder (4, 6, 8, 12,
    # 16, 24, 32, …) satisfies it.
    t_starts = np.searchsorted(u_tile, np.arange(T_pad))
    t_counts = np.diff(np.concatenate([t_starts, [len(ukey)]]))
    within_t = np.arange(len(ukey)) - np.repeat(t_starts, t_counts)
    # capu must keep M = capu·G·SB a multiple of 128 when the split makes
    # B == capu: round down to an even unit count (blockCap values that
    # are not multiples of 128, e.g. 1000, are legal per the Param).
    capu = max((block_cap // (SB * GATHER_G)) // 2 * 2, 2)
    maxc = max(int(t_counts.max()), 1)

    # virtual-tile split: parent tile t becomes ceil(count_t / capu)
    # consecutive virtual tiles (maxc ≤ capu degenerates to one each);
    # parents with zero candidates point at the reserved all-pad virtual
    # tile Tv (pen +inf everywhere → (+inf, -1))
    k_t = -(-t_counts // capu)
    vbase = np.concatenate([[0], np.cumsum(k_t)])[:-1]
    Tv = int(k_t.sum())
    # + 1 reserves the all-pad vtile; bucket granule 16 keeps the tile
    # axis mesh-divisible (parallel/sharding.py::sharded_tile_nn1)
    Tv_pad = max(int(bucket_size(Tv + 1, granule=16)), pad_tiles_to)
    parent = np.zeros(Tv_pad, np.int64)
    parent[:Tv] = np.repeat(np.arange(T_pad), k_t)
    B = min(int(bucket_size(maxc, granule=4)), capu)
    if B > 32:
        B = -(-B // 32) * 32
    B = max(B, pad_blocks_to)
    blocks = np.full((Tv_pad, B), U, np.int64)
    blocks[vbase[u_tile] + within_t // capu, within_t % capu] = u_unit
    vb = np.full(T_pad, Tv, np.int64)   # Tv = the reserved all-pad vtile
    has = k_t > 0
    vb[has] = vbase[has]
    K = max(int(k_t.max()), 1)
    # merge rows beyond a parent's own vtile count point at the reserved
    # all-pad vtile (all +inf): a no-op for the 1-NN min merge AND for the
    # k-list merge — clamping to the parent's last vtile instead would
    # merge the same sorted list twice, duplicating entries in a k-list
    vcand = vb[None, :] + np.arange(K)[:, None]
    last = vb + np.maximum(k_t, 1) - 1
    vrows = np.where(vcand <= last[None, :], vcand, Tv)

    if not to_device:
        return TileAssign(
            q_rows=np.asarray(q_rows, np.int32),
            blocks=np.asarray(blocks, np.int32),
            touched=touched,
            parent=np.asarray(parent, np.int32),
            vrows=np.asarray(vrows, np.int32),
        )
    return TileAssign(
        q_rows=jnp.asarray(q_rows, jnp.int32),
        blocks=jnp.asarray(blocks, jnp.int32),
        touched=touched,
        parent=jnp.asarray(parent, jnp.int32),
        vrows=jnp.asarray(vrows, jnp.int32),
    )


_DPAD = 8  # coordinate dim padded to the f32 sublane width
_PEN_ROW = _DPAD - 2  # candidate-table row carrying the pad penalty
_CID_ROW = _DPAD - 1  # candidate-table row carrying the original row id


@jax.jit
def _gather_candidates(sub_units, blocks):
    T, B = blocks.shape
    d = sub_units.shape[-1] - 1
    rows = sub_units.shape[1]                 # GATHER_G · SB
    g = sub_units[blocks]                     # [T, B, G·SB, d+1] ONE gather
    M = B * rows
    cand = g[..., :d].reshape(T, M, d)
    cidf = g[..., d].reshape(T, 1, M)
    cand_t = jnp.zeros((T, _DPAD, M), jnp.float32)
    cand_t = cand_t.at[:, :d, :].set(jnp.swapaxes(cand, 1, 2))
    pen = jnp.where(cidf >= 0, 0.0, jnp.inf)
    # Rows _PEN_ROW/_CID_ROW of the (already sublane-padded) table carry
    # the pad penalty and the candidate's original row id (float-exact:
    # ids < 2^24, guarded in build_sub_blocks), so the 1-NN kernel reads
    # ONE fused operand: separate [T, 1, M] pen/cid operands sublane-pad
    # 1→8 in VMEM and accounted for ~half of a measured scoped-vmem
    # compile OOM at the batched serving shape (round 3).
    cand_t = cand_t.at[:, _PEN_ROW, :].set(pen[:, 0, :])
    cand_t = cand_t.at[:, _CID_ROW, :].set(cidf[:, 0, :])
    return cand_t, pen, cidf.astype(jnp.int32)


def gather_candidates(sub: SubBlocks, blocks: jnp.ndarray):
    """Materialize a tile assignment's candidate tables, once per
    registration (one jitted device program — eager dispatch costs several
    relay round-trips; measured seconds at 10^5 tiles·slots): returns
    ``(cand_t [T, 8, M], pen [T, 1, M], cid [T, 1, M])``, M = B·G·SB, in
    the kernel's transposed lane-contiguous layout. ONE row gather from
    the fused 64-row unit table (coords + ids together — TPU gathers pay
    per row, see GATHER_G). Candidates are loop-static, so the
    per-iteration sweep never gathers."""
    return _gather_candidates(sub.units, blocks)


def _morton(coords: np.ndarray) -> np.ndarray:
    """Z-order key of nonnegative integer cell coords [N, d] (d ∈ {2, 3}).

    Queries are tiled in this order: consecutive queries then occupy a
    compact spatial blob instead of a row-major line, which shrinks each
    tile's candidate-union (measured 61x padded-vs-touched with row-major
    linear order at 10^5 uniform points)."""
    d = coords.shape[1]

    def spread3(x):
        x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    def spread2(x):
        x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        x = (x | (x << 16)) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << 8)) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << 2)) & np.uint64(0x3333333333333333)
        x = (x | (x << 1)) & np.uint64(0x5555555555555555)
        return x

    if d == 3:
        return (spread3(coords[:, 0])
                | (spread3(coords[:, 1]) << np.uint64(1))
                | (spread3(coords[:, 2]) << np.uint64(2)))
    return (spread2(coords[:, 0])
            | (spread2(coords[:, 1]) << np.uint64(1)))


def _tile_nn1_kernel(q_ref, rt_ref, out_d_ref, out_i_ref, *, dim, nj, tb):
    """Chunked running-min sweep over ``tb`` tiles per grid step (same
    reduction structure as ops/knn_pallas._nn1_kernel). All per-chunk ops
    are 3-D [tb, TQ, 128] broadcasts — the tile axis rides inside one
    vector op instead of a Python loop, so raising ``tb`` shrinks the
    grid (the per-step overhead dominated the sweep: 512 grid steps cost
    ~6 ms/iter at batch 8 regardless of cell count) without growing the
    instruction stream. The [TQ, B·SB] distance block lives only in VMEM
    — the pure-XLA formulation materialized the full [T, TQ, B·SB]
    tensor to HBM at ≥4·10^5 points (measured 25.8 GB allocation, OOM;
    tools/large_knn_bench.py).

    The candidate's ORIGINAL ROW ID (``cid_ref``) is carried through the
    running min instead of its flat sweep position: resolving positions
    to ids afterwards was a [rows] element-gather in XLA — scalar-core
    rate, 3.3 ms/iter at batch 8 (tools/tile_serve_micro.py trace).

    VMEM discipline (the round-3 scoped-vmem OOM, measured at both the
    batched serving shape and the plain TQ=64 shape): running state
    across candidate steps (``j``) lives in the REVISITED OUTPUT BLOCKS
    (the _tile_nnk_kernel idiom), not declared scratch — vmap batches
    declared scratch shapes with the batch axis. The pad penalty and the
    candidate row ids ride rows _PEN_ROW/_CID_ROW of the one fused
    candidate operand instead of separate [T, 1, M] operands (sublane
    padding 1→8 made those as large as the table itself). Ids flow as
    f32 (exact below 2^24, guarded at build) and cast once at the end.
    The per-lane best is per-STEP state in registers; the cross-lane
    reduction runs once per step (almost always nj == 1: tile_m caps at
    2048 and blockCap rarely exceeds it)."""
    j = pl.program_id(1)
    tile_m = rt_ref.shape[2]

    nch = tile_m // 128
    best_d = None
    best_i = None
    qcols = [q_ref[:, :, c][:, :, None] for c in range(dim)]  # [tb, TQ, 1]
    for ch in range(nch):
        sl = slice(ch * 128, (ch + 1) * 128)
        d2 = rt_ref[:, _PEN_ROW, sl][:, None, :]  # [tb, 1, 128] broadcasts
        for c in range(dim):
            diff = qcols[c] - rt_ref[:, c, sl][:, None, :]
            d2 = d2 + diff * diff
        cidf = rt_ref[:, _CID_ROW, sl][:, None, :]
        if best_d is None:
            shape = (d2.shape[0], q_ref.shape[1], d2.shape[2])
            best_d = jnp.broadcast_to(d2, shape)
            best_i = jnp.broadcast_to(cidf, shape)
        else:
            take = d2 < best_d
            best_d = jnp.where(take, d2, best_d)
            best_i = jnp.where(take, cidf, best_i)
    td = jnp.min(best_d, axis=2)                 # [tb, TQ]
    lane = jnp.argmin(best_d, axis=2).astype(jnp.int32)
    rid = jnp.sum(
        jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, best_d.shape, 2)
            == lane[:, :, None],
            best_i, 0.0,
        ),
        axis=2,
    ).astype(jnp.int32)
    rid = jnp.where(jnp.isfinite(td), rid, -1)

    if nj == 1:
        out_d_ref[:, 0, :] = td
        out_i_ref[:, 0, :] = rid
    else:
        @pl.when(j == 0)
        def _():
            out_d_ref[:, 0, :] = td
            out_i_ref[:, 0, :] = rid

        @pl.when(j > 0)
        def _():
            cur_d = out_d_ref[:, 0, :]
            take = td < cur_d
            out_d_ref[:, 0, :] = jnp.where(take, td, cur_d)
            out_i_ref[:, 0, :] = jnp.where(take, rid, out_i_ref[:, 0, :])


def _pick_tb(T, TQ, tile_m):
    """Largest tiles-per-step dividing T within a VMEM budget, modelled at
    PADDED layouts (fewer grid steps = less per-step overhead; see kernel
    docstring). The budget leaves headroom under the 16 MB scoped-vmem
    limit for XLA's own stack in the surrounding loop body: the round-3
    compile OOM came from underestimating exactly these paddings (q's
    8-wide coordinate minor dim occupies full 128-lane vregs in VMEM),
    and XLA places the kernel's full [T, 1, TQ] result tuple on the same
    scoped stack when it feeds in-loop consumers (measured: +6.3 MB at
    the batched T=384, TQ=256 serving shape)."""
    budget = 5 * 2**20
    for tb in (64, 32, 16, 8, 4):
        if T % tb:
            continue
        need = 4 * tb * (
            2 * (TQ * 128          # q window, minor dim lane-padded 8→128
                 + _DPAD * tile_m)  # fused candidate window (+pen +cid rows)
            + 4 * TQ * 128         # best_d/best_i + d2/diff live temps
            + 2 * 2 * 8 * 128      # output windows, unit dims padded
        )
        if need <= budget:
            return tb
    return 8


def _tile_sweep_pallas(q, cand_t, pen, cid, *, dim):
    """(q [T, TQ, DPAD], cand_t [T, DPAD, M] with pen/cid fused into rows
    _PEN_ROW/_CID_ROW — the separate pen/cid args are unused here, kept
    for signature parity with the XLA fallback)
    → per-tile best (dists2 [T, TQ], candidate ORIGINAL ROW id [T, TQ])."""
    del pen, cid  # fused into cand_t rows (see _gather_candidates)
    T, TQ, _ = q.shape
    M = cand_t.shape[2]
    tile_m = min(M, 2048)
    assert M % tile_m == 0 and tile_m % 128 == 0, (M, tile_m)
    tb = _pick_tb(T, TQ, tile_m)
    assert T % tb == 0, T  # assign_tiles' granule-16 ladder guarantees it
    nj = M // tile_m
    out_d, out_i = pl.pallas_call(
        functools.partial(_tile_nn1_kernel, dim=dim, nj=nj, tb=tb),
        grid=(T // tb, nj),
        in_specs=[
            pl.BlockSpec((tb, TQ, _DPAD), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, _DPAD, tile_m), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # unit middle dim: Mosaic wants the last two block dims
            # divisible by (8, 128) or equal to the array dims
            pl.BlockSpec((tb, 1, TQ), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, TQ), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, TQ), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, TQ), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(3 * dim + 4) * T * TQ * M,
            bytes_accessed=4 * T * M * _DPAD + 4 * T * TQ * _DPAD,
            transcendentals=0,
        ),
    )(q, cand_t)
    return out_d[:, 0, :], out_i[:, 0, :]


def _tile_sweep_xla(q, cand_t, pen, cid, *, dim):
    """CPU / interpret fallback: per-tile lax.map keeps the distance block
    at [TQ, M] instead of [T, TQ, M]."""

    def one(args):
        qt, ct, pn, ci = args
        d2 = pn[0][None, :]
        for c in range(dim):
            d2 = d2 + (qt[:, c][:, None] - ct[c, :][None, :]) ** 2
        pos = jnp.argmin(d2, axis=1)
        return jnp.min(d2, axis=1), ci[0][pos]

    return jax.lax.map(one, (q, cand_t, pen, cid))


def _combine_min(md, mi, dj, ij):
    """Running (min distance, min row id on exact ties) combine — the
    deterministic merge convention shared with parallel/sharding.py."""
    big = jnp.int32(np.iinfo(np.int32).max)
    better = dj < md
    key_m = jnp.where(mi >= 0, mi, big)
    key_j = jnp.where(ij >= 0, ij, big)
    tie_key = jnp.minimum(key_m, key_j)
    tied = jnp.where(tie_key == big, -1, tie_key)
    mi = jnp.where(better, ij, jnp.where(dj == md, tied, mi))
    return jnp.minimum(md, dj), mi


def tile_nn1_from_candidates(points, qmask, q_rows, cand_t, pen, cid,
                             max_dist: float, parent=None, vrows=None):
    """Exact bounded-radius 1-NN through pre-gathered candidate tables
    (traceable; the fused ICP loop's per-iteration matcher call).

    Gather discipline (the round-2 lesson — TPU *element* gathers run at
    scalar-core rate, ~127 M elem/s, and dominated the loop): queries are
    gathered once per PARENT tile and expanded to virtual tiles with a
    row gather (vectorizes along the row); candidate row ids resolve
    inside the kernel; the virtual→parent merge reads whole consecutive
    rows (``bd[vbase + j]``, ``kmax`` row gathers); the only
    element-granularity op left is the final unique-index scatter of
    [Tp·TQ] results onto reading rows.

    ``q_rows=None`` means the reading is ALREADY IN TILE ORDER (the
    serving runners permute it once at prep): row ``t·TQ + r`` IS parent
    tile ``t``'s query ``r``, so the per-iteration query gather becomes a
    reshape and the result scatter a reshape — the q-gather alone
    measured ~4 ms/batch-iter at the 4e5 serving shape (round 5).
    ``Tp`` then comes from ``vrows``'s tile axis and ``TQ = n // Tp``.

    Without the parent structure (``parent=None``; the sharded path,
    which re-slices the virtual-tile axis across devices), ``q_rows``
    is taken per virtual tile — duplicates allowed — and the merge is a
    scatter-min with the same (min distance, min row id on ties)
    convention."""
    from .dispatch import use_pallas

    n, d = points.shape
    if q_rows is None:
        assert parent is not None and vrows is not None
        Tp = vrows.shape[1]
        TQ = n // Tp
        q = jnp.zeros((Tp, TQ, _DPAD), jnp.float32)
        q = q.at[:, :, :d].set(points.reshape(Tp, TQ, d))
    else:
        Tp, TQ = q_rows.shape
        q = jnp.zeros((Tp, TQ, _DPAD), jnp.float32)
        q = q.at[:, :, :d].set(points[jnp.maximum(q_rows, 0)])
    if parent is not None:
        q = q[parent]                                   # [Tv, TQ, DPAD]

    sweep = _tile_sweep_pallas if use_pallas() else _tile_sweep_xla
    bd, bi = sweep(q, cand_t, pen, cid, dim=d)          # [Tv, TQ] row ids
    bd = jnp.where(bd <= jnp.float32(max_dist) ** 2, bd, jnp.inf)
    bi = jnp.where(jnp.isfinite(bd), bi, -1)

    big = jnp.int32(np.iinfo(np.int32).max)
    if q_rows is None:
        # tile-ordered reading: merge virtual tiles, then reshape — no
        # scatter (pad/invalid rows are handled by the qmask mask below)
        md, mi = bd[vrows[0]], bi[vrows[0]]             # [Tp, TQ]
        for j in range(1, vrows.shape[0]):
            md, mi = _combine_min(md, mi, bd[vrows[j]], bi[vrows[j]])
        out_d = md.reshape(n)
        out_i = mi.reshape(n)
        out_d = jnp.where(qmask, out_d, jnp.inf)
        out_i = jnp.where(qmask, out_i, -1)
        return out_d, out_i

    flat = q_rows.reshape(-1)
    ok = flat >= 0
    idx = jnp.where(ok, flat, n)

    if parent is not None:
        # merge each parent's consecutive virtual tiles: K row gathers
        md, mi = bd[vrows[0]], bi[vrows[0]]             # [Tp, TQ]
        for j in range(1, vrows.shape[0]):
            md, mi = _combine_min(md, mi, bd[vrows[j]], bi[vrows[j]])
        # NOTE: idx is unique over live rows but every pad row shares
        # idx == n; unique_indices=True would be documented UB there, so
        # it is deliberately NOT set (mode="drop" discards the pad writes
        # either way, but only without the uniqueness promise is that
        # guaranteed semantics rather than luck).
        out_d = jnp.full((n,), jnp.inf, jnp.float32).at[idx].set(
            jnp.where(ok, md.reshape(-1), jnp.inf), mode="drop",
        )
        out_i = jnp.full((n,), -1, jnp.int32).at[idx].set(
            jnp.where(ok, mi.reshape(-1), -1), mode="drop",
        )
    else:
        bd_flat = jnp.where(ok, bd.reshape(-1), jnp.inf)
        bi_flat = bi.reshape(-1)
        out_d = jnp.full((n,), jnp.inf, jnp.float32).at[idx].min(
            bd_flat, mode="drop"
        )
        win = bd_flat == out_d[jnp.minimum(idx, n - 1)]
        cand_i = jnp.where(
            jnp.logical_and(jnp.logical_and(ok, win), bi_flat >= 0),
            bi_flat, big,
        )
        out_i = jnp.full((n,), big, jnp.int32).at[idx].min(
            cand_i, mode="drop"
        )
        out_i = jnp.where(out_i == big, -1, out_i)

    out_d = jnp.where(qmask, out_d, jnp.inf)
    out_i = jnp.where(qmask, out_i, -1)
    return out_d, out_i


def _tile_nnk_kernel(q_ref, rt_ref, pen_ref, cid_ref, out_d_ref, out_i_ref,
                     *, dim, k):
    """Per-tile fused top-k — structurally the PROVEN dense k-NN kernel
    (ops/knn_pallas._nnk_kernel: per grid step, k extraction passes of
    (row-min, argmin, mask-out) over a 2-D [TQ, TM] block, merged with the
    running sorted top-k held in the revisited output block). The only
    delta is id resolution: candidates carry ORIGINAL ROW IDS (``cid``),
    pulled by one-hot select-sum at each extraction. All-2-D on purpose:
    a 3-D tb-batched chunked variant of this body made the Mosaic
    compiler blow past its memory limit (SIGKILL) at 8k queries."""
    j = pl.program_id(1)
    tile_q = q_ref.shape[0]
    tile_m = rt_ref.shape[1]

    d2 = pen_ref[0]  # [1, TM] +inf penalty for pad candidate rows
    for c in range(dim):
        diff = q_ref[:, c][:, None] - rt_ref[c, :][None, :]
        d2 = d2 + diff * diff
    d2 = jnp.broadcast_to(d2, (tile_q, tile_m))
    cidb = jnp.broadcast_to(cid_ref[0], (tile_q, tile_m))

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, tile_m), 1)
    tile_d = []
    tile_i = []
    for _ in range(k):
        td = jnp.min(d2, axis=1)  # [TQ]
        tpos = jnp.argmin(d2, axis=1).astype(jnp.int32)
        hit = col == tpos[:, None]
        tile_d.append(td)
        tile_i.append(jnp.sum(jnp.where(hit, cidb, 0), axis=1))
        d2 = jnp.where(hit, jnp.inf, d2)
    cand_d = jnp.stack(tile_d, axis=1)  # [TQ, k], ascending
    cand_i = jnp.stack(tile_i, axis=1)
    # +inf extractions (exhausted tile) must surface id -1, not a stale
    # pad-row cid
    cand_i = jnp.where(jnp.isfinite(cand_d), cand_i, -1)

    @pl.when(j == 0)
    def _():
        out_d_ref[:, :] = cand_d
        out_i_ref[:, :] = cand_i

    @pl.when(j > 0)
    def _():
        md = jnp.concatenate([out_d_ref[:, :], cand_d], axis=1)  # [TQ, 2k]
        mi = jnp.concatenate([out_i_ref[:, :], cand_i], axis=1)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (tile_q, 2 * k), 1)
        new_d = []
        new_i = []
        for _ in range(k):
            td = jnp.min(md, axis=1)
            tpos = jnp.argmin(md, axis=1).astype(jnp.int32)
            hit = col2 == tpos[:, None]
            new_d.append(td)
            new_i.append(jnp.sum(jnp.where(hit, mi, 0), axis=1))
            md = jnp.where(hit, jnp.inf, md)
        out_d_ref[:, :] = jnp.stack(new_d, axis=1)
        out_i_ref[:, :] = jnp.stack(new_i, axis=1)


def _tile_sweep_pallas_k(q, cand_t, pen, cid, *, dim, k):
    """Top-k form of :func:`_tile_sweep_pallas`: → (dists2 [T, k, TQ],
    row ids [T, k, TQ]), ascending along the k axis.

    Layouts are flattened to 2-D ([T·TQ, DPAD] queries, [T·DPAD, M]
    candidates) so the kernel is byte-for-byte the dense k-NN body with a
    per-tile candidate table — see the kernel docstring for why 2-D."""
    T, TQ, _ = q.shape
    M = cand_t.shape[2]
    tile_m = min(M, 2048)
    assert M % tile_m == 0 and tile_m % 128 == 0, (M, tile_m)
    nj = M // tile_m
    q2 = q.reshape(T * TQ, _DPAD)
    rt2 = cand_t.reshape(T * _DPAD, M)
    # pen/cid stay [T, 1, M]: a 2-D (1, tile_m) block over [T, M] violates
    # the Mosaic block rule (second-to-last dim 1 neither multiple of 8
    # nor the array dim); with the unit middle dim it IS the array dim
    out_d, out_i = pl.pallas_call(
        functools.partial(_tile_nnk_kernel, dim=dim, k=k),
        grid=(T, nj),
        in_specs=[
            pl.BlockSpec((TQ, _DPAD), lambda t, j: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, tile_m), lambda t, j: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_m), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_m), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TQ, k), lambda t, j: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda t, j: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T * TQ, k), jnp.float32),
            jax.ShapeDtypeStruct((T * TQ, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(3 * dim + 6 * k) * T * TQ * M,
            bytes_accessed=4 * T * M * (_DPAD + 2) + 4 * T * TQ * _DPAD
            + 8 * T * TQ * k * nj,
            transcendentals=0,
        ),
    )(q2, rt2, pen, cid)
    out_d = jnp.swapaxes(out_d.reshape(T, TQ, k), 1, 2)
    out_i = jnp.swapaxes(out_i.reshape(T, TQ, k), 1, 2)
    return out_d, out_i


def _tile_sweep_xla_k(q, cand_t, pen, cid, *, dim, k):
    """CPU / interpret fallback for the top-k sweep."""

    def one(args):
        qt, ct, pn, ci = args
        d2 = pn[0][None, :]
        for c in range(dim):
            d2 = d2 + (qt[:, c][:, None] - ct[c, :][None, :]) ** 2
        negd, pos = jax.lax.top_k(-d2, k)        # [TQ, k] ascending dist
        return (-negd).T, ci[0][pos].T           # [k, TQ]

    return jax.lax.map(one, (q, cand_t, pen, cid))


def _merge_sorted_k(ad, ai, bd_, bi_):
    """Merge two per-query sorted k-lists [..., k, TQ] → k smallest.
    Candidate ids are disjoint across virtual tiles (each candidate
    sub-block lives in exactly one), so no dedup is needed."""
    k = ad.shape[-2]
    outs_d = [ad[..., s, :] for s in range(k)]
    outs_i = [ai[..., s, :] for s in range(k)]
    for t in range(k):
        cd, ci = bd_[..., t, :], bi_[..., t, :]
        for s in range(k):
            take = cd < outs_d[s]
            nd = jnp.where(take, cd, outs_d[s])
            ni = jnp.where(take, ci, outs_i[s])
            cd = jnp.where(take, outs_d[s], cd)
            ci = jnp.where(take, outs_i[s], ci)
            outs_d[s], outs_i[s] = nd, ni
    return jnp.stack(outs_d, axis=-2), jnp.stack(outs_i, axis=-2)


def tile_knnk_from_candidates(points, qmask, q_rows, cand_t, pen, cid,
                              max_dist: float, parent, vrows, k: int):
    """Exact bounded-radius k-NN through pre-gathered candidate tables —
    the k>1 form of :func:`tile_nn1_from_candidates` (the reference
    matcher contract has knn as a free parameter, MatchersImpl.h:69-120).
    Returns ``(dists2 [N, k], ids [N, k])`` ascending per row, (+inf, -1)
    beyond the radius / missing. Requires the parent structure (the
    engine path); the sharded tile path stays 1-NN. ``q_rows=None``:
    tile-ordered reading (see :func:`tile_nn1_from_candidates`)."""
    from .dispatch import use_pallas

    n, d = points.shape
    if q_rows is None:
        Tp = vrows.shape[1]
        TQ = n // Tp
        q = jnp.zeros((Tp, TQ, _DPAD), jnp.float32)
        q = q.at[:, :, :d].set(points.reshape(Tp, TQ, d))
    else:
        Tp, TQ = q_rows.shape
        q = jnp.zeros((Tp, TQ, _DPAD), jnp.float32)
        q = q.at[:, :, :d].set(points[jnp.maximum(q_rows, 0)])
    q = q[parent]                                       # [Tv, TQ, DPAD]

    sweep = _tile_sweep_pallas_k if use_pallas() else _tile_sweep_xla_k
    bd, bi = sweep(q, cand_t, pen, cid, dim=d, k=k)     # [Tv, k, TQ]
    keep = bd <= jnp.float32(max_dist) ** 2
    bd = jnp.where(keep, bd, jnp.inf)
    bi = jnp.where(keep, bi, -1)

    # merge each parent's consecutive virtual tiles (disjoint candidates)
    md, mi = bd[vrows[0]], bi[vrows[0]]                 # [Tp, k, TQ]
    for j in range(1, vrows.shape[0]):
        md, mi = _merge_sorted_k(md, mi, bd[vrows[j]], bi[vrows[j]])

    upd_d = jnp.swapaxes(md, 1, 2).reshape(-1, k)       # [Tp·TQ, k]
    upd_i = jnp.swapaxes(mi, 1, 2).reshape(-1, k)
    if q_rows is None:
        out_d, out_i = upd_d, upd_i
    else:
        flat = q_rows.reshape(-1)
        ok = flat >= 0
        idx = jnp.where(ok, flat, n)
        out_d = jnp.full((n, k), jnp.inf, jnp.float32).at[idx].set(
            jnp.where(ok[:, None], upd_d, jnp.inf), mode="drop",
        )
        out_i = jnp.full((n, k), -1, jnp.int32).at[idx].set(
            jnp.where(ok[:, None], upd_i, -1), mode="drop",
        )
    out_d = jnp.where(qmask[:, None], out_d, jnp.inf)
    out_i = jnp.where(qmask[:, None], out_i, -1)
    return out_d, out_i


def tile_nn1(points: jnp.ndarray, qmask: jnp.ndarray,
             q_rows: jnp.ndarray, blocks: jnp.ndarray,
             sub_units: jnp.ndarray, max_dist: float):
    """Exact bounded-radius 1-NN of ``points`` [N, d] through the static
    tile assignment, with ``q_rows`` given PER VIRTUAL TILE (duplicates
    allowed — the sharded path slices this axis across devices).
    Convenience form: gathers candidate tables on the fly (the engine
    pre-gathers once per registration via :func:`gather_candidates`
    instead — candidates are loop-static).

    Returns ``(dists2 [N], ids [N])`` with ``(+inf, -1)`` beyond the
    radius, for rows absent from the assignment, and for masked rows."""
    cand_t, pen, cid = _gather_candidates(sub_units, blocks)
    return tile_nn1_from_candidates(
        points, qmask, q_rows, cand_t, pen, cid, max_dist
    )
