"""Survivor-list exact 1-NN sweep — generation 2 of the pruned serving
matcher (supersedes the predicated kernel in :mod:`.knn_skip` on the hot
path; that module keeps the Morton/bbox utilities both share).

Why a rework — three measured facts at the 25k serving shape
(tools/skip_rate_curve.py, tools/sweep2_micro.py, single v5e chip):

1. **Per-grid-step overhead is ~14 µs.** A (ni,)-grid with 99 query
   tiles pays ~1.4 ms before any compute — that WAS the predicated
   kernel's "fixed cost" and why a 96% skip rate only bought 2.2x. Both
   stages here run 8 query tiles per grid step (and the sweep defaults
   to larger tiles), cutting the step count ~8x.
2. **Ball (centroid+radius) lower bounds are loose**: Morton chunks in
   sparse regions span tens of meters, so their balls overlap half the
   map and 42% of chunks survived. Lower bounds now use per-chunk
   BBOXES (the ball is derived in-kernel from the box only for the
   upper bound, where the binding chunk is the query's own tight local
   chunk).
3. **A dynamic survivor loop costs ~0.3 µs/chunk** vs ~0.1 for the
   static unrolled dense loop; the sweep unrolls 4 survivors per
   iteration (the list is padded with duplicate survivors — duplicates
   cannot change a running min).

Pipeline per serving iteration: Stage A (Pallas) computes a PER-QUERY
upper bound U_q on the true NN distance — min over chunks of
(‖q − box-center‖ + half-diagonal), a bound on the distance to a real
point of a nonempty chunk, fused with the transported prev-winner bound
— and per-(tile, chunk) survival flags any_q(bbox-dist(q, ch) ≤ U_q).
Tiny XLA glue turns flags into (survivor list, count). Stage B sweeps
only surviving 128-row chunks with the exact difference-form kernel.

Exactness: the chunk holding any valid query's true NN always survives —
bbox-dist(q, ch) ≤ d(q, NN) ≤ U_q, both made conservative by outward
4-ulp inflation (f32 sqrt/add roundings); winners come exclusively from
the exact sweep. (reference contract: MatchersImpl.cpp:86-101, kd-tree
at epsilon 0.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "chunk_summaries",
    "chunked_ref_table",
    "survivors_and_bounds",
    "nn1_survivor_sweep",
    "nn1_survivor_sweep_stream",
    "nn1_sorted_v2",
    "nnk_survivor_sweep",
    "nnk_sorted_v2",
]

_DPAD = 8
#: sentinel for empty/padded chunks: bbox at _FAR → lower bound huge
#: (never survives), ball center _FAR (never binds the upper bound)
_FAR = 1.0e15
#: query tiles processed per Stage-A grid step (static output rows —
#: Mosaic forbids unaligned dynamic sublane stores — and ~8x fewer
#: grid-step overheads)
_A_TILES = 8
#: survivors processed per Stage-B loop iteration (list padded with
#: duplicates, harmless for a min)
_B_UNROLL = 4


# ------------------------------------------------------------- host helpers
def chunk_summaries(pts_sorted, mask_sorted, chunk: int = 128):
    """Host, once per map: [8, nch_pad] per-chunk bbox table — rows 0..2
    lo, rows 3..5 hi (valid points only, hi inflated 4 ulps outward),
    row 6 the chunk's VALID COUNT (the k-NN upper bound may only come
    from chunks holding >= k real points). Empty chunks sit at _FAR.
    nch pads to a lane multiple of 128."""
    import numpy as np

    pts = np.asarray(pts_sorted, np.float64)
    mask = np.asarray(mask_sorted, bool)
    n, d = pts.shape
    npad = -(-n // chunk) * chunk
    p = np.full((npad, d), np.nan)
    p[:n] = np.where(mask[:, None], pts, np.nan)
    p = p.reshape(-1, chunk, d)
    nch = p.shape[0]
    nch_pad = -(-nch // 128) * 128
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        lo = np.nanmin(p, axis=1)
        hi = np.nanmax(p, axis=1)
    empty = np.isnan(lo[:, 0])
    span = np.where(empty[:, None], 0.0, np.abs(hi) + np.abs(lo))
    lo = np.where(empty[:, None], _FAR, lo - 4e-7 * span)
    hi = np.where(empty[:, None], _FAR, hi + 4e-7 * span)
    out = np.full((_DPAD, nch_pad), np.float32(_FAR))
    out[:d, :nch] = lo.T.astype(np.float32)
    out[3:3 + d, :nch] = hi.T.astype(np.float32)
    out[6:, :] = 0.0
    cnt = np.zeros((npad,), np.float32)
    cnt[:n] = mask.astype(np.float32)
    out[6, :nch] = cnt.reshape(-1, chunk).sum(axis=1)
    return out


def chunked_ref_table(pts_sorted, mask_sorted):
    """Host, once per map: [nch, 8, 128] chunked table of the sorted map —
    sublane rows 0..2 coordinates, row 3 the +inf penalty for invalid and
    padded rows (the sweep adds it into d² so dead rows never win)."""
    import numpy as np

    pts = np.asarray(pts_sorted, np.float32)
    mask = np.asarray(mask_sorted, bool)
    n, d = pts.shape
    npad = -(-n // 128) * 128
    out = np.zeros((npad // 128, _DPAD, 128), np.float32)
    p = np.zeros((npad, d), np.float32)
    p[:n] = pts
    pen = np.full((npad,), np.inf, np.float32)
    pen[:n] = np.where(mask, 0.0, np.inf)
    out[:, :d, :] = p.reshape(-1, 128, d).transpose(0, 2, 1)
    out[:, 3, :] = pen.reshape(-1, 128)
    return out


# ------------------------------------------------------------ stage A
def _bounds_kernel(q_ref, ct_ref, ub_ref, surv_ref, *, dim, ngrp, tile_q,
                   k=1):
    """One grid step = _A_TILES query tiles (static output rows).

    Per tile: pass 1 over chunk-lane groups accumulates the per-query
    upper bound U_q = min over chunks of (‖q − box-center‖ +
    half-diagonal), fused with the transported bound in q col 4; pass 2
    writes per-chunk survival any_q(bbox-dist(q, ch) ≤ U_q).

    k > 1: the bound covers the k-th NN — only chunks holding >= k valid
    points (ct row 6) may bind it (k real points within that radius ⇒
    d_k ≤ bound); survival against U_q^k keeps every chunk that can
    contain ANY of the k nearest (bbox-dist ≤ d_k ≤ U_q^k)."""
    tile_rows = []
    for t in range(_A_TILES):
        rows = slice(t * tile_q, (t + 1) * tile_q)
        qcols = [q_ref[rows, c][:, None] for c in range(dim)]
        valid_pen = q_ref[rows, 3][:, None]   # 0 valid, _FAR invalid
        ub = q_ref[rows, 4][:, None]          # transported bound

        def boxes(g):
            sl = slice(g * 128, (g + 1) * 128)
            lo = [ct_ref[c, sl][None, :] for c in range(dim)]
            hi = [ct_ref[3 + c, sl][None, :] for c in range(dim)]
            return lo, hi

        for g in range(ngrp):
            lo, hi = boxes(g)
            dc2 = jnp.zeros((tile_q, 128), jnp.float32)
            rr2 = jnp.zeros((1, 128), jnp.float32)
            for c in range(dim):
                ctr = 0.5 * (lo[c] + hi[c])
                half = 0.5 * (hi[c] - lo[c])
                diff = qcols[c] - ctr
                dc2 = dc2 + diff * diff
                rr2 = rr2 + half * half
            cand = (jnp.sqrt(dc2) + jnp.sqrt(rr2)) * (1.0 + 4e-7)
            if k > 1:
                sl = slice(g * 128, (g + 1) * 128)
                few = ct_ref[6, sl][None, :] < float(k)
                cand = cand + jnp.where(few, jnp.float32(_FAR), 0.0)
            ub = jnp.minimum(ub, jnp.min(cand, axis=1)[:, None])
        ub_ref[rows, 0] = ub[:, 0]

        ub2 = (ub * ub) * (1.0 + 4e-7)
        grp_rows = []
        for g in range(ngrp):
            lo, hi = boxes(g)
            gap2 = jnp.zeros((tile_q, 128), jnp.float32)
            for c in range(dim):
                gap = jnp.maximum(
                    jnp.maximum(lo[c] - qcols[c], qcols[c] - hi[c]), 0.0
                )
                gap2 = gap2 + gap * gap
            ok = (gap2 * (1.0 - 4e-7) + valid_pen) <= ub2
            grp_rows.append(jnp.max(ok.astype(jnp.int32), axis=0))
        tile_rows.append(grp_rows)
    # static per-row stores (dynamic sublane stores must be 8-aligned;
    # lane-concatenating 1-D vectors is unsupported — "offsets outside
    # the first tile")
    for t in range(_A_TILES):
        for g in range(ngrp):
            sl = slice(g * 128, (g + 1) * 128)
            surv_ref[t:t + 1, sl] = tile_rows[t][g][None, :]


@functools.partial(jax.jit, static_argnames=("tile_q", "k"))
def survivors_and_bounds(qp, ct, tile_q: int = 256, k: int = 1):
    """qp [n_pad, 8] (cols 0..d coords, col 3 = 0 valid / _FAR invalid,
    col 4 = transported upper-bound DISTANCE, +inf unknown; n_pad a
    multiple of 8·tile_q), ct from :func:`chunk_summaries`.
    → (ub [n_pad], surv [ni, nch_pad] int32). ``k`` bounds the k-th NN
    (see kernel docstring)."""
    n_pad = qp.shape[0]
    nch_pad = ct.shape[1]
    step_rows = _A_TILES * tile_q
    assert n_pad % step_rows == 0 and nch_pad % 128 == 0
    ni = n_pad // tile_q
    dim = 3

    ub, surv = pl.pallas_call(
        functools.partial(_bounds_kernel, dim=dim,
                          ngrp=nch_pad // 128, tile_q=tile_q, k=k),
        grid=(n_pad // step_rows,),
        in_specs=[
            pl.BlockSpec((step_rows, _DPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, nch_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((step_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_A_TILES, nch_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((ni, nch_pad), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 12 * n_pad * nch_pad,
            bytes_accessed=4 * (n_pad * _DPAD + _DPAD * nch_pad),
            transcendentals=2 * n_pad * nch_pad // 128,
        ),
    )(qp, ct)
    return ub[:, 0], surv


# ------------------------------------------------------------ stage B
def _sweep_kernel(surv_ref, q_ref, rt3_ref, out_d_ref, out_i_ref,
                  lst_ref, *, dim, tile_q, nch):
    """One grid step = one query tile.

    The survivor LIST is built in-kernel by the scalar core — a fori_loop
    over the SMEM flag row with a conditional SMEM-scratch store per
    surviving chunk (~few cycles each) — replacing the round-3.5 XLA
    argsort glue whose in-loop cost erased the kernel win (fixed-budget
    serving measured at parity). Then a dynamic loop sweeps survivors,
    _B_UNROLL chunks per iteration (indices clamped to the last survivor;
    duplicates cannot change a running min)."""
    i = pl.program_id(0)
    qcols = [q_ref[:, c][:, None] for c in range(dim)]

    def scan_body(ch, cnt):
        flag = surv_ref[i, ch]

        @pl.when(flag != 0)
        def _():
            lst_ref[cnt] = ch

        return cnt + flag

    cnt = lax.fori_loop(0, nch, scan_body, jnp.int32(0))
    n_iter = (cnt + (_B_UNROLL - 1)) // _B_UNROLL

    def body(j, carry):
        best_d, best_i = carry
        for u in range(_B_UNROLL):
            ch = lst_ref[jnp.minimum(j * _B_UNROLL + u, cnt - 1)]
            blk = rt3_ref[ch]                   # [8, 128]
            d2 = blk[3, :][None, :]             # +inf at invalid rows
            for c in range(dim):
                diff = qcols[c] - blk[c, :][None, :]
                d2 = d2 + diff * diff
            take = d2 < best_d
            best_d = jnp.where(take, d2, best_d)
            best_i = jnp.where(take, ch * 128, best_i)
        return best_d, best_i

    init = (
        jnp.full((tile_q, 128), jnp.inf, jnp.float32),
        jnp.zeros((tile_q, 128), jnp.int32),
    )
    best_d, best_i = lax.fori_loop(0, n_iter, body, init)
    td = jnp.min(best_d, axis=1)
    lane = jnp.argmin(best_d, axis=1).astype(jnp.int32)
    base = jnp.sum(
        jnp.where(
            lax.broadcasted_iota(jnp.int32, best_d.shape, 1)
            == lane[:, None],
            best_i, 0,
        ),
        axis=1,
    )
    out_d_ref[:, 0] = td
    out_i_ref[:, 0] = base + lane


@functools.partial(jax.jit, static_argnames=("tile_q",))
def nn1_survivor_sweep(qp, rt3, surv, tile_q: int = 256):
    """Exact 1-NN over surviving chunks only.

    qp [n_pad, 8] (cols 0..2 coords), rt3 [nch, 8, 128] chunked sorted
    map (row 3 = +inf penalty), surv [ni, nch_pad] int32 survival flags
    (from :func:`survivors_and_bounds`, folded to this tile granularity).
    Returns (dists2 [n_pad], ids [n_pad]) — ids index the sorted map;
    +inf/0 where a tile had no survivors (invalid rows masked by caller).
    """
    n_pad = qp.shape[0]
    ni = n_pad // tile_q
    nch = rt3.shape[0]
    nch_pad = surv.shape[1]
    assert surv.shape[0] == ni, (surv.shape, ni)

    out_d, out_i = pl.pallas_call(
        functools.partial(_sweep_kernel, dim=3, tile_q=tile_q, nch=nch),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((ni, nch_pad), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, _DPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, _DPAD, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((nch_pad,), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad * nch * 16,
            bytes_accessed=4 * (n_pad * _DPAD + nch * _DPAD * 128),
            transcendentals=0,
        ),
    )(surv, qp, rt3)
    return out_d[:, 0], out_i[:, 0]


# ------------------------------------------------------- stage B, top-k
def _sweepk_kernel(surv_ref, q_ref, rt3_ref, out_d_ref, out_i_ref,
                   lst_ref, *, dim, tile_q, nch, k):
    """Top-k sweep over surviving chunks (k ≤ 4): same scalar-core list
    build as :func:`_sweep_kernel`; the dynamic loop merges one 128-row
    chunk per iteration into a running sorted top-k carried in registers
    — concat [TQ, k + 128], k passes of (min, one-hot arg, mask-out)
    (the _nnk_kernel extraction idiom; ids ride as f32, exact below 2^24
    — m_pad ≤ SKIP_MAX_MPAD ≪ 2^24)."""
    i = pl.program_id(0)
    qcols = [q_ref[:, c][:, None] for c in range(dim)]

    def scan_body(ch, cnt):
        flag = surv_ref[i, ch]

        @pl.when(flag != 0)
        def _():
            lst_ref[cnt] = ch

        return cnt + flag

    cnt = lax.fori_loop(0, nch, scan_body, jnp.int32(0))

    def body(j, carry):
        best_d, best_i = carry                   # [TQ, k] sorted asc
        ch = lst_ref[jnp.minimum(j, cnt - 1)]
        blk = rt3_ref[ch]                        # [8, 128]
        d2 = blk[3, :][None, :]                  # +inf at invalid rows
        for c in range(dim):
            diff = qcols[c] - blk[c, :][None, :]
            d2 = d2 + diff * diff
        ids = (jnp.float32(ch * 128)
               + lax.broadcasted_iota(jnp.float32, d2.shape, 1))
        d2 = jnp.broadcast_to(d2, (tile_q, 128))
        ids = jnp.broadcast_to(ids, (tile_q, 128))
        md = jnp.concatenate([best_d, d2], axis=1)      # [TQ, k+128]
        mi = jnp.concatenate([best_i, ids], axis=1)
        col = lax.broadcasted_iota(jnp.int32, md.shape, 1)
        nd, ni_ = [], []
        for _ in range(k):
            td = jnp.min(md, axis=1)
            tpos = jnp.argmin(md, axis=1).astype(jnp.int32)
            hit = col == tpos[:, None]
            nd.append(td)
            ni_.append(jnp.sum(jnp.where(hit, mi, 0.0), axis=1))
            md = jnp.where(hit, jnp.inf, md)
        return jnp.stack(nd, axis=1), jnp.stack(ni_, axis=1)

    init = (
        jnp.full((tile_q, k), jnp.inf, jnp.float32),
        jnp.full((tile_q, k), -1.0, jnp.float32),
    )
    best_d, best_i = lax.fori_loop(0, cnt, body, init)
    out_d_ref[:, :] = best_d
    out_i_ref[:, :] = best_i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_q", "k"))
def nnk_survivor_sweep(qp, rt3, surv, tile_q: int = 256, k: int = 2):
    """Exact k-NN over surviving chunks only (resident maps; the
    streaming variant stays 1-NN). Same contract as
    :func:`nn1_survivor_sweep` with [n_pad, k] outputs, ascending."""
    n_pad = qp.shape[0]
    ni = n_pad // tile_q
    nch = rt3.shape[0]
    nch_pad = surv.shape[1]
    assert surv.shape[0] == ni, (surv.shape, ni)

    out_d, out_i = pl.pallas_call(
        functools.partial(_sweepk_kernel, dim=3, tile_q=tile_q, nch=nch,
                          k=k),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((ni, nch_pad), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, _DPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, _DPAD, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((nch_pad,), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=(12 + 6 * k) * n_pad * nch * 16,
            bytes_accessed=4 * (n_pad * _DPAD + nch * _DPAD * 128),
            transcendentals=0,
        ),
    )(surv, qp, rt3)
    return out_d, out_i


def nnk_sorted_v2(qs, qm, ub_t, rt3, ct, k: int, tile_q: int = 256,
                  sweep_tile_q: int = 1024):
    """k-NN (k ≤ 4) serving-iteration matching step: k-th-NN bounds →
    survivors → exact top-k sweep. Same contract as :func:`nn1_sorted_v2`
    with [n, k] outputs; ub_t transports the previous iteration's k-th
    distance."""
    n, d = qs.shape
    fold = max(1, sweep_tile_q // tile_q)
    step_rows = _A_TILES * tile_q
    n_pad = -(-n // max(step_rows, sweep_tile_q)) * max(step_rows,
                                                        sweep_tile_q)
    nch = rt3.shape[0]

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32)
    qp = qp.at[:n, :d].set(qs)
    qp = qp.at[n:, 3].set(_FAR)
    qp = qp.at[:n, 3].set(jnp.where(qm, 0.0, _FAR))
    qp = qp.at[:, 4].set(jnp.inf).at[:n, 4].set(ub_t)

    _, surv = survivors_and_bounds(qp, ct, tile_q=tile_q, k=k)
    ni = surv.shape[0]
    if fold > 1:
        surv = jnp.max(surv.reshape(ni // fold, fold, -1), axis=1)
    d2, ids = nnk_survivor_sweep(qp, rt3, surv, tile_q=sweep_tile_q, k=k)
    d2 = d2[:n]
    ids = ids[:n]
    finite = jnp.isfinite(d2)
    d2 = jnp.where(qm[:, None], d2, jnp.inf)
    ids = jnp.where(jnp.logical_and(qm[:, None], finite), ids, -1)
    frac = jnp.sum(surv) / (surv.shape[0] * nch)
    return d2, ids, frac


# ------------------------------------------- stage B, streaming (large maps)
def _sweep_stream_kernel(surv_ref, q_ref, rt3_ref, out_d_ref, out_i_ref,
                         lst_ref, buf, sems, *, dim, tile_q, nch):
    """Stage B for maps too large to sit in VMEM: ``rt3`` stays in
    HBM/ANY and each surviving chunk's [8, 128] block is DMA'd into a
    double-buffered VMEM scratch (guide pattern: start copy j+1, wait j,
    compute j). Compute per chunk (~0.4 µs) underlaps the ~1-2 µs DMA
    latency, so throughput ≈ survivors × DMA latency — at large maps the
    survivor count per tile grows with local density only, while the
    dense alternative grows with the WHOLE map."""
    i = pl.program_id(0)
    qcols = [q_ref[:, c][:, None] for c in range(dim)]

    def scan_body(ch, cnt):
        flag = surv_ref[i, ch]

        @pl.when(flag != 0)
        def _():
            lst_ref[cnt] = ch

        return cnt + flag

    cnt = lax.fori_loop(0, nch, scan_body, jnp.int32(0))

    def get_dma(slot, j):
        ch = lst_ref[jnp.minimum(j, cnt - 1)]
        return pltpu.make_async_copy(
            rt3_ref.at[ch], buf.at[slot], sems.at[slot]
        )

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

    def body(j, carry):
        best_d, best_i = carry
        slot = lax.rem(j, 2)

        @pl.when(j + 1 < cnt)
        def _():
            get_dma(1 - slot, j + 1).start()

        get_dma(slot, j).wait()
        ch = lst_ref[jnp.minimum(j, cnt - 1)]
        blk = buf[slot]                         # [8, 128]
        d2 = blk[3, :][None, :]                 # +inf at invalid rows
        for c in range(dim):
            diff = qcols[c] - blk[c, :][None, :]
            d2 = d2 + diff * diff
        take = d2 < best_d
        best_d = jnp.where(take, d2, best_d)
        best_i = jnp.where(take, ch * 128, best_i)
        return best_d, best_i

    init = (
        jnp.full((tile_q, 128), jnp.inf, jnp.float32),
        jnp.zeros((tile_q, 128), jnp.int32),
    )
    best_d, best_i = lax.fori_loop(0, cnt, body, init)
    td = jnp.min(best_d, axis=1)
    lane = jnp.argmin(best_d, axis=1).astype(jnp.int32)
    base = jnp.sum(
        jnp.where(
            lax.broadcasted_iota(jnp.int32, best_d.shape, 1)
            == lane[:, None],
            best_i, 0,
        ),
        axis=1,
    )
    out_d_ref[:, 0] = td
    out_i_ref[:, 0] = base + lane


@functools.partial(jax.jit, static_argnames=("tile_q",))
def nn1_survivor_sweep_stream(qp, rt3, surv, tile_q: int = 1024):
    """Streaming variant of :func:`nn1_survivor_sweep` — same contract,
    ``rt3`` lives in HBM (compiler-chosen/ANY space) and survivors are
    DMA'd on demand; use when the chunked map exceeds VMEM residency."""
    n_pad = qp.shape[0]
    ni = n_pad // tile_q
    nch = rt3.shape[0]
    nch_pad = surv.shape[1]
    assert surv.shape[0] == ni, (surv.shape, ni)

    out_d, out_i = pl.pallas_call(
        functools.partial(_sweep_stream_kernel, dim=3, tile_q=tile_q,
                          nch=nch),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((ni, nch_pad), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, _DPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((surv.shape[1],), jnp.int32),
            pltpu.VMEM((2, _DPAD, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad * nch * 4,
            bytes_accessed=4 * (n_pad * _DPAD + nch * _DPAD * 128),
            transcendentals=0,
        ),
    )(surv, qp, rt3)
    return out_d[:, 0], out_i[:, 0]


# ------------------------------------------------------------ full step
def nn1_sorted_v2(qs, qm, ub_t, rt3, ct, tile_q: int = 256,
                  sweep_tile_q: int = 1024, stream: bool = False):
    """One serving-iteration matching step: bounds → survivors → exact
    sweep. qs [n, d] Morton-sorted queries at the current pose, qm [n]
    validity, ub_t [n] transported upper-bound distance (+inf unknown),
    rt3/ct static per map. ``tile_q`` is the bound/survival granularity;
    ``sweep_tile_q`` the exact-sweep tile (its flags are the OR of its
    bound tiles — still exact, spatially coarser). Returns (dists2 [n],
    ids [n], survivor-fraction scalar for diagnostics)."""
    n, d = qs.shape
    fold = max(1, sweep_tile_q // tile_q)
    step_rows = _A_TILES * tile_q
    n_pad = -(-n // max(step_rows, sweep_tile_q)) * max(step_rows,
                                                        sweep_tile_q)
    nch = rt3.shape[0]

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32)
    qp = qp.at[:n, :d].set(qs)
    qp = qp.at[n:, 3].set(_FAR)
    qp = qp.at[:n, 3].set(jnp.where(qm, 0.0, _FAR))
    qp = qp.at[:, 4].set(jnp.inf).at[:n, 4].set(ub_t)

    _, surv = survivors_and_bounds(qp, ct, tile_q=tile_q)
    ni = surv.shape[0]
    if fold > 1:
        surv = jnp.max(surv.reshape(ni // fold, fold, -1), axis=1)
    # list-building happens on the sweep kernel's scalar core (see
    # _sweep_kernel) — no XLA sort/scatter glue between the stages
    sweep = nn1_survivor_sweep_stream if stream else nn1_survivor_sweep
    d2, ids = sweep(qp, rt3, surv, tile_q=sweep_tile_q)
    d2 = d2[:n]
    ids = ids[:n]
    finite = jnp.isfinite(d2)
    d2 = jnp.where(qm, d2, jnp.inf)
    ids = jnp.where(jnp.logical_and(qm, finite), ids, -1)
    frac = jnp.sum(surv) / (surv.shape[0] * nch)
    return d2, ids, frac
