"""Pallas TPU kernel for fused 1-NN: distance tiles never leave VMEM.

The XLA scan formulation in :mod:`.knn` materializes each [N, TILE_M]
distance block to HBM before reducing it (~4 GB of traffic for 32k x 32k).
This kernel computes the block in VMEM, folds the running (min, argmin) in
place, and writes only the final [N] results — HBM traffic drops to reading
the two point sets once per sweep. Distances use the exact f32 difference
form on the VPU (see the kernel comment: the matmul form is neither exact
nor faster at d=3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn1_pallas", "knnk_pallas", "KNNK_MAX"]

_DPAD = 8  # coordinate dim padded to the f32 sublane width

#: largest k served by the fused k-NN kernel (beyond this the VPU extraction
#: passes outweigh the saved HBM traffic; the XLA scan takes over, still
#: exact — raised 16 -> 32 in round 4 with exactness tests at k=24)
KNNK_MAX = 32


def _nn1_kernel(q_ref, rt_ref, rpen_ref, out_d_ref, out_i_ref,
                acc_d, acc_i, *, dim, nj):
    """Chunked-lane running min/argmin (round-2 rewrite).

    Distances stay in the exact f32 difference form on the VPU: the matmul
    formulation ‖q‖²+‖r‖²−2q·r cancels catastrophically when distances are
    small relative to coordinates — even at HIGHEST matmul precision it
    flips nearest neighbors on near-ties (measured: tools/knn_micro.py).

    The reduction is restructured from per-tile jnp.min+jnp.argmin over a
    2048-lane axis (two full cross-lane reduction passes per tile) into a
    *running* per-lane best held in VMEM scratch [TQ, 128]: each 128-lane
    chunk costs one compare + two selects per cell, and the cross-lane
    argmin runs ONCE per query row at the final grid step. Measured 1.4x
    over the reduction-per-tile form at the serving shape (20480x12459:
    3.58 -> 2.59 ms); both are within ~20% of the VPU issue-rate roofline
    at ~12 vector ops/cell, which is why the matmul/MXU route (epilogue
    still VPU-bound) cannot win here."""
    j = pl.program_id(1)
    tile_m = rt_ref.shape[1]

    @pl.when(j == 0)
    def _():
        acc_d[:, :] = jnp.full_like(acc_d, jnp.inf)
        acc_i[:, :] = jnp.zeros_like(acc_i)

    nch = tile_m // 128
    best_d = acc_d[:, :]          # [TQ, 128] per-lane running min
    best_i = acc_i[:, :]          # [TQ, 128] flat base index of that min
    # hoist the sublane-strided query column extraction out of the chunk
    # loop — re-slicing per chunk costs a shuffle sequence per [TQ, 128] op
    qcols = [q_ref[:, c][:, None] for c in range(dim)]
    for ch in range(nch):
        sl = slice(ch * 128, (ch + 1) * 128)
        d2 = rpen_ref[0, sl][None, :]
        for c in range(dim):
            diff = qcols[c] - rt_ref[c, sl][None, :]
            d2 = d2 + diff * diff
        idx = jnp.int32(j * tile_m + ch * 128)
        take = d2 < best_d
        best_d = jnp.where(take, d2, best_d)
        best_i = jnp.where(take, idx, best_i)
    acc_d[:, :] = best_d
    acc_i[:, :] = best_i

    @pl.when(j == nj - 1)
    def _():
        bd = acc_d[:, :]
        td = jnp.min(bd, axis=1)
        lane = jnp.argmin(bd, axis=1).astype(jnp.int32)   # [TQ] in 0..127
        base = jnp.sum(
            jnp.where(
                lax.broadcasted_iota(jnp.int32, bd.shape, 1) == lane[:, None],
                acc_i[:, :], 0,
            ),
            axis=1,
        )
        out_d_ref[:, 0] = td
        out_i_ref[:, 0] = base + lane


def _nn1_mxu_kernel(q_ref, rt_ref, q2_ref, r2pen_ref, out_d_ref, out_i_ref):
    """MXU variant: distances via ‖q‖²+‖r‖²−2q·r with the dot on the
    systolic array at HIGHEST precision (bf16x6 ≈ f32). Trades exactness on
    ~1e-6-relative ties for ~2x throughput; opt in with PMTPU_KNN_IMPL=mxu."""
    j = pl.program_id(1)
    tile_m = rt_ref.shape[1]
    dots = lax.dot_general(
        q_ref[:], rt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    d2 = q2_ref[:] + r2pen_ref[:] - 2.0 * dots
    td = jnp.min(d2, axis=1)
    ti = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * tile_m

    @pl.when(j == 0)
    def _():
        out_d_ref[:, 0] = td
        out_i_ref[:, 0] = ti

    @pl.when(j > 0)
    def _():
        prev_d = out_d_ref[:, 0]
        prev_i = out_i_ref[:, 0]
        take = td < prev_d
        out_d_ref[:, 0] = jnp.where(take, td, prev_d)
        out_i_ref[:, 0] = jnp.where(take, ti, prev_i)


def _nnk_kernel(q_ref, rt_ref, rpen_ref, out_d_ref, out_i_ref, *, dim, k):
    """Fused top-k: the [TQ, TM] distance block never leaves VMEM.

    Tile candidates are extracted by k passes of (row-min, argmin,
    mask-out-column) — exact and fully vectorized — then merged with the
    running sorted top-k (held in the revisited output block) by k more
    extraction passes over the concatenated 2k-column candidate set."""
    j = pl.program_id(1)
    tile_q = q_ref.shape[0]
    tile_m = rt_ref.shape[1]

    d2 = rpen_ref[:]  # [1, TM] +inf penalty for masked reference rows
    for c in range(dim):
        diff = q_ref[:, c][:, None] - rt_ref[c, :][None, :]
        d2 = d2 + diff * diff
    d2 = jnp.broadcast_to(d2, (tile_q, tile_m))

    col = lax.broadcasted_iota(jnp.int32, (tile_q, tile_m), 1)
    tile_d = []
    tile_i = []
    for _ in range(k):
        td = jnp.min(d2, axis=1)  # [TQ]
        ti = jnp.argmin(d2, axis=1).astype(jnp.int32)
        tile_d.append(td)
        tile_i.append(ti + j * tile_m)
        d2 = jnp.where(col == ti[:, None], jnp.inf, d2)
    cand_d = jnp.stack(tile_d, axis=1)  # [TQ, k], ascending
    cand_i = jnp.stack(tile_i, axis=1)

    @pl.when(j == 0)
    def _():
        out_d_ref[:, :] = cand_d
        out_i_ref[:, :] = cand_i

    @pl.when(j > 0)
    def _():
        md = jnp.concatenate([out_d_ref[:, :], cand_d], axis=1)  # [TQ, 2k]
        mi = jnp.concatenate([out_i_ref[:, :], cand_i], axis=1)
        col2 = lax.broadcasted_iota(jnp.int32, (tile_q, 2 * k), 1)
        new_d = []
        new_i = []
        for _ in range(k):
            td = jnp.min(md, axis=1)
            tpos = jnp.argmin(md, axis=1).astype(jnp.int32)
            hit = col2 == tpos[:, None]
            new_d.append(td)
            # one-hot select-sum instead of a per-row gather (no dynamic
            # lane gathers in the kernel)
            new_i.append(jnp.sum(jnp.where(hit, mi, 0), axis=1))
            md = jnp.where(hit, jnp.inf, md)
        out_d_ref[:, :] = jnp.stack(new_d, axis=1)
        out_i_ref[:, :] = jnp.stack(new_i, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_m"))
def knnk_pallas(query, query_mask, ref, ref_mask, k: int,
                tile_q: int = 256, tile_m: int = 2048):
    """Exact k-NN: ``(dists2 [N,k], ids [N,k])`` ascending per row, with
    (+inf, -1) for invalid queries / missing neighbors. Fused equivalent of
    ``knn_brute_force`` for 2 ≤ k ≤ KNNK_MAX (the registration prep path:
    SurfaceNormal neighborhoods, knn>1 matcher configs)."""
    assert 1 <= k <= KNNK_MAX, k
    n, d = query.shape
    m = ref.shape[0]
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32).at[:n, :d].set(query)
    rt = jnp.zeros((_DPAD, m_pad), jnp.float32).at[:d, :m].set(ref.T)
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    rpen = jnp.where(rmask_p, 0.0, jnp.inf)[None, :]  # [1, m_pad]

    grid = (n_pad // tile_q, m_pad // tile_m)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nnk_kernel, dim=d, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(3 * d + 6 * k) * n_pad * m_pad,
            bytes_accessed=4 * (n_pad + m_pad) * _DPAD
            + 8 * n_pad * k * (m_pad // tile_m),
            transcendentals=0,
        ),
    )(qp, rt, rpen)

    best_d = out_d[:n]
    best_i = out_i[:n]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(query_mask[:, None], best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(query_mask[:, None], finite), best_i, -1)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m"))
def knn1_pallas_mxu(query, query_mask, ref, ref_mask,
                    tile_q: int = 512, tile_m: int = 2048):
    """1-NN with the distance dot products on the MXU (see kernel doc)."""
    n, d = query.shape
    m = ref.shape[0]
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32).at[:n, :d].set(query)
    rt = jnp.zeros((_DPAD, m_pad), jnp.float32).at[:d, :m].set(ref.T)
    q2 = jnp.sum(qp * qp, axis=1, keepdims=True)  # [n_pad, 1]
    r2 = jnp.sum(rt * rt, axis=0)  # [m_pad]
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    r2pen = jnp.where(rmask_p, r2, jnp.inf)[None, :]

    grid = (n_pad // tile_q, m_pad // tile_m)
    out_d, out_i = pl.pallas_call(
        _nn1_mxu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
    )(qp, rt, q2, r2pen)

    best_d = jnp.maximum(out_d[:n, 0], 0.0)
    best_i = out_i[:n, 0]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(query_mask, best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(query_mask, finite), best_i, -1)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m"))
def knn1_pallas(query, query_mask, ref, ref_mask,
                tile_q: int = 1024, tile_m: int = 0):
    """Exact 1-NN: ``(dists2 [N], ids [N])`` with (+inf, -1) for invalid
    queries / no valid reference. Equivalent to
    ``knn_brute_force(..., k=1)`` squeezed.

    ``tile_m = 0`` picks the reference tile adaptively: the sweep pays for
    every padded reference row in every iteration, so the tile is chosen
    to minimize ``m_pad`` (e.g. a 12800-row map tiles to 12800 with
    tile_m=1024 but to 14336 — +12% work — with 2048; throughput per cell
    is flat across these tile sizes, tools/knn_micro.py)."""
    n, d = query.shape
    m = ref.shape[0]
    if tile_m == 0:
        tile_m = min(
            (2048, 1024, 512),
            key=lambda t: (((m + t - 1) // t) * t, -t),
        )
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32).at[:n, :d].set(query)
    rt = jnp.zeros((_DPAD, m_pad), jnp.float32).at[:d, :m].set(ref.T)
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    rpen = jnp.where(rmask_p, 0.0, jnp.inf)[None, :]  # [1, m_pad]

    nj = m_pad // tile_m
    grid = (n_pad // tile_q, nj)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nn1_kernel, dim=d, nj=nj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, _DPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * m_pad * d + 4 * n_pad * m_pad,
            bytes_accessed=4 * (n_pad + m_pad) * _DPAD
            + 8 * n_pad * (m_pad // tile_m),
            transcendentals=0,
        ),
    )(qp, rt, rpen)

    best_d = out_d[:n, 0]
    best_i = out_i[:n, 0]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(query_mask, best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(query_mask, finite), best_i, -1)
    return best_d, best_i
