"""Experimental 1-NN kernel variants for the round-2 perf push.

The serve-path profile (tools/profile_loop.py) shows the 1-NN sweep is ~96%
of per-iteration cost, and the shipped kernel runs at ~15% of VPU peak.
These variants explore the lowering space; the winner graduates into
ops/knn_pallas.py. Benchmark: tools/knn_micro.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DPAD = 8


# ---------------------------------------------------------------- variant A
# Chunked lane reduction: keep a running per-lane (128-wide) best over the
# TM axis, one compare+2 selects per 128-lane chunk; cross-lane argmin once
# per (i, final-j). Avoids jnp.argmin over a 2048-lane axis per tile.
def _nn1_chunked_kernel(q_ref, rt_ref, rpen_ref, out_d_ref, out_i_ref,
                        acc_d, acc_i, *, dim, nj):
    j = pl.program_id(1)
    tile_m = rt_ref.shape[1]
    tile_q = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        acc_d[:, :] = jnp.full_like(acc_d, jnp.inf)
        acc_i[:, :] = jnp.zeros_like(acc_i)

    nch = tile_m // 128
    best_d = acc_d[:, :]          # [TQ, 128]
    best_i = acc_i[:, :]
    for ch in range(nch):
        sl = slice(ch * 128, (ch + 1) * 128)
        d2 = rpen_ref[0, sl][None, :]
        for c in range(dim):
            diff = q_ref[:, c][:, None] - rt_ref[c, sl][None, :]
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


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m"))
def knn1_chunked(query, query_mask, ref, ref_mask,
                 tile_q: int = 512, tile_m: int = 2048):
    n, d = query.shape
    m = ref.shape[0]
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32).at[:n, :d].set(query)
    rt = jnp.zeros((_DPAD, m_pad), jnp.float32).at[:d, :m].set(ref.T)
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    rpen = jnp.where(rmask_p, 0.0, jnp.inf)[None, :]

    nj = m_pad // tile_m
    grid = (n_pad // tile_q, nj)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nn1_chunked_kernel, dim=d, nj=nj),
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
    )(qp, rt, rpen)

    best_d = out_d[:n, 0]
    best_i = out_i[:n, 0]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(query_mask, best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(query_mask, finite), best_i, -1)
    return best_d, best_i


# ---------------------------------------------------------------- variant B
# Transposed orientation: queries in lanes, reference in sublanes; the
# reduction runs over sublanes.
def _nn1_t_kernel(qt_ref, r_ref, rpen_ref, out_d_ref, out_i_ref, *, dim):
    j = pl.program_id(1)       # reference tile index
    tile_m = r_ref.shape[0]

    d2 = rpen_ref[:]           # [TM, 1] +inf for masked reference rows
    for c in range(dim):
        diff = r_ref[:, c][:, None] - qt_ref[c, :][None, :]
        d2 = d2 + diff * diff  # [TM, TQ]

    td = jnp.min(d2, axis=0)                                # [TQ]
    ti = jnp.argmin(d2, axis=0).astype(jnp.int32) + j * tile_m

    @pl.when(j == 0)
    def _():
        out_d_ref[0, :] = td
        out_i_ref[0, :] = ti

    @pl.when(j > 0)
    def _():
        prev_d = out_d_ref[0, :]
        prev_i = out_i_ref[0, :]
        take = td < prev_d
        out_d_ref[0, :] = jnp.where(take, td, prev_d)
        out_i_ref[0, :] = jnp.where(take, ti, prev_i)


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m"))
def knn1_transposed(query, query_mask, ref, ref_mask,
                    tile_q: int = 2048, tile_m: int = 512):
    n, d = query.shape
    m = ref.shape[0]
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    qt = jnp.zeros((_DPAD, n_pad), jnp.float32).at[:d, :n].set(query.T)
    rp = jnp.zeros((m_pad, _DPAD), jnp.float32).at[:m, :d].set(ref)
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    rpen = jnp.where(rmask_p, 0.0, jnp.inf)[:, None]   # [m_pad, 1]

    grid = (n_pad // tile_q, m_pad // tile_m)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nn1_t_kernel, dim=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_DPAD, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _DPAD), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
    )(qt, rp, rpen)

    best_d = out_d[0, :n]
    best_i = out_i[0, :n]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(query_mask, best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(query_mask, finite), best_i, -1)
    return best_d, best_i


# ---------------------------------------------------------------- variant C
# MXU with default f32 handling (Mosaic decomposes f32 matmuls itself)
def _nn1_mxu3_kernel(q_ref, rt_ref, q2_ref, r2pen_ref, out_d_ref, out_i_ref,
                     *, precision):
    j = pl.program_id(1)
    tile_m = rt_ref.shape[1]
    dots = lax.dot_general(
        q_ref[:], rt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
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


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_m", "precision"))
def knn1_mxu(query, query_mask, ref, ref_mask,
             tile_q: int = 512, tile_m: int = 2048, precision="highest"):
    n, d = query.shape
    m = ref.shape[0]
    n_pad = ((n + tile_q - 1) // tile_q) * tile_q
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    # K padded to the full 128-lane contraction width
    K = 128
    qp = jnp.zeros((n_pad, K), jnp.float32).at[:n, :d].set(query)
    rt = jnp.zeros((K, m_pad), jnp.float32).at[:d, :m].set(ref.T)
    q2 = jnp.sum(qp * qp, axis=1, keepdims=True)
    r2 = jnp.sum(rt * rt, axis=0)
    rmask_p = jnp.zeros((m_pad,), bool).at[:m].set(ref_mask)
    r2pen = jnp.where(rmask_p, r2, jnp.inf)[None, :]

    prec = dict(
        highest=lax.Precision.HIGHEST,
        high=lax.Precision.HIGH,
        default=lax.Precision.DEFAULT,
    )[precision]
    grid = (n_pad // tile_q, m_pad // tile_m)
    out_d, out_i = pl.pallas_call(
        functools.partial(_nn1_mxu3_kernel, precision=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_m), lambda i, j: (0, j),
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
