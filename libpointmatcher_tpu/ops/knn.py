"""Batched k-nearest-neighbor search — the TPU replacement for libnabo.

The reference delegates all NN queries to an external CPU kd-tree
(reference: MatchersImpl.cpp:78-101, libnabo). Tree traversal is pointer
chasing and maps terribly to TPUs; instead we compute the exact k-NN with a
**tiled squared-distance sweep**: for each tile of reference points, evaluate
``Σ_c (q_c − r_c)²`` for all queries at once (the exact f32 difference form —
the matmul expansion form cancels catastrophically, see the step comment),
then fold the tile into a running top-k held in registers/VMEM. Memory is
O(N·tile), never O(N·M).

Exactness: brute force is exact kNN — the reference's ``epsilon`` parameter
(approximate-search slack traded for speed in a kd-tree) is accepted for
config parity but has no effect; we return the exact neighbors that
``epsilon: 0`` would.

Invalid conventions match the reference (PointMatcher.h:377-378):
missing neighbors have distance +inf and id -1.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["knn_brute_force"]


def _pad_rows(arr, target, fill=0.0):
    n = arr.shape[0]
    if n == target:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("k", "tile_m"))
def knn_brute_force(query, query_mask, ref, ref_mask, k: int = 1, tile_m: int = 2048):
    """Exact kNN of ``query`` [N,d] into ``ref`` [M,d].

    Returns ``(dists2 [N,k], ids [N,k])`` with squared distances ascending per
    row; invalid queries or missing neighbors get (+inf, -1).
    """
    n, d = query.shape
    m = ref.shape[0]
    tile_m = min(tile_m, max(128, 1 << math.ceil(math.log2(max(m, 1)))))
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m

    refp = _pad_rows(ref, m_pad)
    rmaskp = _pad_rows(ref_mask, m_pad, fill=False)

    num_tiles = m_pad // tile_m
    ref_tiles = refp.reshape(num_tiles, tile_m, d)
    rmask_tiles = rmaskp.reshape(num_tiles, tile_m)

    inf = jnp.float32(jnp.inf)
    init_d = jnp.full((n, k), inf, dtype=jnp.float32)
    init_i = jnp.full((n, k), -1, dtype=jnp.int32)

    def step(carry, tile):
        best_d, best_i = carry
        rt, mt, tidx = tile
        # [N, TM] squared distances in the EXACT f32 difference form.
        # The expansion form ‖q‖²+‖r‖²−2q·r (even with the dot at HIGHEST
        # precision) cancels catastrophically: at coordinate scale s the
        # result quantizes at ~s²·2⁻²⁴ — ~1e-3 absolute on the car clouds,
        # which mis-ranks genuinely distinct neighbors (measured against
        # the Pallas difference-form kernel, round 3). XLA fuses the
        # subtract/square/reduce into one loop; nothing is materialized
        # at [N, TM, d].
        d2 = jnp.zeros((n, rt.shape[0]), jnp.float32)
        for c in range(d):
            diff = query[:, c][:, None] - rt[:, c][None, :]
            d2 = d2 + diff * diff
        d2 = jnp.where(mt[None, :], d2, inf)
        gids = (tidx * tile_m + lax.broadcasted_iota(jnp.int32, (1, tile_m), 1))
        gids = jnp.broadcast_to(gids, (n, tile_m))
        if k == 1:
            td = jnp.min(d2, axis=1)
            ti = jnp.argmin(d2, axis=1).astype(jnp.int32)
            take = td < best_d[:, 0]
            new_d = jnp.where(take, td, best_d[:, 0])[:, None]
            new_i = jnp.where(
                jnp.logical_and(take, jnp.isfinite(td)),
                jnp.take_along_axis(gids, ti[:, None], axis=1)[:, 0],
                best_i[:, 0],
            )[:, None]
            return (new_d, new_i), None
        merged_d = jnp.concatenate([best_d, d2], axis=1)
        merged_i = jnp.concatenate([best_i, gids], axis=1)
        neg_top, pos = lax.top_k(-merged_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(merged_i, pos, axis=1)
        new_i = jnp.where(jnp.isfinite(new_d), new_i, -1)
        return (new_d, new_i), None

    tiles = (ref_tiles, rmask_tiles, jnp.arange(num_tiles, dtype=jnp.int32))
    (best_d, best_i), _ = lax.scan(step, (init_d, init_i), tiles)

    qvalid = query_mask[:, None]
    best_d = jnp.where(qvalid, best_d, inf)
    best_i = jnp.where(qvalid, best_i, -1)
    return best_d, best_i
