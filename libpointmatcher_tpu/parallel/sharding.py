"""Multi-device sharding for registration at pod scale.

The reference is a single-process CPU library (SURVEY §2.13: its only
parallelism is an optional std::async octree build and a thread-per-core
evaluation sweep). Scaling point-cloud registration across TPU chips is new
design, following the jit/sharding recipe:

- **Reference/map sharding**: the reference cloud's point axis is laid out
  across the mesh (``P('points')``). The tiled distance sweep then runs
  shard-locally, and XLA inserts the ICI collectives (all-gather of the
  per-shard top-k, psum of minimizer normal equations) where sharding
  propagation demands them.
- **Replicated reading**: each chip matches the full reading against its
  reference shard — the merge of per-shard candidates is a k-way top-k,
  exact because brute force is exact per shard.
- **Pair-parallel evaluation**: the ETH protocol sweep (one ICP per
  scan pair) is data-parallel over pairs/hosts, the TPU analogue of the
  reference's thread-per-core eval (reference: evaluations/eval_solution.cpp).

``sharded_knn`` is the explicit shard_map path: per-shard exact kNN + ICI
all-gather merge; it returns bit-identical results to the single-device op.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cloud import PointCloud
from ..ops.knn import knn_brute_force

__all__ = ["make_mesh", "shard_cloud", "replicate_cloud", "sharded_knn",
           "sharded_block_nn1", "sharded_tile_nn1",
           "sharded_nn1_sorted_v2", "pad_sweep_tables_for_mesh"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def _cloud_specs(cloud: PointCloud, spec_row) -> PointCloud:
    """PointCloud of PartitionSpecs matching the cloud's structure."""
    return PointCloud.tree_unflatten(
        cloud.tree_flatten()[1],
        (
            P(spec_row, None),
            P(spec_row),
            tuple(P(spec_row, None) for _ in cloud.descriptors),
            tuple(P(spec_row, None) for _ in cloud.times),
        ),
    )


def shard_cloud(cloud: PointCloud, mesh: Mesh, axis_name: str = "points") -> PointCloud:
    """Lay the cloud's point axis across the mesh (pad to divisibility first)."""
    n_dev = mesh.shape[axis_name]
    if cloud.num_points % n_dev != 0:
        target = ((cloud.num_points + n_dev - 1) // n_dev) * n_dev
        cloud = cloud.compact(min_size=target)
        if cloud.num_points % n_dev != 0:
            raise ValueError(
                f"cannot shard {cloud.num_points} rows over {n_dev} devices"
            )
    specs = _cloud_specs(cloud, axis_name)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(cloud, shardings)


def replicate_cloud(cloud: PointCloud, mesh: Mesh) -> PointCloud:
    specs = _cloud_specs(cloud, None)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(cloud, shardings)


def sharded_knn(query, query_mask, ref, ref_mask, k: int, mesh: Mesh,
                axis_name: str = "points", tile_m: int = 2048):
    """Exact kNN with the reference axis sharded over the mesh.

    Per shard: local exact top-k via the MXU-tiled sweep; then one ICI
    all-gather of the [n_dev, N, k] candidates and a replicated k-way merge.
    Communication volume is O(n_dev·N·k), independent of reference size."""
    n_dev = mesh.shape[axis_name]
    m = ref.shape[0]
    assert m % n_dev == 0, "reference rows must divide the mesh"
    local_m = m // n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q, qm, r, rm):
        ld, li = knn_brute_force(q, qm, r, rm, k=k, tile_m=tile_m)
        shard = jax.lax.axis_index(axis_name)
        gi = jnp.where(li >= 0, li + shard * local_m, -1)
        all_d = jax.lax.all_gather(ld, axis_name)  # [n_dev, N, k]
        all_i = jax.lax.all_gather(gi, axis_name)
        n = q.shape[0]
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(n, n_dev * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(n, n_dev * k)
        neg, pos = jax.lax.top_k(-cat_d, k)
        best_d = -neg
        best_i = jnp.take_along_axis(cat_i, pos, axis=1)
        best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
        return best_d, best_i

    return run(query, query_mask, ref, ref_mask)


def sharded_block_nn1(points, qb_rows, qb_nb_slots, blocks, block_ids,
                      max_dist: float, mesh: Mesh,
                      axis_name: str = "points"):
    """Bounded-radius 1-NN with the *query-block* axis sharded over the mesh
    (the multi-chip form of ``ops.cellblocks.block_nn1``).

    Each device sweeps its slice of query cells against the replicated
    reference blocks. Query rows are owned by exactly one query block, so
    each shard's [N] outputs are disjoint (+inf / -1 elsewhere) and the
    merge is a single pmin/pmax pair over ICI — communication O(n_dev·N),
    independent of reference size. Bit-identical to the single-device op.

    ``qb_rows.shape[0]`` (the bucketed Cq axis) must divide the mesh size —
    ``assign_query_blocks`` buckets Cq on the 256-granule ladder, which is
    divisible by any power-of-two mesh up to 128."""
    from ..ops.cellblocks import QueryBlocks, block_nn1

    n_dev = mesh.shape[axis_name]
    assert qb_rows.shape[0] % n_dev == 0, (
        f"query-block axis {qb_rows.shape[0]} must divide mesh {n_dev}"
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(pts, rows, nbs, blk, bid):
        ld, li = block_nn1(pts, QueryBlocks(rows, nbs), blk, bid, max_dist)
        return (
            jax.lax.pmin(ld, axis_name),
            jax.lax.pmax(li, axis_name),
        )

    return run(points, qb_rows, qb_nb_slots, blocks, block_ids)


def sharded_tile_nn1(points, qmask, q_rows, blocks, sub_units,
                     max_dist: float, mesh: Mesh,
                     axis_name: str = "points"):
    """Bounded-radius 1-NN with the *query-tile* axis sharded over the mesh
    (the multi-chip form of ``ops.tilesweep.tile_nn1``).

    Each device sweeps its slice of query tiles against the replicated
    sub-block table. A query row's tiles may land on several devices
    (virtual tiles share query rows — assign_tiles ``block_cap``), so the
    merge is min over distance with the smallest original row id among
    exact distance ties — the same convention as the single-device
    scatter-min merge, hence bit-identical to it. Communication is one
    pmin pair over ICI, O(n_dev·N), independent of reference size.

    ``q_rows.shape[0]`` (the tile axis, bucketed at granule 16 by
    ``assign_tiles`` — both parent and virtual tile axes) must divide the
    mesh size."""
    from ..ops.tilesweep import tile_nn1

    n_dev = mesh.shape[axis_name]
    assert q_rows.shape[0] % n_dev == 0, (
        f"tile axis {q_rows.shape[0]} must divide mesh {n_dev}"
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name, None), P(axis_name, None),
                  P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(pts, qm, rows, blk, sunits):
        ld, li = tile_nn1(pts, qm, rows, blk, sunits, max_dist)
        gd = jax.lax.pmin(ld, axis_name)
        big = jnp.int32(np.iinfo(np.int32).max)
        cand = jnp.where(
            jnp.logical_and(ld == gd, li >= 0), li, big
        )
        gi = jax.lax.pmin(cand, axis_name)
        return gd, jnp.where(gi == big, -1, gi)

    return run(points, qmask, q_rows, blocks, sub_units)


def pad_sweep_tables_for_mesh(rt3, ct, n_dev: int):
    """Pad the survivor-sweep map tables (ops/knn_sweep2) so the CHUNK
    axis divides an ``n_dev`` mesh with per-shard lane alignment: each
    shard must hold a multiple of 128 chunks (the bounds kernel's lane
    group) — pad chunks are empty (+inf penalty rows, _FAR bbox, count 0)
    so they never survive, never bind a bound and never win a sweep.
    Returns (rt3_pad [nch2, 8, 128], ct_pad [8, nch2])."""
    import numpy as np

    from ..ops.knn_sweep2 import _FAR

    nch = rt3.shape[0]
    local = -(-nch // (128 * n_dev)) * 128
    nch2 = local * n_dev
    rt3_pad = np.zeros((nch2, rt3.shape[1], rt3.shape[2]), np.float32)
    rt3_pad[:nch] = np.asarray(rt3)
    rt3_pad[nch:, 3, :] = np.inf          # penalty row: dead candidates
    assert ct.shape[1] <= nch2
    ct_pad = np.full((ct.shape[0], nch2), np.float32(_FAR))
    ct_pad[:, :ct.shape[1]] = np.asarray(ct)
    ct_pad[6:, ct.shape[1]:] = 0.0         # count row: can't bind k-bounds
    return rt3_pad, ct_pad


def sharded_nn1_sorted_v2(qs, qm, ub_t, rt3, ct, mesh: Mesh,
                          axis_name: str = "points"):
    """Survivor-list exact 1-NN with the MAP CHUNK axis sharded over the
    mesh (round-5, verdict #8: pruned serving for sharded resident maps).

    Each device runs the full bounds→survivors→sweep pipeline
    (ops/knn_sweep2.nn1_sorted_v2) over ITS chunk span with replicated
    queries — the per-shard upper bound is looser than the global one
    (min over local chunks only), which keeps strictly more survivors:
    still exact, just less pruned. Local winners are translated to global
    sorted-map rows (shard * local_chunks * 128) and min-merged over ICI
    with the (min distance, min row id on ties) convention. Sharding the
    chunk axis also multiplies the VMEM-resident window by the mesh size
    (8 x 32k-row shards = a 262k-row map without the HBM-streaming
    variant). Tables must come from :func:`pad_sweep_tables_for_mesh`.
    """
    n_dev = mesh.shape[axis_name]
    nch = rt3.shape[0]
    assert nch % n_dev == 0 and (nch // n_dev) % 128 == 0, (
        f"chunk axis {nch} must split into 128-multiples over {n_dev} "
        "devices (pad_sweep_tables_for_mesh)"
    )
    local_nch = nch // n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name, None, None),
                  P(None, axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q, qmask, ub, rt3_l, ct_l):
        from ..ops.knn_sweep2 import nn1_sorted_v2

        d2, ids, _ = nn1_sorted_v2(q, qmask, ub, rt3_l, ct_l)
        shard = jax.lax.axis_index(axis_name)
        gids = jnp.where(ids >= 0, ids + shard * local_nch * 128, -1)
        gd = jax.lax.pmin(d2, axis_name)
        big = jnp.int32(np.iinfo(np.int32).max)
        cand = jnp.where(jnp.logical_and(d2 == gd, gids >= 0), gids, big)
        gi = jax.lax.pmin(cand, axis_name)
        return gd, jnp.where(gi == big, -1, gi)

    return run(qs, qm, ub_t, rt3, ct)
