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
           "sharded_block_nn1", "sharded_tile_nn1"]


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


def sharded_tile_nn1(points, qmask, q_rows, blocks, sub_pts, sub_ids,
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
                  P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(pts, qm, rows, blk, spts, sids):
        ld, li = tile_nn1(pts, qm, rows, blk, spts, sids, max_dist)
        gd = jax.lax.pmin(ld, axis_name)
        big = jnp.int32(np.iinfo(np.int32).max)
        cand = jnp.where(
            jnp.logical_and(ld == gd, li >= 0), li, big
        )
        gi = jax.lax.pmin(cand, axis_name)
        return gd, jnp.where(gi == big, -1, gi)

    return run(points, qmask, q_rows, blocks, sub_pts, sub_ids)
