"""Pair-parallel batched registration.

The reference's evaluation harness runs one ICP per CPU core
(reference: evaluations/eval_solution.cpp, boost::thread per core). The TPU
analogue is data parallelism over registration pairs: per-pair host
preparation (filters, centering) streams through the device once, all pairs
are padded to a common bucket and stacked, and the **entire fixed-point loop
runs vmapped** — one device program registering B pairs in lockstep (the
loop runs until every pair has stopped; finished pairs keep their final
state, masked by their own checker flags). Shard the leading batch axis over
a mesh and the same program scales across chips and hosts."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import PointCloud, bucket_size
from ..filters.base import apply_filter_chain
from ..icp import ICP
from ..utils import se3

__all__ = ["register_batch"]


def _stack_clouds(clouds: Sequence[PointCloud], cap: int) -> PointCloud:
    padded = []
    for c in clouds:
        if c.num_points != cap:
            c = c.compact(min_size=cap)
            if c.num_points > cap:
                raise ValueError("cloud exceeds the common bucket")
        padded.append(c)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *padded
    )


def register_batch(
    icp: ICP,
    readings: Sequence[PointCloud],
    references: Sequence[PointCloud],
    T_inits: Optional[Sequence] = None,
    seed: int = 0,
    mesh=None,
    axis_name: str = "pairs",
) -> Tuple[np.ndarray, dict]:
    """Register ``readings[i]`` onto ``references[i]`` for all i at once.

    Returns ``(T [B, d+1, d+1], info)`` where info carries per-pair
    iteration counts, error codes and minimizer stats. Uses the same
    pipeline as ``ICP.compute`` (reference: ICP.cpp:265-452) with the loop
    vmapped across pairs. With ``mesh`` given, the batch axis is laid out
    across it and each device registers its share of pairs (multi-chip /
    multi-host scaling axis)."""
    assert len(readings) == len(references)
    b = len(readings)
    dim = readings[0].dim
    key = jax.random.PRNGKey(seed)
    if T_inits is None:
        T_inits = [np.eye(dim + 1, dtype=np.float32)] * b

    prepped_readings: List[PointCloud] = []
    prepped_references: List[PointCloud] = []
    T_refIn_refMean: List[np.ndarray] = []
    T_refMean_dataIn: List[jnp.ndarray] = []
    for i, (reading, reference) in enumerate(zip(readings, references)):
        kr = jax.random.fold_in(key, 2 * i)
        kf = jax.random.fold_in(key, 2 * i + 1)
        reference = apply_filter_chain(icp.reference_filters, reference, kf)
        mean = np.asarray(
            jax.device_get(
                jnp.sum(
                    jnp.where(reference.mask[:, None], reference.points, 0.0),
                    axis=0,
                )
                / jnp.maximum(reference.count(), 1)
            )
        )
        Trm = np.eye(dim + 1, dtype=np.float32)
        Trm[:dim, dim] = mean
        reference = reference.replace(
            points=reference.points - mean[None, :]
        )
        reading = apply_filter_chain(icp.reading_filters, reading, kr)
        T_rmd = se3.inverse(jnp.asarray(Trm)) @ jnp.asarray(
            T_inits[i], jnp.float32
        )
        from ..icp import _apply_transform

        reading = _apply_transform(icp.transformations, reading, T_rmd)
        prepped_readings.append(reading)
        prepped_references.append(reference)
        T_refIn_refMean.append(Trm)
        T_refMean_dataIn.append(T_rmd)

    cap_r = bucket_size(max(c.num_points for c in prepped_readings))
    cap_f = bucket_size(max(c.num_points for c in prepped_references))
    batch_reading = _stack_clouds(prepped_readings, cap_r)
    batch_reference = _stack_clouds(prepped_references, cap_f)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard_batched(cloud):
            def put(x):
                spec = P(axis_name, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            return jax.tree_util.tree_map(put, cloud)

        batch_reading = shard_batched(batch_reading)
        batch_reference = shard_batched(batch_reference)

    cache_key = (
        "batch", b, cap_r, cap_f, dim,
        batch_reading.descriptor_labels(),
        batch_reference.descriptor_labels(),
        icp._config_fingerprint(),
    )
    runner = icp._jit_cache.get(cache_key)
    if runner is None:
        runner = jax.jit(jax.vmap(icp.make_loop_runner()))
        icp._jit_cache[cache_key] = runner
    T_iter, iters, codes, stats = runner(batch_reading, batch_reference)
    return _finish_batch(
        icp, b, T_iter, iters, codes, stats, T_refIn_refMean, T_refMean_dataIn
    )


def _finish_batch(icp, b, T_iter, iters, codes, stats, T_refIn_refMean,
                  T_refMean_dataIn):

    T_out = np.stack(
        [
            np.asarray(
                jnp.asarray(T_refIn_refMean[i])
                @ T_iter[i]
                @ T_refMean_dataIn[i]
            )
            for i in range(b)
        ]
    )
    info = {
        "iterations": np.asarray(iters),
        "codes": np.asarray(codes),
        "point_used_ratio": np.asarray(stats.point_used_ratio),
        "weighted_point_used_ratio": np.asarray(
            stats.weighted_point_used_ratio
        ),
        "residual": np.asarray(stats.residual),
    }
    return T_out, info


def register_batch_to_map(
    seq,
    readings: Sequence[PointCloud],
    T_inits: Optional[Sequence] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, dict]:
    """Batched scan-to-map serving: register many readings against the
    persistent map of an ``ICPSequence`` at once.

    The production shape of the reference's odometry/localization loop
    (reference: ICP.cpp:455-612): the map is filtered, centered and
    acceleration-built exactly once (``seq.set_map``); here each incoming
    scan batch runs one vmapped loop against the broadcast map."""
    from ..icp import _apply_transform

    assert seq.has_map(), "set_map first"
    reference = seq.get_prefiltered_internal_map()
    b = len(readings)
    dim = readings[0].dim
    key = jax.random.PRNGKey(seed)
    Trm = seq._T_refIn_refMean
    Trm_inv = se3.inverse(jnp.asarray(Trm))
    if T_inits is None:
        T_inits = [np.eye(dim + 1, dtype=np.float32)] * b

    prepped = []
    T_refMean_dataIn = []
    for i, reading in enumerate(readings):
        kr = jax.random.fold_in(key, i)
        reading = apply_filter_chain(seq.reading_filters, reading, kr)
        T_rmd = Trm_inv @ jnp.asarray(T_inits[i], jnp.float32)
        prepped.append(_apply_transform(seq.transformations, reading, T_rmd))
        T_refMean_dataIn.append(T_rmd)

    cap_r = bucket_size(max(c.num_points for c in prepped))
    batch_reading = _stack_clouds(prepped, cap_r)

    cache_key = (
        "batch_map", b, cap_r, reference.num_points, dim,
        batch_reading.descriptor_labels(),
        reference.descriptor_labels(),
        seq._config_fingerprint(),
    )
    runner = seq._jit_cache.get(cache_key)
    if runner is None:
        # readings batched, the map shared (in_axes None — no b-fold copy)
        runner = jax.jit(jax.vmap(seq.make_loop_runner(), in_axes=(0, None)))
        seq._jit_cache[cache_key] = runner
    T_iter, iters, codes, stats = runner(batch_reading, reference)
    return _finish_batch(
        seq, b, T_iter, iters, codes, stats, [Trm] * b, T_refMean_dataIn
    )
