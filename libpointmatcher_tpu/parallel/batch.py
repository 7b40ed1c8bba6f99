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
from ..filters.base import (
    apply_filter_chain,
    apply_filter_chain_traced,
    chain_is_traceable,
)
from ..icp import ICP
from ..matchers import Matcher
from ..utils import se3

__all__ = ["register_batch", "register_batch_to_map",
           "PendingRegistration"]


class PendingRegistration:
    """Handle for a dispatched serving batch
    (``register_batch_to_map(..., block=False)``): jax dispatch is
    asynchronous, so the device program runs while the host prepares and
    dispatches the NEXT batch; ``result()`` performs the single
    synchronized readback. Pipelining batches this way hides the
    per-batch dispatch + transfer latency behind device compute."""

    def __init__(self, finisher):
        self._finisher = finisher
        self._out = None

    def result(self):
        if self._out is None:
            self._out = self._finisher()
            self._finisher = None
        return self._out


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


def _stack_clouds_padded(clouds: Sequence[PointCloud],
                         min_rows: int = 0,
                         prefer_numpy: bool = False) -> PointCloud:
    """Pad to a common bucketed row count and stack — zero host syncs
    (row counts come from static shapes; padded rows carry mask=False).
    ``min_rows`` floors the bucket so independent batches of a sweep can
    share one compiled program (the eval ladder).

    ``prefer_numpy=True`` (the TILE serving drivers): clouds carrying a
    host cache are padded and stacked in numpy and ride into the serving
    program as plain call arguments — zero eager dispatches, proven part
    of the tile path's 869→254 ms/batch rework
    (tools/tile_phase_profile.py). Default False: pad/stack the
    device-resident leaves with async eager ops — scans are usually
    already on device, and re-transferring a large pool every call
    measured a 38.3→29.5 reg/s regression on the 25k-car c2f queue
    (round-5 A/B, PMTPU_STACK_NUMPY)."""
    cap = bucket_size(max(min_rows, max(c.num_points for c in clouds)))

    import os as _os

    env = _os.environ.get("PMTPU_STACK_NUMPY", "")
    use_numpy = prefer_numpy if env == "" else env not in ("0",)
    if (use_numpy
            and all(getattr(c, "_host_cache", None) is not None
                    for c in clouds)):
        pts0, _, descs0, tms0 = clouds[0]._host_cache
        b = len(clouds)
        pts = np.zeros((b, cap, pts0.shape[1]), np.float32)
        mask = np.zeros((b, cap), bool)
        descs = {k: np.zeros((b, cap, v.shape[1]), v.dtype)
                 for k, v in descs0.items()}
        tms = {k: np.zeros((b, cap, v.shape[1]), v.dtype)
               for k, v in tms0.items()}
        ok = True
        for i, c in enumerate(clouds):
            p, m, ds, ts = c._host_cache
            if (p.shape[0] > cap or set(ds) != set(descs)
                    or set(ts) != set(tms)
                    or any(ds[k].shape[1] != descs[k].shape[2] for k in ds)
                    or any(ts[k].shape[1] != tms[k].shape[2] for k in ts)):
                ok = False
                break
            n = p.shape[0]
            pts[i, :n] = p
            mask[i, :n] = m
            for k in ds:
                descs[k][i, :n] = ds[k]
            for k in ts:
                tms[k][i, :n] = ts[k]
        if ok:
            obj = object.__new__(PointCloud)
            obj.points = pts
            obj.mask = mask
            obj.descriptors = descs
            obj.times = tms
            obj._count_cache = None
            obj._host_cache = None
            return obj

    def pad(x):
        n = x.shape[0]
        if n == cap:
            return x
        return jnp.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1))

    padded = [jax.tree_util.tree_map(pad, c) for c in clouds]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *padded)


def register_batch(
    icp: ICP,
    readings: Sequence[PointCloud],
    references: Sequence[PointCloud],
    T_inits: Optional[Sequence] = None,
    seed: int = 0,
    mesh=None,
    axis_name: str = "pairs",
    min_rows_reading: int = 0,
    min_rows_reference: int = 0,
) -> Tuple[np.ndarray, dict]:
    """Register ``readings[i]`` onto ``references[i]`` for all i at once.

    Returns ``(T [B, d+1, d+1], info)`` where info carries per-pair
    iteration counts, error codes and minimizer stats. Uses the same
    pipeline as ``ICP.compute`` (reference: ICP.cpp:265-452) with the loop
    vmapped across pairs. With ``mesh`` given, the batch axis is laid out
    across it and each device registers its share of pairs (multi-chip /
    multi-host scaling axis). ``min_rows_*`` floor the padded row buckets
    so every batch of a sweep lands on ONE compiled program regardless of
    which pairs it holds (each distinct shape is a separate relay compile
    — the round-3 eval sweep paid minutes per bucket)."""
    assert len(readings) == len(references)
    b = len(readings)
    dim = readings[0].dim
    key = jax.random.PRNGKey(seed)
    if T_inits is None:
        T_inits = [np.eye(dim + 1, dtype=np.float32)] * b

    # Fused pair prep: when BOTH filter chains are traceable (e.g. the
    # official Besl92 solution: MinDist + RandomSampling on both sides),
    # the per-pair chains, centerings, pre-transforms, loops and frame
    # compositions are ONE device program — the eval sweep's host prep
    # (measured ~seconds/pair through per-filter compaction syncs) drops
    # to one probe sync per (shape, config). Untraceable chains (Chen91's
    # SamplingSurfaceNormal reference side) keep the per-pair path below
    # (reference: eval_solution.cpp:125-131, the sweep this accelerates).
    fused = (
        mesh is None
        and chain_is_traceable(icp.reading_filters)
        and chain_is_traceable(icp.reference_filters)
        and icp._step_chain_traced()
        and type(icp.matcher).prepare_loop is Matcher.prepare_loop
    )
    if fused:
        out = _register_batch_fused(icp, readings, references, T_inits, seed,
                                    min_rows_reading, min_rows_reference)
        if out is not None:
            return out
        # overflow of a probed compaction cap: recompute exactly below

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

    cap_r = bucket_size(max(
        min_rows_reading, max(c.num_points for c in prepped_readings)
    ))
    cap_f = bucket_size(max(
        min_rows_reference, max(c.num_points for c in prepped_references)
    ))
    batch_reading = _stack_clouds(prepped_readings, cap_r)
    batch_reference = _stack_clouds(prepped_references, cap_f)
    multiproc = False
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # DCN axis (SURVEY §2.13): a mesh spanning >1 process — every
        # process holds the same full batch (deterministic prep), serves
        # its addressable shards, and gets replicated outputs back so the
        # final device_get works everywhere (validated by
        # tools/dryrun_multihost.py, 2 CPU processes x 4 virtual devices)
        multiproc = len(
            {d.process_index for d in np.asarray(mesh.devices).flat}
        ) > 1

        def shard_batched(cloud):
            def put(x):
                spec = P(axis_name, *([None] * (x.ndim - 1)))
                sh = NamedSharding(mesh, spec)
                if multiproc:
                    xl = np.asarray(jax.device_get(x))
                    return jax.make_array_from_callback(
                        xl.shape, sh, lambda idx: xl[idx]
                    )
                return jax.device_put(x, sh)

            return jax.tree_util.tree_map(put, cloud)

        batch_reading = shard_batched(batch_reading)
        batch_reference = shard_batched(batch_reference)

    cache_key = (
        "batch", b, cap_r, cap_f, dim, multiproc,
        batch_reading.descriptor_labels(),
        batch_reference.descriptor_labels(),
        icp._config_fingerprint(),
    )
    runner = icp._jit_cache.get(cache_key)
    if runner is None:
        if multiproc:
            from jax.sharding import NamedSharding, PartitionSpec as P

            runner = jax.jit(
                jax.vmap(icp.make_loop_runner()),
                out_shardings=NamedSharding(mesh, P()),
            )
        else:
            runner = jax.jit(jax.vmap(icp.make_loop_runner()))
        icp._jit_cache[cache_key] = runner
    T_iter, iters, codes, stats = runner(batch_reading, batch_reference)
    return _finish_batch(
        icp, b, T_iter, iters, codes, stats, T_refIn_refMean, T_refMean_dataIn
    )


def _probe_cap(icp, filters, cloud, rows, seed, tag):
    """Keep-rate probe for a traceable chain, cached per (shape, config):
    returns a static row capacity covering the batch's padded rows at the
    observed keep rate + headroom (same sizing rule as serving's
    compact_rows='auto')."""
    cap_key = (
        tag, rows,
        icp._config_fingerprint(),
        tuple(
            (type(f).__name__, tuple(sorted(f.parameters.items())))
            for f in filters
        ),
    )
    cap = icp._jit_cache.get(cap_key)
    if cap is None:
        probe = apply_filter_chain_traced(
            tuple(filters), cloud,
            jax.random.fold_in(jax.random.PRNGKey(seed), 0),
        )
        n, n_in = (
            int(v) for v in np.asarray(jax.device_get(
                jnp.stack([jnp.sum(probe.mask), cloud.count()])
            ))
        )
        keep_rate = n / max(n_in, 1)
        cap = min(rows, 512 * -(-int(keep_rate * rows * 1.08 + 512) // 512))
        icp._jit_cache[cap_key] = cap
    return None if cap >= rows else cap


def _register_batch_fused(icp, readings, references, T_inits, seed,
                          min_rows_reading: int = 0,
                          min_rows_reference: int = 0):
    """One-program pair-parallel path (see register_batch): per-pair filter
    chains + centering + pre-transform + fixed-point loop + frame
    composition, vmapped. Returns None when a probed compaction cap
    overflowed (caller recomputes via the exact per-pair path)."""
    from ..icp import _apply_transform

    b = len(readings)
    dim = readings[0].dim
    batch_reading = _stack_clouds_padded(readings, min_rows_reading)
    batch_reference = _stack_clouds_padded(references, min_rows_reference)
    rows_r = batch_reading.points.shape[-2]
    rows_f = batch_reference.points.shape[-2]
    T_inits_b = jnp.stack([jnp.asarray(t, jnp.float32) for t in T_inits])

    cap_r = _probe_cap(icp, icp.reading_filters, readings[0], rows_r,
                       seed, "pair_cap_r")
    cap_f = _probe_cap(icp, icp.reference_filters, references[0], rows_f,
                       seed, "pair_cap_f")

    cache_key = (
        "batch_fused", b, rows_r, rows_f, cap_r, cap_f, dim,
        batch_reading.descriptor_labels(),
        batch_reference.descriptor_labels(),
        icp._config_fingerprint(),
        tuple(
            (type(f).__name__, tuple(sorted(f.parameters.items())))
            for f in list(icp.reading_filters) + list(icp.reference_filters)
        ),
    )
    runner = icp._jit_cache.get(cache_key)
    if runner is None:
        reading_filters = tuple(icp.reading_filters)
        reference_filters = tuple(icp.reference_filters)
        transformations = tuple(icp.transformations)
        run_loop = icp.make_loop_runner()

        def full(batch_reading, batch_reference, T_inits_b, seed_):
            key = jax.random.PRNGKey(seed_)

            def prep(reading, reference, T_init, i):
                kr = jax.random.fold_in(key, 2 * i)
                kf = jax.random.fold_in(key, 2 * i + 1)
                reference = apply_filter_chain_traced(
                    reference_filters, reference, kf
                )
                overflow = jnp.bool_(False)
                if cap_f is not None:
                    overflow = reference.count() > cap_f
                    reference = reference.compact_traced(cap_f)
                mean = jnp.sum(
                    jnp.where(reference.mask[:, None], reference.points, 0.0),
                    axis=0,
                ) / jnp.maximum(reference.count(), 1)
                reference = reference.replace(
                    points=reference.points - mean[None, :]
                )
                Trm = jnp.eye(
                    dim + 1, dtype=jnp.float32
                ).at[:dim, dim].set(mean)
                reading = apply_filter_chain_traced(
                    reading_filters, reading, kr
                )
                if cap_r is not None:
                    overflow = jnp.logical_or(
                        overflow, reading.count() > cap_r
                    )
                    reading = reading.compact_traced(cap_r)
                T_rmd = se3.inverse(Trm) @ T_init
                reading = _apply_transform(transformations, reading, T_rmd)
                return reading, reference, Trm, T_rmd, overflow

            # split vmaps (the serving lesson: fusing prep into the same
            # per-pair closure as the while_loop pulls prep into the body)
            pr, pf, Trm_b, Trd_b, overflow = jax.vmap(
                prep, in_axes=(0, 0, 0, 0)
            )(batch_reading, batch_reference, T_inits_b, jnp.arange(b))
            T_iter, iters, code, stats = jax.vmap(run_loop)(pr, pf)
            T_out = jnp.einsum("bij,bjk,bkl->bil", Trm_b, T_iter, Trd_b)
            return T_out, iters, code, stats, overflow

        runner = jax.jit(full)
        icp._jit_cache[cache_key] = runner

    T_out, iters, codes, stats, overflow = runner(
        batch_reading, batch_reference, T_inits_b, jnp.int32(seed)
    )
    T_out, iters, codes, pur, wpur, res, overflow = jax.device_get(
        (T_out, iters, codes, stats.point_used_ratio,
         stats.weighted_point_used_ratio, stats.residual, overflow)
    )
    if np.asarray(overflow).any():
        return None  # exact recompute on the per-pair path
    info = {
        "iterations": np.asarray(iters),
        "codes": np.asarray(codes),
        "point_used_ratio": np.asarray(pur),
        "weighted_point_used_ratio": np.asarray(wpur),
        "residual": np.asarray(res),
    }
    return np.asarray(T_out), info


def _finish_batch(icp, b, T_iter, iters, codes, stats, T_refIn_refMean,
                  T_refMean_dataIn):
    # compose all frames on device, then ONE synchronized pull
    Trm_b = jnp.stack([jnp.asarray(t, jnp.float32) for t in T_refIn_refMean])
    Trd_b = jnp.stack([jnp.asarray(t, jnp.float32) for t in T_refMean_dataIn])
    T_out = jnp.einsum("bij,bjk,bkl->bil", Trm_b, T_iter, Trd_b)
    T_out, iters, codes, pur, wpur, res = jax.device_get(
        (T_out, iters, codes, stats.point_used_ratio,
         stats.weighted_point_used_ratio, stats.residual)
    )
    info = {
        "iterations": np.asarray(iters),
        "codes": np.asarray(codes),
        "point_used_ratio": np.asarray(pur),
        "weighted_point_used_ratio": np.asarray(wpur),
        "residual": np.asarray(res),
    }
    return np.asarray(T_out), info


def register_batch_to_map(
    seq,
    readings: Sequence[PointCloud],
    T_inits: Optional[Sequence] = None,
    seed: int = 0,
    compact_rows="auto",
    mesh=None,
    map_axis: str = "points",
    block: bool = True,
) -> Tuple[np.ndarray, dict]:
    """Batched scan-to-map serving: register many readings against the
    persistent map of an ``ICPSequence`` at once.

    ``block=False`` returns a :class:`PendingRegistration` instead of
    ``(T, info)``: the batch is dispatched (async) and the caller reads
    it back later via ``.result()`` — dispatch the next batch first and
    the readback overlaps device compute.

    The production shape of the reference's odometry/localization loop
    (reference: ICP.cpp:455-612): the map is filtered, centered and
    acceleration-built exactly once (``seq.set_map``); here each incoming
    scan batch runs one vmapped loop against the broadcast map.

    When every reading filter is jit-traceable (the default chain is), the
    ENTIRE serving call — per-scan filter chains, pre-transforms, the
    fixed-point loops and the final frame compositions — is one device
    program with a single host readback; measured on chip the host-side
    per-batch overhead (per-scan compaction syncs, per-pair device_gets,
    ~25 ms/round-trip through the transfer path) was ~70% of serving time.
    Host-stateful filters fall back to the per-scan prep path. On the fused
    path an emptied scan reports the engine's no-inliers code in
    ``info['codes']`` instead of raising ``ConvergenceError``.

    ``compact_rows`` packs each filtered scan to a static row capacity
    inside the program (cumsum-rank scatter), so the per-iteration sweep
    pays only for surviving points instead of the full input rows. "auto"
    probes the chain once per (shape, config), scaling the observed
    keep-rate to the batch's full padded capacity (the worst case: a later
    scan that is denser than the probe) plus ~8% headroom; pass an int to
    pin it, or None to disable. Truncation is never silent: each pair's
    pre-compaction survivor count is checked against the cap inside the
    program and surfaced as ``info['compact_overflow']`` (True where points
    beyond the cap were dropped — a contiguous scan-order cut, so treat it
    as a signal to pin a larger cap, not as a benign subsample)."""
    assert seq.has_map(), "set_map first"
    reference = seq.get_prefiltered_internal_map()
    if mesh is not None:
        # map-sharded serving: the map's point axis is laid out across the
        # mesh (set_map's fine 512-granule bucket divides any ≤128-device
        # mesh without re-compaction, so row ids — and with them the tile
        # matcher's sub-block tables — stay valid); XLA inserts the ICI
        # collectives the sharded sweep and minimizer gathers demand
        from .sharding import shard_cloud

        reference = shard_cloud(reference, mesh, map_axis)
    b = len(readings)
    dim = readings[0].dim
    Trm = seq._T_refIn_refMean
    if T_inits is None:
        T_inits = [np.eye(dim + 1, dtype=np.float32)] * b

    has_aux = seq.matcher.serving_loop_aux(reference)
    fused = (
        chain_is_traceable(seq.reading_filters)
        and seq._step_chain_traced()
        and not seq.inspector.needs_iteration_data
        and (has_aux
             or type(seq.matcher).prepare_loop is Matcher.prepare_loop)
    )
    if not fused:
        out = _register_batch_to_map_host(
            seq, readings, T_inits, seed, reference
        )
        return out if block else PendingRegistration(lambda: out)
    if has_aux:
        return _register_batch_to_map_aux(
            seq, readings, T_inits, seed, reference,
            compact_rows=compact_rows, block=block,
        )

    batch_reading = _stack_clouds_padded(readings)
    T_inits_b = jnp.stack([jnp.asarray(t, jnp.float32) for t in T_inits])
    # per-pair padded row count: the stacked cloud is [B, rows, d], so
    # ``num_points`` would be B — use the row axis (round-1 bug: the cap
    # logic compared against B and silently disabled compaction)
    rows = batch_reading.points.shape[-2]

    cap = _serve_compact_cap(seq, readings, rows, seed, compact_rows)

    cache_key = (
        "serve_fused", b, rows, reference.num_points,
        cap, dim,
        batch_reading.descriptor_labels(),
        reference.descriptor_labels(),
        seq._config_fingerprint(),
        tuple(
            (type(f).__name__, tuple(sorted(f.parameters.items())))
            for f in seq.reading_filters
        ),
    )
    runner = seq._jit_cache.get(cache_key)
    if runner is None:
        runner = _build_serve_runner(seq, b, cap)
        seq._jit_cache[cache_key] = runner

    T_out, iters, codes, stats, overflow = runner(
        batch_reading, T_inits_b, Trm, reference, jnp.int32(seed)
    )

    def finish():
        # one synchronized pull for everything the host needs
        T, it, cd, pur, wpur, res, ovf = jax.device_get(
            (T_out, iters, codes, stats.point_used_ratio,
             stats.weighted_point_used_ratio, stats.residual, overflow)
        )
        info = {
            "iterations": np.asarray(it),
            "codes": np.asarray(cd),
            "point_used_ratio": np.asarray(pur),
            "weighted_point_used_ratio": np.asarray(wpur),
            "residual": np.asarray(res),
            "compact_overflow": np.asarray(ovf),
        }
        return np.asarray(T), info

    if not block:
        return PendingRegistration(finish)
    return finish()


def _build_serve_runner(seq, b: int, cap):
    """One-program fused serving runner (see register_batch_to_map)."""
    from ..icp import _apply_transform

    reading_filters = tuple(seq.reading_filters)
    transformations = tuple(seq.transformations)
    run_loop = seq.make_loop_runner()

    def serve(batch_reading, T_inits_b, Trm, reference, seed):
        key = jax.random.PRNGKey(seed)
        Trm_inv = se3.inverse(Trm)

        def prep(reading, T_init, i):
            kr = jax.random.fold_in(key, i)
            reading = apply_filter_chain_traced(
                reading_filters, reading, kr
            )
            overflow = jnp.bool_(False)
            if cap is not None:
                overflow = reading.count() > cap
                reading = reading.compact_traced(cap)
            T_rmd = Trm_inv @ T_init
            return (
                _apply_transform(transformations, reading, T_rmd),
                T_rmd,
                overflow,
            )

        # two sequential vmaps inside one jit — NOT one vmapped closure
        # doing prep + loop together: nesting the while_loop inside the
        # same per-pair closure as the prep measured +50% per iteration
        # (XLA pulls prep work into the loop body); the split form keeps
        # the loop body minimal.
        prepped, T_rmd_b, overflow = jax.vmap(prep, in_axes=(0, 0, 0))(
            batch_reading, T_inits_b, jnp.arange(b)
        )
        T_iter, iters, code, stats = jax.vmap(
            run_loop, in_axes=(0, None)
        )(prepped, reference)
        T_out = jnp.einsum("ij,bjk,bkl->bil", Trm, T_iter, T_rmd_b)
        return T_out, iters, code, stats, overflow

    return jax.jit(serve, static_argnames=())


def _serve_compact_cap(seq, readings, rows, seed, compact_rows="auto"):
    """Static in-program compaction capacity for serving (None = disabled).

    "auto" probes the chain once per (shape, config): one host sync. The
    cap is sized from the probe's KEEP-RATE applied to the batch's full
    padded capacity — not the probe scan's own survivor count — so a
    later, denser scan hitting the same cache key still fits (advisor
    finding, round 1)."""
    cap = None
    if compact_rows == "auto":
        cap_key = (
            "serve_cap", rows,
            seq._config_fingerprint(),
            tuple(
                (type(f).__name__, tuple(sorted(f.parameters.items())))
                for f in seq.reading_filters
            ),
        )
        cap = seq._jit_cache.get(cap_key)
        if cap is None:
            probe = apply_filter_chain_traced(
                tuple(seq.reading_filters), readings[0],
                jax.random.fold_in(jax.random.PRNGKey(seed), 0),
            )
            n, n_in = (
                int(v)
                for v in np.asarray(
                    jax.device_get(
                        jnp.stack(
                            [jnp.sum(probe.mask), readings[0].count()]
                        )
                    )
                )
            )
            keep_rate = n / max(n_in, 1)
            worst = keep_rate * rows
            cap = min(
                rows,
                512 * -(-int(worst * 1.08 + 512) // 512),
            )
            seq._jit_cache[cap_key] = cap
    elif compact_rows:
        cap = min(int(compact_rows), rows)
    if cap is not None and cap >= rows:
        cap = None  # nothing to gain
    return cap


def _pad_tile_aux_np(pers, sentinel: int):
    """Align + stack per-scan HOST-form tile aux (tile/candidate counts
    differ per scan) — pure numpy, zero device dispatches (the former
    device-side padding was ~50 eager relay round-trips per batch;
    tools/tile_phase_profile.py, round 5).

    ``sentinel`` is the reserved all-pad sub-block slot (S): padded
    candidate slots point at it, so their gathered pen/cid read +inf/−1 —
    exact by construction. Padded parent tiles carry −1 query rows
    (scatter-dropped). Extra merge-depth rows and padded vrows columns
    point at virtual tile ``max_tv − 1``, which is all-pad for EVERY scan
    (assign_tiles reserves ≥1 unwritten trailing vtile per scan and this
    padding only appends more) — strictly a no-op merge, which also keeps
    k>1 lists duplicate-free where edge-replication of a full parent's
    last row would have re-merged its final vtile.

    Returns a dict of stacked ``[b, ...]`` numpy arrays. Shared by the
    batched and queue serving drivers."""
    b = len(pers)
    tq = pers[0]["q_rows"].shape[1]
    max_tp = max(int(p["q_rows"].shape[0]) for p in pers)
    max_tv = max(int(p["blocks"].shape[0]) for p in pers)
    max_b = max(int(p["blocks"].shape[1]) for p in pers)
    max_k = max(int(p["vrows"].shape[0]) for p in pers)

    q_rows = np.full((b, max_tp, tq), -1, np.int32)
    blocks = np.full((b, max_tv, max_b), sentinel, np.int32)
    parent = np.zeros((b, max_tv), np.int32)
    vrows = np.full((b, max_k, max_tp), max_tv - 1, np.int32)
    for i, p in enumerate(pers):
        tp = p["q_rows"].shape[0]
        tv, bb = p["blocks"].shape
        kk = p["vrows"].shape[0]
        q_rows[i, :tp] = p["q_rows"]
        blocks[i, :tv, :bb] = p["blocks"]
        parent[i, :tv] = p["parent"]
        vrows[i, :kk, :tp] = p["vrows"]
    return {"q_rows": q_rows, "blocks": blocks, "parent": parent,
            "vrows": vrows}


def _host_rows(cloud: PointCloud):
    """Raw padded host rows (points, mask) of a cloud — row indices match
    the device layout (to_numpy() compacts, which would not)."""
    if cloud._host_cache is not None:
        pts_h, mask_h, _, _ = cloud._host_cache
        return np.asarray(pts_h), np.asarray(mask_h)
    pts, mask = jax.device_get((cloud.points, cloud.mask))
    return np.asarray(pts), np.asarray(mask)


def _register_batch_to_map_aux(seq, readings, T_inits, seed,
                               reference=None, compact_rows="auto",
                               block=True):
    """Fused serving for matchers with per-registration loop state
    (BlockGridMatcher's tile assignment): the assignment is built on the
    host from each scan's pre-transformed raw positions — the exact data
    the in-program loop starts from, since filters only shrink the mask
    and the tile sweep re-masks by the live mask every iteration — then
    stacked and vmapped alongside the loop. One device program per batch,
    one host readback."""
    if reference is None:
        reference = seq.get_prefiltered_internal_map()
    b = len(readings)
    dim = readings[0].dim
    Trm = seq._T_refIn_refMean
    Trm_h = seq.trm_host()
    Trm_inv_h = np.linalg.inv(Trm_h)

    tile_matcher = type(seq.matcher).__name__ == "BlockGridMatcher"
    batch_reading = _stack_clouds_padded(readings,
                                         prefer_numpy=tile_matcher)
    T_inits_b = np.stack([np.asarray(t, np.float32) for t in T_inits])
    rows = batch_reading.points.shape[-2]

    # host matcher prep from initial poses (motionBound covers the
    # loop's corrections; see BlockGridMatcher)
    import os as _os

    use_dev_order = (
        getattr(type(seq.matcher), "SERVING_DEVICE_ORDER", False)
        and getattr(seq.matcher, "_skip_shared", None) is not None
        and _os.environ.get("PMTPU_SKIP_HOST_MORTON", "0") != "1"
    )
    batch_prep = getattr(seq.matcher, "prepare_loop_host_batch", None)
    if use_dev_order:
        # the Morton order is computed INSIDE the serving program
        # (ops/knn_skip.morton_argsort_device) — zero per-batch host work
        per_aux = {}
        shared = dict(seq.matcher._skip_shared)
        pers = None
    elif batch_prep is not None:
        # one vectorized pass over the whole batch (per-scan sequential
        # Morton prep measured ~9 ms/scan at 25k points)
        pts_b = np.zeros((b, rows, dim), np.float32)
        mask_b = np.zeros((b, rows), bool)
        for i, rd in enumerate(readings):
            pts, mask = _host_rows(rd)
            T_rmd = Trm_inv_h @ np.asarray(T_inits[i], np.float64)
            n_i = len(pts)
            pts_b[i, :n_i] = pts @ T_rmd[:dim, :dim].T + T_rmd[:dim, dim]
            mask_b[i, :n_i] = mask
        per_aux, shared = batch_prep(pts_b, mask_b)
        pers = None
    else:
        def prep_one(i_rd):
            i, rd = i_rd
            pts, mask = _host_rows(rd)
            T_rmd = Trm_inv_h @ np.asarray(T_inits[i], np.float64)
            moved = pts @ T_rmd[:dim, :dim].T + T_rmd[:dim, dim]
            return seq.matcher.prepare_loop_host(moved, mask)

        # the assignment is pure numpy over read-only matcher state
        # (~16 ms/scan on the 25k car pair — a third of the tile serving
        # budget at batch 8); numpy releases the GIL for the heavy ops,
        # so a thread pool overlaps the scans
        if b > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(b, 8)) as ex:
                outs = list(ex.map(prep_one, enumerate(readings)))
        else:
            outs = [prep_one(x) for x in enumerate(readings)]
        pers = [o[0] for o in outs]
        shared = outs[-1][1]
    if pers is None or "q_rows" not in pers[0]:
        # generic aux (KDTreeMatcher's skip path): per-scan entries share
        # shapes by construction — plain stack. The loop runs entirely in
        # Morton-sorted space: prep permutes each scan's rows by its
        # "qorder" (then compacts — compaction preserves relative order,
        # so survivors stay Morton-coherent) and the reference is the
        # matcher's once-sorted copy, so the per-iteration step does no
        # row gathers at all (see KDTreeMatcher.find_closests_in_stateful).
        if pers is not None:
            per_aux = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs, axis=0), *pers
            )
        ref_loop = seq.matcher.serving_reference(reference)
        permutes = getattr(
            type(seq.matcher), "SERVING_PERMUTES_READING", False
        )
        # honor the caller's compact_rows (pin/disable) exactly like the
        # dense fused path — the auto cap must not silently override it
        cap = (
            _serve_compact_cap(seq, readings, rows, seed, compact_rows)
            if permutes else None
        )
        per0 = jax.tree_util.tree_map(lambda x: x[0], per_aux)
        aux_shapes = tuple(sorted(
            (k, tuple(v.shape)) for p in (per0, shared or {})
            for k, v in p.items()
        ))
        cache_key = (
            "serve_aux_g", b, rows, reference.num_points, dim, aux_shapes,
            cap, permutes, use_dev_order,
            batch_reading.descriptor_labels(),
            reference.descriptor_labels(),
            seq._config_fingerprint(),
            tuple(
                (type(f).__name__, tuple(sorted(f.parameters.items())))
                for f in seq.reading_filters
            ),
        )
        runner = seq._jit_cache.get(cache_key)
        if runner is None:
            runner = _build_serve_runner_aux(
                seq, b, permute_compact_cap=cap, permutes=permutes,
                device_order=use_dev_order,
            )
            seq._jit_cache[cache_key] = runner
        T_out, iters, codes, stats, overflow = runner(
            batch_reading, T_inits_b, Trm, ref_loop, jnp.int32(seed),
            per_aux, shared,
        )

        def finish():
            T, it, cd, pur, wpur, res, ovf = jax.device_get(
                (T_out, iters, codes, stats.point_used_ratio,
                 stats.weighted_point_used_ratio, stats.residual,
                 overflow)
            )
            info = {
                "iterations": np.asarray(it),
                "codes": np.asarray(cd),
                "point_used_ratio": np.asarray(pur),
                "weighted_point_used_ratio": np.asarray(wpur),
                "residual": np.asarray(res),
                "compact_overflow": np.asarray(ovf),
            }
            return np.asarray(T), info

        if not block:
            return PendingRegistration(finish)
        return finish()

    sentinel = int(shared["sub_units"].shape[0]) - 1
    # host numpy through and through: the int32 assignments (~1.5 MB at
    # the 4e5 serving shape) transfer as runner-call arguments (an
    # explicit blocking device_put here measured ~90 ms of relay round
    # trips); the candidate tables are gathered from the resident
    # sub-block tables INSIDE the runner
    per_aux = _pad_tile_aux_np(pers, sentinel)

    cache_key = (
        "serve_aux", b, rows, reference.num_points, dim,
        tuple(sorted(
            (k, tuple(v.shape)) for k, v in per_aux.items()
        )),
        batch_reading.descriptor_labels(),
        reference.descriptor_labels(),
        seq._config_fingerprint(),
        tuple(
            (type(f).__name__, tuple(sorted(f.parameters.items())))
            for f in seq.reading_filters
        ),
    )
    runner = seq._jit_cache.get(cache_key)
    if runner is None:
        runner = _build_serve_runner_aux(seq, b)
        seq._jit_cache[cache_key] = runner

    T_out, iters, codes, stats, _ = runner(
        batch_reading, T_inits_b, Trm, reference, jnp.int32(seed),
        per_aux, shared,
    )
    T_out, iters, codes, pur, wpur, res, motion = jax.device_get(
        (T_out, iters, codes, stats.point_used_ratio,
         stats.weighted_point_used_ratio, stats.residual,
         stats.motion_max)
    )
    info = {
        "iterations": np.asarray(iters),
        "codes": np.asarray(codes),
        "point_used_ratio": np.asarray(pur),
        "weighted_point_used_ratio": np.asarray(wpur),
        "residual": np.asarray(res),
        "compact_overflow": np.zeros(b, bool),  # no serve compaction here
    }
    # motionBound invariant guard, per scan (the one-shot engine's check,
    # icp.py: bounded-search exactness relies on no reading point moving
    # farther than motionBound from the pose the tile assignment was built
    # at; the reference's bounded search is never silently wrong within
    # maxDist, MatchersImpl.cpp:86-101). NOTE the bound is on displacement
    # in the REFERENCE-CENTERED frame: a rotation about the map mean moves
    # far-from-center scans by ~angle * range.
    bound = getattr(seq.matcher, "motionBound", None)
    if bound is not None and motion is not None:
        exceeded = np.asarray(motion) > float(bound)
        info["motion_bound_exceeded"] = exceeded
        if exceeded.any():
            from ..loggers import log_warning

            log_warning(
                f"register_batch_to_map: {int(exceeded.sum())}/{b} scans "
                f"exceeded motionBound {float(bound):.3f} (max displacement "
                f"bound {float(np.max(motion)):.3f}) — matches beyond the "
                f"pre-assigned cell neighborhoods may have been missed; "
                f"raise motionBound or tighten the priors"
            )
    # tile path is eager (its motion-bound audit already synchronized);
    # honor the async contract anyway
    out = (np.asarray(T_out), info)
    return out if block else PendingRegistration(lambda: out)


def _build_serve_runner_aux(seq, b: int, permute_compact_cap=None,
                            permutes=False, device_order=False):
    """One-program fused serving runner with per-scan matcher loop state
    (see _register_batch_to_map_aux).

    Tile path (``permutes`` False): no in-program compaction — the tile
    assignment's row indices must keep addressing the raw padded rows, and
    the sweep's cost scales with assigned tiles, not rows.

    Skip path (``permutes`` True): prep consumes the per-scan ``qorder``
    (Morton permutation of the raw rows, valid after filtering because
    filters only flip the mask) and then compacts to the static cap —
    compaction preserves relative order, so survivors stay
    Morton-coherent and the loop pays only for surviving rows."""
    from ..icp import _apply_transform

    reading_filters = tuple(seq.reading_filters)
    transformations = tuple(seq.transformations)
    run_loop = seq.make_loop_runner()
    cap = permute_compact_cap

    def serve(batch_reading, T_inits_b, Trm, reference, seed, per_aux,
              shared_aux):
        tile_mode = "blocks" in per_aux
        if tile_mode:
            # tile path: gather the loop-static candidate tables from the
            # resident sub-block tables IN-PROGRAM (host prep ships only
            # int32 assignments; the former per-scan eager gathers were
            # ~250 ms/batch of relay dispatch at the 4e5 serving shape)
            from ..matchers import tile_aux_to_device

            sub_shared = shared_aux
            per_aux = jax.vmap(
                lambda p: tile_aux_to_device(p, sub_shared)
            )(per_aux)
            shared_aux = {}
        key = jax.random.PRNGKey(seed)
        Trm_inv = se3.inverse(Trm)

        def prep(reading, T_init, i, pa):
            kr = jax.random.fold_in(key, i)
            reading = apply_filter_chain_traced(reading_filters, reading, kr)
            overflow = jnp.bool_(False)
            if permutes:
                if device_order:
                    from ..ops.knn_skip import morton_argsort_device

                    order = morton_argsort_device(
                        reading.points, reading.mask
                    )
                    reading = reading.permute_rows(order)
                else:
                    reading = reading.permute_rows(pa["qorder"])
                if cap is not None:
                    overflow = reading.count() > cap
                    reading = reading.compact_traced(cap)
            if tile_mode:
                # permute into TILE ORDER once (filters only flip the
                # mask, so q_rows — built from the raw rows — stays
                # valid): the loop's q-gather and result scatter then
                # become reshapes (the q-gather alone measured
                # ~4 ms/batch-iter at the 4e5 serving shape, round 5)
                qr = pa["q_rows"].reshape(-1)
                safe = jnp.maximum(qr, 0)
                live = jnp.where(qr >= 0, reading.mask[safe], False)
                reading = jax.tree_util.tree_map(
                    lambda x: x[safe], reading
                ).replace(mask=live)
            T_rmd = Trm_inv @ T_init
            return (
                _apply_transform(transformations, reading, T_rmd),
                T_rmd,
                overflow,
            )

        prep_aux = (
            {"q_rows": per_aux["q_rows"]} if tile_mode else per_aux
        )
        loop_aux = (
            {k: v for k, v in per_aux.items() if k != "q_rows"}
            if tile_mode else per_aux
        )
        prepped, T_rmd_b, overflow = jax.vmap(prep, in_axes=(0, 0, 0, 0))(
            batch_reading, T_inits_b, jnp.arange(b), prep_aux
        )

        def loop_one(reading, pa):
            aux = dict(shared_aux) if permutes else {**pa, **shared_aux}
            return run_loop(reading, reference, aux)

        T_iter, iters, code, stats = jax.vmap(loop_one)(prepped, loop_aux)
        T_out = jnp.einsum("ij,bjk,bkl->bil", Trm, T_iter, T_rmd_b)
        return T_out, iters, code, stats, overflow

    return jax.jit(serve)


def _register_batch_to_map_host(seq, readings, T_inits, seed,
                                reference=None):
    """Per-scan host prep path (host-stateful filters, iteration-dumping
    inspectors, matchers with per-registration loop state)."""
    from ..icp import _apply_transform

    if reference is None:
        reference = seq.get_prefiltered_internal_map()
    b = len(readings)
    key = jax.random.PRNGKey(seed)
    Trm = seq._T_refIn_refMean
    Trm_inv = se3.inverse(jnp.asarray(Trm))

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
        "batch_map", b, cap_r, reference.num_points, readings[0].dim,
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
