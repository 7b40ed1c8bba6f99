"""Continuous-batching scan-to-map serving (the queue driver).

The reference's serving loop registers scans one after another against a
persistent map (reference: ICP.cpp:455-612); the round-2..4 TPU serving
path vmapped B scans through one fused ``lax.while_loop`` — but a vmapped
loop runs every lane to the SLOWEST scan's stop (lockstep): with a mean of
~15 iterations against a max of ~20, roughly a quarter of device compute
re-registered already-converged scans (LARGE_r04 measurement; round-4
verdict item #1).

This module removes that waste the way LLM serving systems do — continuous
batching. The WHOLE queue of Q prepped scans is resident in HBM; ONE device
program steps L lanes in lockstep, and the moment a lane's checkers stop,
that lane

1. scatters its finished pose / stats / codes into the per-scan output
   slots (a [Q+1]-row table; the extra row absorbs writes from idle lanes),
2. gathers the next queued scan's rows from the pool into its slot,
3. resets its loop state (T_iter, checker states, outlier states, matcher
   search state) — all predicated, branch-free, inside the same
   ``lax.while_loop`` body.

No host round trip ever happens mid-queue: convergence decisions, swap
scheduling (a cumsum over the lane axis orders simultaneous finishers) and
output writes are data inside the program. The loop ends when the pool is
drained and every lane has finished; per-scan work is exactly each scan's
own iteration count (plus an idle-lane tail as the queue drains).

Supported chains: the same eligibility as the fused serving path with
either no matcher loop state (dense sweep) or the KDTreeMatcher survivor-
sweep serving state (device-Morton order + shared tables + loop-carried
bounds). Host-stateful filters, per-scan aux matchers (BlockGrid tiles) and
Anderson acceleration fall back to :func:`..parallel.batch.register_batch_to_map`.

Coarse-to-fine (``coarse=``): the reference ships graduated resolution as
``readingStepDataPointsFilters`` + FixStepSampling's startStep→endStep
schedule applied per iteration (reference: ICP.cpp:373-379,
DataPointsFilters/FixStepSampling.cpp). Here the schedule becomes two
queue passes sharing one centered frame: pass 1 registers scan-order
decimated readings (every ``decim``-th surviving row — FixStepSampling's
own spatially-uniform subsample) under a capped iteration budget and a
loosened differential stop; pass 2 starts each scan's full-resolution loop
at its pass-1 pose. Matching cost is ∝ rows, so early iterations run at
~1/decim of the sweep cost.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import PointCloud
from ..filters.base import apply_filter_chain_traced, chain_is_traceable
from ..matchers import Matcher
from ..utils import se3
from .batch import (
    PendingRegistration,
    _serve_compact_cap,
    _stack_clouds_padded,
    register_batch_to_map,
)

__all__ = ["register_queue_to_map", "queue_eligible"]


def _bmask(flag, ndim):
    """Broadcast a [L] bool to a leading-axis mask of rank ``ndim``."""
    return flag.reshape(flag.shape + (1,) * (ndim - 1))


def _queue_mode(seq) -> str:
    """Serving mode for the queue driver: 'dense' (no matcher loop
    state), 'skip' (KDTreeMatcher survivor sweep: shared tables +
    in-program Morton order + loop-carried bounds), 'tile'
    (BlockGridMatcher: per-scan host tile assignment, pooled and swapped
    with the lanes), or '' (ineligible → batch fallback)."""
    if seq.acceleration is not None:
        return ""
    if not seq._step_chain_traced() or seq.inspector.needs_iteration_data:
        return ""
    if not chain_is_traceable(seq.reading_filters):
        return ""
    m = seq.matcher
    if (getattr(type(m), "SERVING_DEVICE_ORDER", False)
            and getattr(m, "_skip_shared", None) is not None):
        return "skip"
    if type(m).prepare_loop is Matcher.prepare_loop:
        return "dense"
    if (type(m).__name__ == "BlockGridMatcher"
            and getattr(m, "_blocks", None) is not None):
        return "tile"
    return ""


def queue_eligible(seq) -> bool:
    """True when the chain can serve through the queue driver."""
    return bool(_queue_mode(seq))


def register_queue_to_map(
    seq,
    readings: Sequence[PointCloud],
    T_inits: Optional[Sequence] = None,
    seed: int = 0,
    lanes: int = 8,
    compact_rows="auto",
    coarse: Optional[Tuple[int, int]] = None,
    block: bool = True,
):
    """Register a QUEUE of readings against the persistent map with
    continuous batching (see module docstring).

    ``lanes`` is the number of concurrently-stepped registrations; more
    lanes amortize the loop body's fixed small-op tails over more scans
    (lockstep convergence waste — the reason batch 16 used to LOSE to
    batch 8 — does not apply here). ``coarse=(decim, max_iter)`` enables
    the two-pass coarse-to-fine schedule. Returns ``(T [Q, d+1, d+1],
    info)`` exactly like :func:`register_batch_to_map`; scans are matched
    by queue index (``seed`` folds per index, so a queue of Q scans
    reproduces the batched path's poses bit for bit when indices align).
    """
    assert seq.has_map(), "set_map first"
    Q_real = len(readings)
    # matcher serving state must be (re)built against the current map
    # before eligibility is judged (mirrors register_batch_to_map)
    reference = seq.get_prefiltered_internal_map()
    seq.matcher.serving_loop_aux(reference)
    mode = _queue_mode(seq)
    if not mode or Q_real == 0:
        out = register_batch_to_map(
            seq, readings, T_inits, seed, compact_rows=compact_rows,
            block=block,
        )
        return out
    ref_loop = seq.matcher.serving_reference(reference)
    permutes = mode == "skip"
    tile = mode == "tile"
    if mode == "skip":
        shared_aux = dict(seq.matcher._skip_shared)
    elif tile:
        # resident sub-block tables: the queue program gathers each scan's
        # candidate tables from these at program start (host prep ships
        # only int32 assignments — see _tile_aux_pool)
        shared_aux = {"sub_units": seq.matcher._blocks.units}
    else:
        shared_aux = {}

    dim = readings[0].dim
    Trm = jnp.asarray(seq._T_refIn_refMean)
    if T_inits is None:
        T_inits = [np.eye(dim + 1, dtype=np.float32)] * Q_real
    # bucket the queue length on the shape ladder (min = lanes): the
    # compiled programs are keyed on the PADDED length, so a 37-scan
    # queue reuses the 48-bucket program a 40-scan warmup compiled —
    # pad slots replay the last scan but are never scheduled (the
    # traced q_real gates refills), so they cost prep compute only
    # (round-5 review finding #4: exact-Q keys made warmup length-exact)
    from ..cloud import bucket_size

    Q = max(int(bucket_size(max(Q_real, lanes), granule=8)), lanes)
    readings = list(readings) + [readings[-1]] * (Q - Q_real)
    T_inits = list(T_inits) + [
        np.eye(dim + 1, dtype=np.float32)
    ] * (Q - Q_real)
    T_inits_b = np.stack([np.asarray(t, np.float32) for t in T_inits])

    pool_in = _stack_clouds_padded(readings, prefer_numpy=tile)
    rows = pool_in.points.shape[-2]
    # the tile assignment indexes RAW padded reading rows — no compaction
    cap = (
        None if tile
        else _serve_compact_cap(seq, readings, rows, seed, compact_rows)
    )

    coarse_key = None
    if coarse is not None and tile:
        coarse = None  # decimation-compaction would invalidate q_rows
    if coarse is not None:
        decim, c_iters = int(coarse[0]), int(coarse[1])
        tol_mult = float(coarse[2]) if len(coarse) > 2 else 2.0
        if decim < 2:
            coarse = None
        else:
            base = cap if cap is not None else rows
            n_c = -(-base // decim)          # ceil(base / decim)
            cap_c = max(512, 512 * (-(-n_c // 512)))
            coarse_key = (decim, c_iters, cap_c, tol_mult)

    # tile mode: per-scan host tile assignments, padded to common shapes
    # and pooled (the batch path's prep, extended to the whole queue)
    pool_aux = {}
    aux_shapes = None
    if tile:
        pool_aux = _tile_aux_pool(seq, readings, T_inits, Trm, rows, dim)
        aux_shapes = tuple(sorted(
            (k, tuple(v.shape[1:])) for k, v in pool_aux.items()
        ))

    cache_key = (
        "serve_queue", Q, lanes, rows, reference.num_points, cap, dim,
        mode, coarse_key, aux_shapes,
        pool_in.descriptor_labels(),
        reference.descriptor_labels(),
        seq._config_fingerprint(),
        tuple(
            (type(f).__name__, tuple(sorted(f.parameters.items())))
            for f in seq.reading_filters
        ),
    )
    runners = seq._jit_cache.get(cache_key)
    if runners is None:
        runners = _build_queue_runners(
            seq, Q, lanes, cap, permutes, coarse_key, tile
        )
        seq._jit_cache[cache_key] = runners
    prep_fn, queue_fn, queue_coarse_fn = runners

    q_real = jnp.int32(Q_real)
    pool, pool_coarse, T_rmd_b, overflow = prep_fn(
        pool_in, T_inits_b, Trm, jnp.int32(seed),
        {"q_rows": pool_aux["q_rows"]} if tile else {},
    )
    T0_pool = jnp.broadcast_to(
        jnp.eye(dim + 1, dtype=jnp.float32), (Q, dim + 1, dim + 1)
    )
    if coarse is not None:
        T0_pool, _, _, _, _ = queue_coarse_fn(
            pool_coarse, pool_aux, T0_pool, ref_loop, shared_aux, q_real
        )
    out_T_loop, out_iters, out_code, out_stats, out_motion = queue_fn(
        pool, pool_aux, T0_pool, ref_loop, shared_aux, q_real
    )
    # frame composition on device, one readback
    T_out = jnp.einsum("ij,qjk,qkl->qil", Trm, out_T_loop, T_rmd_b)

    def finish():
        T, it, cd, pur, wpur, res, ovf, mot = jax.device_get(
            (T_out, out_iters, out_code,
             out_stats.point_used_ratio, out_stats.weighted_point_used_ratio,
             out_stats.residual, overflow, out_motion)
        )
        info = {
            "iterations": np.asarray(it)[:Q_real],
            "codes": np.asarray(cd)[:Q_real],
            "point_used_ratio": np.asarray(pur)[:Q_real],
            "weighted_point_used_ratio": np.asarray(wpur)[:Q_real],
            "residual": np.asarray(res)[:Q_real],
            "compact_overflow": np.asarray(ovf)[:Q_real],
        }
        # motionBound invariant guard per scan (the batch path's audit;
        # bounded-search exactness contract, MatchersImpl.cpp:86-101)
        bound = getattr(seq.matcher, "motionBound", None)
        if tile and bound is not None and mot is not None:
            exceeded = np.asarray(mot)[:Q_real] > float(bound)
            info["motion_bound_exceeded"] = exceeded
            if exceeded.any():
                from ..loggers import log_warning

                log_warning(
                    f"register_queue_to_map: {int(exceeded.sum())}/"
                    f"{Q_real} scans exceeded motionBound "
                    f"{float(bound):.3f} — matches beyond the "
                    f"pre-assigned cell neighborhoods may have been missed"
                )
        return np.asarray(T)[:Q_real], info

    if not block:
        return PendingRegistration(finish)
    return finish()


def _tile_aux_pool(seq, readings, T_inits, Trm, rows, dim):
    """Per-scan tile assignments for the whole queue: host numpy over
    read-only matcher state (thread pool — numpy releases the GIL),
    padded to common shapes and stacked into [Q, ...] pools — all host
    numpy, ONE device transfer; the queue program gathers the candidate
    tables in-program (the former per-scan eager gathers + device pads
    measured ~hundreds of ms of relay dispatch per call at the LARGE
    shapes; tools/tile_phase_profile.py, round 5)."""
    from .batch import _host_rows, _pad_tile_aux_np

    Trm_inv_h = np.linalg.inv(seq.trm_host())

    def prep_one(i_rd):
        i, rd = i_rd
        pts, mask = _host_rows(rd)
        T_rmd = Trm_inv_h @ np.asarray(T_inits[i], np.float64)
        moved = pts @ T_rmd[:dim, :dim].T + T_rmd[:dim, dim]
        per, _shared = seq.matcher.prepare_loop_host(moved, mask)
        return per

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as ex:
        pers = list(ex.map(prep_one, enumerate(readings)))
    sentinel = int(seq.matcher._blocks.pts.shape[0]) - 1
    # plain numpy out — the arrays transfer as program-call arguments
    # (an explicit blocking device_put measured ~25 ms/array of relay
    # round trips)
    return _pad_tile_aux_np(pers, sentinel)


def _decimate_mask(cloud: PointCloud, decim: int) -> PointCloud:
    """Keep every ``decim``-th surviving row — FixStepSampling's schedule
    step applied once (reference: DataPointsFilters/FixStepSampling.cpp):
    scan-order decimation, spatially uniform for a sequential scan."""
    rank = jnp.cumsum(cloud.mask) - 1
    keep = jnp.logical_and(cloud.mask, rank % decim == 0)
    return cloud.with_mask(keep)


def _build_queue_runners(seq, Q, lanes, cap, permutes, coarse_key,
                         tile=False):
    """Compile the prep program and the queue program(s)."""
    from ..icp import _apply_transform

    reading_filters = tuple(seq.reading_filters)
    transformations = tuple(seq.transformations)
    L = lanes
    decim = cap_c = c_iters = tol_mult = None
    if coarse_key is not None:
        decim, c_iters, cap_c, tol_mult = coarse_key

    # ---------------------------------------------------------------- prep
    def prep_all(pool_in, T_inits_b, Trm, seed, prep_aux):
        key = jax.random.PRNGKey(seed)
        Trm_inv = se3.inverse(Trm)

        def prep(reading, T_init, i, pa):
            kr = jax.random.fold_in(key, i)
            reading = apply_filter_chain_traced(
                reading_filters, reading, kr
            )
            overflow = jnp.bool_(False)
            if permutes:
                from ..ops.knn_skip import morton_argsort_device

                order = morton_argsort_device(reading.points, reading.mask)
                reading = reading.permute_rows(order)
            if cap is not None:
                overflow = reading.count() > cap
                reading = reading.compact_traced(cap)
            if tile:
                # permute into TILE ORDER once (see the batch runner):
                # the loop's q-gather and result scatter become reshapes
                qr = pa["q_rows"].reshape(-1)
                safe = jnp.maximum(qr, 0)
                live = jnp.where(qr >= 0, reading.mask[safe], False)
                reading = jax.tree_util.tree_map(
                    lambda x: x[safe], reading
                ).replace(mask=live)
            T_rmd = Trm_inv @ T_init
            reading = _apply_transform(transformations, reading, T_rmd)
            coarse_r = None
            if decim is not None:
                # decimated rows stay Morton/scan-coherent: compaction
                # preserves relative order
                coarse_r = _decimate_mask(reading, decim).compact_traced(
                    cap_c
                )
            return reading, coarse_r, T_rmd, overflow

        return jax.vmap(prep, in_axes=(0, 0, 0, 0))(
            pool_in, T_inits_b, jnp.arange(Q), prep_aux
        )

    # ------------------------------------------------------------- the loop
    def make_queue(checkers):
        """One continuous-batching program over a prepped pool."""
        step = seq._make_step(None, None, checkers=checkers)
        matcher = seq.matcher
        stateful = permutes and hasattr(
            type(matcher), "find_closests_in_stateful"
        )
        track_motion = tile and getattr(matcher, "motionBound", None) \
            is not None

        def motion_of(reading, T_new, dim):
            """Per-lane displacement bound vs the pose the tile assignment
            was built at (the engine's _motion_tracker math: centroid-
            referenced, 2·sin(θ/2)·r + drift)."""
            cnt = jnp.maximum(reading.count(), 1)
            c = jnp.sum(
                jnp.where(reading.mask[:, None], reading.points, 0.0),
                axis=0,
            ) / cnt
            r_local = jnp.max(jnp.where(
                reading.mask,
                jnp.linalg.norm(reading.points - c[None, :], axis=1),
                0.0,
            ))
            R = T_new[:dim, :dim]
            t = T_new[:dim, dim]
            sigma = jnp.sqrt(jnp.maximum(dim - jnp.trace(R), 0.0))
            drift = jnp.linalg.norm(R @ c + t - c)
            return sigma * r_local + drift

        def queue_run(pool, pool_aux, T0_pool, reference, shared_aux,
                      q_real):
            dim = reference.dim
            has_per = bool(tile)
            if tile:
                # gather every queued scan's loop-static candidate tables
                # from the resident sub-block tables ONCE, in-program (the
                # pool then holds [Q, Tv, 8, M] tables in HBM, exactly the
                # layout the former host-side prep shipped — but with zero
                # per-scan dispatches and an int32-only transfer)
                from ..matchers import tile_aux_to_device

                sub_shared = shared_aux
                pool_aux = jax.vmap(
                    lambda p: tile_aux_to_device(p, sub_shared)
                )(pool_aux)
                # q_rows is consumed by prep's tile-order permutation;
                # the loop addresses queries by position (reshape)
                pool_aux = {k: v for k, v in pool_aux.items()
                            if k != "q_rows"}
                shared_aux = {}
            if has_per:
                aux_axes = {
                    **{k: 0 for k in pool_aux},
                    **{k: None for k in shared_aux},
                }
            elif shared_aux:
                aux_axes = {k: None for k in shared_aux}
            else:
                aux_axes = None

            # initial lane assignment: scans 0..L-1 (the padded pool
            # guarantees Q >= L; lanes beyond q_real start inactive).
            # Lane readings and per-scan aux are NOT carried: the body
            # indexes the HBM pools by lane_scan every iteration — a
            # while_loop carry would double-buffer (copy) the full lane
            # tables each iteration, which measured 1.6x SLOWER than the
            # lockstep batch on the tile path (~190 MB of candidate
            # tables per copy at the 1e5-map shape); the per-iteration
            # pool gather is lanes x scan-bytes only.
            lane_scan0 = jnp.where(
                jnp.arange(L, dtype=jnp.int32) < q_real,
                jnp.arange(L, dtype=jnp.int32), -1,
            )
            lane_reading0 = jax.tree_util.tree_map(
                lambda x: x[:L], pool
            )
            T_iter0 = T0_pool[:L]
            chk0 = jax.vmap(
                lambda T: tuple(c.init_state(T) for c in checkers)
            )(T_iter0)
            from ..outlierfilters import init_outlier_states

            out0_single = init_outlier_states(seq.outlier_filters)
            outl0 = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x), (L,) + jnp.asarray(x).shape
                ),
                out0_single,
            )
            shared = dict(shared_aux) if shared_aux else None
            mstate0 = (
                jax.vmap(lambda r: matcher.loop_state_init(r, shared))(
                    lane_reading0
                )
                if stateful else None
            )
            # output tables, row Q absorbs idle-lane writes
            cov0 = (
                jnp.zeros((6, 6), jnp.float32)
                if seq.error_minimizer.PRODUCES_COVARIANCE else None
            )
            from ..minimizers import MinimizerStats

            stats_proto = MinimizerStats(
                jnp.float32(0), jnp.float32(0), jnp.float32(0), cov0,
                jnp.int32(0), jnp.int32(0), None,
            )
            out_stats0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros((Q + 1,) + jnp.shape(s),
                                    jnp.asarray(s).dtype),
                stats_proto,
            )
            out_T0 = jnp.zeros((Q + 1, dim + 1, dim + 1), jnp.float32)
            out_iters0 = jnp.zeros((Q + 1,), jnp.int32)
            out_code0 = jnp.zeros((Q + 1,), jnp.int32)
            out_motion0 = jnp.zeros((Q + 1,), jnp.float32)

            def cond(carry):
                return jnp.any(carry[0] >= 0)  # lane_scan

            def body(carry):
                (lane_scan, T_iter, chk, outl,
                 it_ct, code_l, motion, mstate, next_idx, out_T, out_iters,
                 out_code, out_stats, out_motion) = carry

                cur = jnp.clip(lane_scan, 0, Q - 1)
                lane_reading = jax.tree_util.tree_map(
                    lambda x: x[cur], pool
                )
                if has_per:
                    lane_aux = jax.tree_util.tree_map(
                        lambda x: x[cur], pool_aux
                    )
                    aux_arg = {**lane_aux, **(shared_aux or {})}
                elif shared_aux:
                    aux_arg = dict(shared_aux)
                else:
                    aux_arg = None
                T_new, chk, outl, iterate, code2, stats, _, _, mstate = (
                    jax.vmap(
                        step,
                        in_axes=(0, None, 0, 0, 0, 0, aux_axes, 0),
                    )(lane_reading, reference, T_iter, chk, outl, it_ct,
                      aux_arg, mstate)
                )
                it_new = it_ct + 1
                code_l = jnp.maximum(code_l, code2)
                if track_motion:
                    motion = jnp.maximum(
                        motion,
                        jax.vmap(lambda r, T: motion_of(r, T, dim))(
                            lane_reading, T_new
                        ),
                    )
                active = lane_scan >= 0
                finished = jnp.logical_and(active,
                                           jnp.logical_not(iterate))

                # scatter finished scans into their output slots
                widx = jnp.where(finished, lane_scan, Q)
                out_T = out_T.at[widx].set(T_new)
                out_iters = out_iters.at[widx].set(it_new)
                out_code = out_code.at[widx].set(code_l)
                out_motion = out_motion.at[widx].set(motion)
                out_stats = jax.tree_util.tree_map(
                    lambda o, s: o.at[widx].set(s), out_stats, stats
                )

                # refill: order simultaneous finishers by lane rank
                rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
                new_scan = next_idx + rank
                avail = new_scan < q_real  # pad slots never scheduled
                swap = jnp.logical_and(finished, avail)
                lane_scan = jnp.where(
                    finished,
                    jnp.where(avail, new_scan, -1),
                    lane_scan,
                )
                next_idx = next_idx + jnp.sum(finished.astype(jnp.int32))

                src = jnp.clip(jnp.where(swap, new_scan, 0), 0, Q - 1)
                T_iter = jnp.where(
                    _bmask(swap, 3), T0_pool[src], T_new
                )
                chk_init = jax.vmap(
                    lambda T: tuple(c.init_state(T) for c in checkers)
                )(T_iter)
                chk = jax.tree_util.tree_map(
                    lambda i0, c: jnp.where(_bmask(swap, c.ndim), i0, c),
                    chk_init, chk,
                )
                outl = jax.tree_util.tree_map(
                    lambda i0, c: jnp.where(_bmask(swap, c.ndim), i0, c),
                    outl0, outl,
                )
                it_ct = jnp.where(swap, 0, it_new)
                code_l = jnp.where(swap, 0, code_l)
                motion = jnp.where(swap, 0.0, motion)
                if mstate is not None:
                    # next iteration's readings (pool-indexed, post-swap)
                    reading_next = jax.tree_util.tree_map(
                        lambda x: x[jnp.clip(lane_scan, 0, Q - 1)], pool
                    )
                    mreset = jax.vmap(
                        lambda r: matcher.loop_state_init(r, shared)
                    )(reading_next)
                    mstate = jax.tree_util.tree_map(
                        lambda i0, c: jnp.where(
                            _bmask(swap, c.ndim), i0, c
                        ),
                        mreset, mstate,
                    )

                return (lane_scan, T_iter, chk,
                        outl, it_ct, code_l, motion, mstate, next_idx,
                        out_T, out_iters, out_code, out_stats, out_motion)

            init = (
                lane_scan0, T_iter0, chk0, outl0,
                jnp.zeros((L,), jnp.int32), jnp.zeros((L,), jnp.int32),
                jnp.zeros((L,), jnp.float32),
                mstate0, jnp.int32(L), out_T0, out_iters0, out_code0,
                out_stats0, out_motion0,
            )
            out = jax.lax.while_loop(cond, body, init)
            (out_T, out_iters, out_code, out_stats, out_motion) = (
                out[9], out[10], out[11], out[12], out[13]
            )
            return (out_T[:Q], out_iters[:Q], out_code[:Q],
                    jax.tree_util.tree_map(lambda x: x[:Q], out_stats),
                    out_motion[:Q])

        return jax.jit(queue_run)

    queue_fn = make_queue(tuple(seq.checkers))
    queue_coarse_fn = None
    if coarse_key is not None:
        queue_coarse_fn = make_queue(
            _coarse_checkers(seq, c_iters, tol_mult)
        )
    return jax.jit(prep_all), queue_fn, queue_coarse_fn


def _coarse_checkers(seq, c_iters: int, tol_mult: float = 2.0):
    """Phase-1 stop rule: the chain's own checkers with the counter capped
    at the coarse budget and differential thresholds loosened ``tol_mult``x
    (the coarse subsample's pose noise floor is higher — polishing below it
    wastes coarse iterations the fine pass must redo anyway)."""
    from ..checkers import (
        CounterTransformationChecker,
        DifferentialTransformationChecker,
    )

    out = []
    has_counter = False
    for c in seq.checkers:
        if isinstance(c, CounterTransformationChecker):
            has_counter = True
            out.append(CounterTransformationChecker({
                "maxIterationCount": str(
                    min(int(c.maxIterationCount), c_iters)
                ),
            }))
        elif isinstance(c, DifferentialTransformationChecker):
            out.append(DifferentialTransformationChecker({
                "minDiffRotErr": str(min(tol_mult * c.minDiffRotErr, 6.28)),
                "minDiffTransErr": str(tol_mult * c.minDiffTransErr),
                "smoothLength": str(c.smoothLength),
            }))
        else:
            out.append(c)
    if not has_counter:
        out.append(CounterTransformationChecker({
            "maxIterationCount": str(c_iters),
        }))
    return tuple(out)
