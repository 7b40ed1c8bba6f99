"""The ICP engines: one-shot ``ICP`` and persistent-map ``ICPSequence``.

Capability parity with the reference algorithm layer
(reference: pointmatcher/ICP.cpp, PointMatcher.h:652-764). The call structure
mirrors ICP::compute (reference: ICP.cpp:265-452):

1. reference filters → center reference at its mean (conditioning trick,
   ICP.cpp:291-299) → matcher init;
2. reading filters → pre-transform by T_refMean_dataIn;
3. the fixed-point loop: step filters → transform → match → outlier weights →
   minimize → checkers;
4. frame composition T_refIn_refMean · T_iter · T_refMean_dataIn.

TPU design — two interchangeable loop drivers sharing one traced step:

- **fused**: the whole loop is a single ``lax.while_loop`` under ``jax.jit``;
  checker decisions, the maxNumIterationsReached flag and ConvergenceError
  conditions are data (int codes) threaded through the carry and re-raised on
  the host afterwards. This is the production path: one device program per
  (shape-bucket, config), zero host round-trips per iteration.
- **stepped**: a host-driven loop calling the jitted step once per iteration;
  used when per-iteration inspection (VTK dumps) or genuinely host-stateful
  step filters demand it. Deterministic step-filter schedules
  (FixStepSampling's geometric startStep→endStep sequence) are NOT in that
  class anymore: they run in-trace inside the fused loop
  (DataPointsFilter.mask_at_iteration / SCHEDULE_TRACEABLE).

A third driver lives in :mod:`.parallel.stream`: continuous-batching queue
serving (scan swapped into a lane the moment its checkers stop), with an
optional coarse-to-fine phase schedule.
"""

from __future__ import annotations

import io
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .checkers import (
    CODE_BOUND_ERROR,
    CODE_MAX_ITER,
    CODE_NAN_ERROR,
    TransformationChecker,
)
from .cloud import PointCloud
from .errors import ConvergenceError
from .filters.base import (
    DataPointsFilter,
    apply_filter_chain,
    apply_filter_chain_traced,
    chain_is_traceable,
)
from .inspectors import Inspector, NullInspector
from .loggers import log_info, log_warning
from .matchers import Matcher
from .minimizers import ErrorMinimizer, MinimizerStats, estimate_overlap
from .outlierfilters import (
    OutlierFilter,
    compute_outlier_weights,
    init_outlier_states,
)
from .transformations import RigidTransformation, Transformation
from .utils import se3

__all__ = ["ICP", "ICPSequence", "ICPChainBase"]

CODE_NO_INLIERS = 4


class ICPChainBase:
    """Owns the nine module slots (reference: PointMatcher.h:652-696)."""

    def __init__(self):
        self.reading_filters: List[DataPointsFilter] = []
        self.reading_step_filters: List[DataPointsFilter] = []
        self.reference_filters: List[DataPointsFilter] = []
        self.matcher: Optional[Matcher] = None
        self.outlier_filters: List[OutlierFilter] = []
        self.error_minimizer: Optional[ErrorMinimizer] = None
        self.checkers: List[TransformationChecker] = []
        self.inspector: Inspector = NullInspector()
        self.transformations: List[Transformation] = [RigidTransformation()]
        # introspection parity (reference: ICP.cpp:169-188). Stored as the
        # cloud itself and counted lazily on access: each count is a
        # host↔device sync (~25 ms through the tunnel) that one-shot
        # latency must not pay unless somebody asks.
        self._prefiltered_reading = 0
        self._prefiltered_reference = 0
        self.max_num_iterations_reached = False
        self.last_stats: Optional[MinimizerStats] = None
        self.last_iteration_count = 0
        #: True when a bounded-search matcher's motionBound invariant was
        #: violated during the last registration (see BlockGridMatcher)
        self.motion_bound_exceeded = False
        #: opt-in convergence acceleration: None or "anderson"
        #: (AA-ICP, \cite{Pavlov2017AAICP}: Anderson acceleration of the
        #: ICP fixed point over se(n) pose vectors, with a residual-increase
        #: safeguard falling back to the plain update)
        self.acceleration: Optional[str] = None
        self.acceleration_window: int = 3
        self._jit_cache = {}

    # ------------------------------------------------------------- defaults
    def set_default(self) -> None:
        """The reference's canonical chain (reference: ICP.cpp:100-113)."""
        from .filters.basic import RandomSamplingDataPointsFilter
        from .filters.normals import SamplingSurfaceNormalDataPointsFilter
        from .matchers import KDTreeMatcher
        from .minimizers import PointToPlaneErrorMinimizer
        from .outlierfilters import TrimmedDistOutlierFilter
        from .checkers import (
            CounterTransformationChecker,
            DifferentialTransformationChecker,
        )

        # all modules at their documented defaults, like the reference's
        # parameterless constructions (ICP.cpp:100-113)
        self.reading_filters = [RandomSamplingDataPointsFilter()]
        self.reading_step_filters = []
        self.reference_filters = [SamplingSurfaceNormalDataPointsFilter()]
        self.matcher = KDTreeMatcher()
        self.outlier_filters = [TrimmedDistOutlierFilter()]
        self.error_minimizer = PointToPlaneErrorMinimizer()
        self.checkers = [
            CounterTransformationChecker(),
            DifferentialTransformationChecker(),
        ]
        self.inspector = NullInspector()
        self.transformations = [RigidTransformation()]
        self._jit_cache = {}

    def load_from_yaml(self, source) -> None:
        """Configure from a reference-format YAML pipeline
        (reference: ICP.cpp:117-236)."""
        from .config import configure_chain_from_yaml

        configure_chain_from_yaml(self, source)
        self._jit_cache = {}

    # ------------------------------------------------------------ utilities
    def _config_fingerprint(self) -> tuple:
        """Hashable snapshot of the chain configuration; part of every
        jit-cache key so mutating modules in place (swap a matcher, toggle
        icp.acceleration, …) never reuses a stale compiled loop."""

        def mod(m):
            if m is None:
                return None
            return (
                type(m).__name__,
                tuple(sorted(m.parameters.items())),
                getattr(m, "cache_token", None),
            )

        return (
            tuple(mod(f) for f in self.reading_step_filters),
            mod(self.matcher),
            tuple(mod(f) for f in self.outlier_filters),
            mod(self.error_minimizer),
            tuple(mod(c) for c in self.checkers),
            tuple(type(t).__name__ for t in self.transformations),
            self.acceleration,
            self.acceleration_window,
        )

    def _step_chain_traced(self) -> bool:
        """True when every reading step filter exposes a traced
        per-iteration schedule (SCHEDULE_TRACEABLE) — the fused
        ``lax.while_loop`` then applies them in-trace instead of dropping
        to the host-driven stepped driver."""
        return all(
            getattr(type(f), "SCHEDULE_TRACEABLE", False)
            for f in self.reading_step_filters
        )

    def _require_modules(self):
        if self.matcher is None:
            raise RuntimeError("You must setup a matcher before running ICP")
        if self.error_minimizer is None:
            raise RuntimeError(
                "You must setup an error minimizer before running ICP"
            )
        if self.inspector is None:
            raise RuntimeError("You must setup an inspector before running ICP")

    @property
    def prefiltered_reading_pts_count(self) -> int:
        v = self._prefiltered_reading
        return v.count_host() if isinstance(v, PointCloud) else int(v)

    @prefiltered_reading_pts_count.setter
    def prefiltered_reading_pts_count(self, v):
        self._prefiltered_reading = v

    @property
    def prefiltered_reference_pts_count(self) -> int:
        v = self._prefiltered_reference
        return v.count_host() if isinstance(v, PointCloud) else int(v)

    @prefiltered_reference_pts_count.setter
    def prefiltered_reference_pts_count(self, v):
        self._prefiltered_reference = v

    def get_prefiltered_reading_pts_count(self) -> int:
        return self.prefiltered_reading_pts_count

    def get_prefiltered_reference_pts_count(self) -> int:
        return self.prefiltered_reference_pts_count

    def get_max_num_iterations_reached(self) -> bool:
        return self.max_num_iterations_reached

    # Minimizer introspection parity (reference: PointMatcher.h:549-554).
    def get_point_used_ratio(self) -> float:
        if self.last_stats is None:
            raise RuntimeError("error minimizer needs to run at least once")
        return float(self.last_stats.point_used_ratio)

    def get_weighted_point_used_ratio(self) -> float:
        if self.last_stats is None:
            raise RuntimeError("error minimizer needs to run at least once")
        return float(self.last_stats.weighted_point_used_ratio)

    def get_overlap(self) -> float:
        """Overlap estimate of the last registration
        (reference: PointToPoint.cpp:119-152 — noise-aware when
        'simpleSensorNoise' descriptors were present; otherwise the weighted
        point-used ratio)."""
        if getattr(self, "last_overlap", None) is not None:
            return float(self.last_overlap)
        return self.get_weighted_point_used_ratio()

    def get_residual_error(self) -> float:
        if self.last_stats is None:
            raise RuntimeError("error minimizer needs to run at least once")
        return float(self.last_stats.residual)

    def get_nb_rejected_matches(self) -> int:
        if self.last_stats is None:
            raise RuntimeError("error minimizer needs to run at least once")
        return int(self.last_stats.nb_rejected_matches)

    def get_nb_rejected_points(self) -> int:
        if self.last_stats is None:
            raise RuntimeError("error minimizer needs to run at least once")
        return int(self.last_stats.nb_rejected_points)

    def get_covariance(self):
        """6x6 transform covariance from a WithCov minimizer
        (reference: PointToPlaneWithCov.cpp:157-162)."""
        if self.last_stats is None or self.last_stats.covariance is None:
            raise RuntimeError(
                "no covariance available: run a *WithCov error minimizer first"
            )
        import numpy as _np

        return _np.asarray(self.last_stats.covariance)


def _small_solve(A, b):
    """Closed-form solve for the AA window system (m ≤ 3: Cramer via the
    adjugate — branch-free VPU arithmetic that fuses into the loop body;
    ``jnp.linalg.solve``'s LU lowering is an unfusable sub-routine that
    serializes inside the vmapped ``while_loop``). Falls back to the
    general solve for larger windows.

    Returns ``(x, ok)``: ``ok`` is False when the f32 cofactor-expansion
    determinant is at cancellation noise level relative to the matrix
    scale (the AA Gram matrix is near-singular exactly when the residual
    history is collinear — common near convergence — and the computed det
    can then be pure noise, even wrong-signed). Callers must fall back to
    the plain fixed-point step when ``ok`` is False."""
    m = A.shape[-1]
    if m == 1:
        return b / A[..., 0, 0], jnp.asarray(True)
    # det formed by cancellation of ~scale^m terms carries absolute noise
    # ~O(10)*eps_f32*scale^m; below ~1e-5*scale^m the sign itself is
    # unreliable (and a genuinely tiny det means an ill-conditioned solve
    # AA should skip anyway)
    scale = jnp.maximum(jnp.max(jnp.abs(A)), 1e-30)
    if m == 2:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        ok = jnp.abs(det) > 1e-5 * scale * scale
        safe = jnp.where(ok, det, 1.0)
        x0 = (A[1, 1] * b[0] - A[0, 1] * b[1]) / safe
        x1 = (A[0, 0] * b[1] - A[1, 0] * b[0]) / safe
        return jnp.stack([x0, x1]), ok
    if m == 3:
        c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
        c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
        c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
        det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
        c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
        c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
        c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
        c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
        c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
        c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        ok = jnp.abs(det) > 1e-5 * scale * scale * scale
        safe = jnp.where(ok, det, 1.0)
        x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) / safe
        x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) / safe
        x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / safe
        return jnp.stack([x0, x1, x2]), ok
    return jnp.linalg.solve(A, b), jnp.asarray(True)


def _apply_transform(transformations: Sequence[Transformation], cloud, T):
    for t in transformations:
        cloud = t.compute(cloud, T)
    return cloud


@jax.jit
def _center_cloud(cloud: PointCloud):
    """Shift a cloud to its valid-point mean; → (centered, T_refIn_refMean)."""
    dim = cloud.dim
    mean = jnp.sum(
        jnp.where(cloud.mask[:, None], cloud.points, 0.0), axis=0
    ) / jnp.maximum(cloud.count(), 1)
    T = jnp.eye(dim + 1, dtype=cloud.points.dtype).at[:dim, dim].set(mean)
    return cloud.replace(points=cloud.points - mean[None, :]), T


class ICP(ICPChainBase):
    """One-shot registration engine (reference: ICP.cpp:242-452)."""

    def __call__(self, reading: PointCloud, reference: PointCloud,
                 T_init=None, seed: int = 0):
        return self.compute(reading, reference, T_init, seed=seed)

    # ------------------------------------------------------------- pipeline
    def compute(self, reading: PointCloud, reference: PointCloud,
                T_init=None, seed: int = 0):
        self._require_modules()
        self.inspector.init()
        t0 = time.perf_counter()
        if reading.dim != reference.dim:
            raise RuntimeError(
                f"reading is {reading.dim}D but reference is {reference.dim}D; "
                "clouds must share the same dimensionality"
            )
        dim = reference.dim
        if T_init is None:
            T_init = se3.identity(dim)
        T_init = jnp.asarray(T_init, jnp.float32)
        if T_init.shape != (dim + 1, dim + 1):
            raise RuntimeError(
                "The initial transformation matrix must be (d+1)x(d+1) for "
                f"d={dim}, got {T_init.shape}"
            )

        key = jax.random.PRNGKey(seed)
        wants_stats = self.inspector.wants_stats

        # ---- single-program one-shot (round-3): when the reference chain
        # is a host-prep head + traceable tail, its device tail, the static
        # compaction, the centering, the reading chain, the whole loop AND
        # the frame composition fuse into ONE program — the per-filter
        # compaction syncs (~25 ms each through the relay) disappear; the
        # only host work left is the box split on the (cached) host rows.
        if self._fused_all_ok(reading, reference):
            out = self._run_fused_all(reading, reference, T_init, key)
            if out is not None:
                return out
            # compaction-cap overflow (probabilistic sizing): fall through
            # to the exact eager path below

        ref_in_count = reference.count_host() if wants_stats else 0
        reference = apply_filter_chain(
            self.reference_filters, reference, jax.random.fold_in(key, 1)
        )
        # Center reference at its mean (reference: ICP.cpp:291-299);
        # stays on device — no host sync.
        reference, T_refIn_refMean = _center_cloud(reference)
        self.matcher.init(reference)

        if wants_stats:
            self.inspector.add_stat(
                "ReferencePreprocessingDuration", time.perf_counter() - t0
            )
            self.inspector.add_stat("ReferenceInPointCount", ref_in_count)
            self.inspector.add_stat(
                "ReferencePointCount", reference.count_host()
            )
        self.prefiltered_reference_pts_count = reference  # counted lazily

        return self.compute_with_transformed_reference(
            reading, reference, T_refIn_refMean, T_init, key
        )

    def compute_with_transformed_reference(
        self, reading_in: PointCloud, reference: PointCloud,
        T_refIn_refMean, T_init, key=None,
    ):
        """Loop half of the pipeline (reference: ICP.cpp:316-452);
        ``reference`` must already be centered and the matcher initialized."""
        dim = reference.dim
        if key is None:
            key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        wants_stats = self.inspector.wants_stats
        T_refMean_dataIn = se3.inverse(jnp.asarray(T_refIn_refMean)) @ T_init

        fused = (
            self._step_chain_traced()
            and not self.inspector.needs_iteration_data
        )
        # One-program one-shot: when the reading chain is traceable and the
        # matcher has no host-side loop prep, the filter chain, the
        # pre-transform and the whole fixed-point loop fuse into a single
        # jitted program — the reading-side host compaction sync (~25 ms
        # through the tunnel) disappears; the loop pays the raw padded row
        # count instead, which is cheaper than one round trip. Skipped for
        # stat-recording inspectors (they want host point counts).
        traced_prep = (
            fused
            and not wants_stats
            and chain_is_traceable(self.reading_filters)
            and type(self.matcher).prepare_loop is Matcher.prepare_loop
            # the noise-aware overlap path below needs the *filtered*
            # reading on the host — keep the host prep when sensor-noise
            # descriptors are present or produced
            and not reading_in.has_descriptor("simpleSensorNoise")
            and not any(
                type(f).__name__ == "SimpleSensorNoiseDataPointsFilter"
                for f in self.reading_filters
            )
        )
        if traced_prep:
            reading = reading_in
            T_iter, iters, code, stats, read_count = self._run_fused_prep(
                reading_in, reference, T_refMean_dataIn,
                jax.random.fold_in(key, 2), jax.random.fold_in(key, 3),
            )
            matcher_aux = None
        else:
            read_in_count = reading_in.count_host() if wants_stats else 0
            reading = apply_filter_chain(
                self.reading_filters, reading_in, jax.random.fold_in(key, 2)
            )
            reading = _apply_transform(
                self.transformations, reading, T_refMean_dataIn
            )

            if wants_stats:
                self.inspector.add_stat(
                    "ReadingPreprocessingDuration", time.perf_counter() - t0
                )
                self.inspector.add_stat("ReadingInPointCount", read_in_count)
                self.inspector.add_stat(
                    "ReadingPointCount", reading.count_host()
                )
            read_count = None
        t_loop = time.perf_counter()

        if not traced_prep:
            # per-registration matcher setup (e.g. BlockGridMatcher's
            # static tile assignment); None for matchers that need none.
            # Skipped under step filters: those change which points are
            # live each iteration, voiding a loop-start assignment.
            if fused:
                matcher_aux = self.matcher.prepare_loop(reading)
            else:
                # the stepped driver never threads aux — stale per-
                # registration matcher state must not leak into its step
                matcher_aux = None
                self.matcher.invalidate_loop_state()
            if fused:
                T_iter, iters, code, stats = self._run_fused(
                    reading, reference, jax.random.fold_in(key, 3),
                    matcher_aux,
                )
            else:
                T_iter, iters, code, stats = self._run_stepped(
                    reading, reference, jax.random.fold_in(key, 3)
                )

        # one synchronized pull for everything the host needs
        if read_count is not None:
            iters, code, stats, read_count = jax.device_get(
                (iters, code, stats, read_count)
            )
            self.prefiltered_reading_pts_count = int(read_count)
        else:
            iters, code, stats = jax.device_get((iters, code, stats))
            self.prefiltered_reading_pts_count = reading  # counted lazily
        code = int(code)
        self.max_num_iterations_reached = code == CODE_MAX_ITER
        self.last_iteration_count = int(iters)
        self.last_stats = stats
        # motionBound invariant guard (BlockGridMatcher exactness relies on
        # no reading point moving farther than motionBound from its
        # loop-entry pose; the reference's bounded search is never silently
        # wrong within maxDist, MatchersImpl.cpp:86-101)
        self.motion_bound_exceeded = False
        bound = getattr(self.matcher, "motionBound", None)
        if (bound is not None and stats.motion_max is not None
                and matcher_aux is not None):
            motion = float(stats.motion_max)
            if motion > float(bound):
                self.motion_bound_exceeded = True
                log_warning(
                    f"BlockGridMatcher: max reading-point displacement "
                    f"bound {motion:.3f} exceeded motionBound "
                    f"{float(bound):.3f} during the loop — matches beyond "
                    f"the pre-assigned cell neighborhoods may have been "
                    f"missed; raise motionBound (cell edge = maxDist + "
                    f"motionBound) or tighten the prior"
                )
        if fused and wants_stats:
            # per-matcher touch statistics (reference: MatchersImpl.cpp:86-101
            # accumulates actual kd-tree visit counts): the dense sweep
            # reports N·M, culling matchers their real candidate counts.
            # Only computed when an inspector records it — the dense count
            # costs host syncs. The public get_visit_count() contract is
            # unchanged: the engine resets it to 0 after reporting.
            self.matcher.visit_count += (
                self.last_iteration_count
                * self.matcher.touched_per_iteration(
                    reading if not traced_prep else reading_in, reference
                )
            )
        if code == CODE_NAN_ERROR:
            raise ConvergenceError("abs rotation/translation norm not a number")
        if code == CODE_BOUND_ERROR:
            raise ConvergenceError(
                "transformation bound exceeded (BoundTransformationChecker)"
            )
        if code == CODE_NO_INLIERS:
            raise ConvergenceError("ErrorMinimizer: no point to minimize")

        self.inspector.add_stat("IterationsCount", int(iters))
        self.inspector.add_stat(
            "PointCountTouched", self.matcher.get_visit_count()
        )
        self.matcher.reset_visit_count()
        # Noise-aware overlap when sensor-noise descriptors are available
        # (reference: PointToPoint.cpp:119-152); otherwise the weighted ratio.
        self.last_overlap = None
        if reading.has_descriptor("simpleSensorNoise"):
            stepped = _apply_transform(self.transformations, reading, T_iter)
            matches = self.matcher.find_closests_in(stepped, reference)
            weights, _ = compute_outlier_weights(
                tuple(self.outlier_filters), stepped, reference, matches,
                init_outlier_states(self.outlier_filters),
            )
            self.last_overlap = float(
                estimate_overlap(
                    stepped, reference, weights, matches,
                    self.last_stats.weighted_point_used_ratio,
                )
            )
        self.inspector.add_stat("OverlapRatio", self.get_overlap())
        self.inspector.add_stat("ConvergenceDuration", time.perf_counter() - t_loop)
        self.inspector.finish(int(iters))
        log_info(
            f"PointMatcher::icp - {int(iters)} iterations took "
            f"{time.perf_counter() - t_loop:.4f} s"
        )

        # Frame composition (reference: ICP.cpp:444-448).
        return jnp.asarray(T_refIn_refMean) @ T_iter @ T_refMean_dataIn

    # ------------------------------------------------------------ the step
    def _make_step(self, reading: PointCloud, reference: PointCloud,
                   checkers=None, in_loop_step_filters=True):
        """Build the traced per-iteration function shared by both drivers.
        ``checkers`` overrides the chain's own checker set (the queue
        driver's coarse phase runs the same step under a tightened
        iteration budget / loosened differential stop).
        ``in_loop_step_filters=False`` (the stepped driver) leaves step
        filters to the host loop — applying them both places would
        double-decimate."""
        matcher = self.matcher
        outliers = tuple(self.outlier_filters)
        minimizer = self.error_minimizer
        checkers = tuple(self.checkers if checkers is None else checkers)
        transformations = tuple(self.transformations)
        # schedule-traceable step filters run INSIDE the traced step (the
        # reference applies readingStepDataPointsFilters per iteration,
        # ICP.cpp:373-379); chains with hostful step filters never build
        # this step — they use the stepped driver (see _step_chain_traced)
        step_filters = (
            tuple(self.reading_step_filters)
            if in_loop_step_filters and self._step_chain_traced() else ()
        )

        stateful = hasattr(type(matcher), "find_closests_in_stateful")

        def step(reading, reference, T_iter, checker_states, outlier_states,
                 iteration, matcher_aux=None, matcher_state=None):
            for f in step_filters:
                reading = f.mask_at_iteration(reading, iteration)
            stepped = _apply_transform(transformations, reading, T_iter)
            if (matcher_aux is not None and matcher_state is not None
                    and stateful):
                # matchers with loop-carried search state (the bbox-pruned
                # sweep carries each query's previous winner as its exact
                # NN upper bound, ops/knn_skip.py)
                matches, matcher_state = matcher.find_closests_in_stateful(
                    stepped, reference, matcher_aux, matcher_state
                )
            elif matcher_aux is not None:
                matches = matcher.find_closests_in(
                    stepped, reference, aux=matcher_aux
                )
            else:
                matches = matcher.find_closests_in(stepped, reference)
            weights, outlier_states = compute_outlier_weights(
                outliers, stepped, reference, matches, outlier_states
            )
            usable = jnp.logical_and(jnp.isfinite(matches.dists), weights != 0.0)
            no_inliers = jnp.logical_not(jnp.any(usable))
            T_delta, stats = minimizer.compute(stepped, reference, weights, matches)
            T_new = T_delta @ T_iter
            iterate = jnp.asarray(True)
            code = jnp.int32(0)
            new_checker_states = []
            for chk, st in zip(checkers, checker_states):
                st2, stop, c = chk.check(st, T_new, iteration)
                new_checker_states.append(st2)
                iterate = jnp.logical_and(iterate, jnp.logical_not(stop))
                code = jnp.maximum(code, c)
            code = jnp.where(no_inliers, CODE_NO_INLIERS, code)
            iterate = jnp.logical_and(iterate, jnp.logical_not(no_inliers))
            # Hard errors always stop; MAX_ITER only when counter says stop.
            return T_new, tuple(new_checker_states), outlier_states, iterate, \
                code, stats, matches, weights, matcher_state

        return step

    def _init_loop_state(self, dim):
        T0 = se3.identity(dim)
        checker_states = tuple(c.init_state(T0) for c in self.checkers)
        outlier_states = init_outlier_states(self.outlier_filters)
        cov0 = (
            jnp.zeros((6, 6), jnp.float32)
            if self.error_minimizer.PRODUCES_COVARIANCE
            else None
        )
        stats0 = MinimizerStats(
            jnp.float32(0), jnp.float32(0), jnp.float32(0), cov0,
            jnp.int32(0), jnp.int32(0), jnp.float32(0),
        )
        return T0, checker_states, outlier_states, stats0

    def _motion_tracker(self, reading):
        """Displacement-bound tracker for bounded-search matchers (the
        ``motionBound`` exactness invariant, see BlockGridMatcher): returns
        ``f(T_iter, prev_max) → new_max`` bounding the displacement of ANY
        reading point under ``T_iter`` vs its loop-entry pose (where the
        tile assignment was built). Referenced to the reading's CENTROID
        ``c`` — for x in the ball of radius r around c,
        ``‖Rx + t − x‖ ≤ ‖R(x−c) − (x−c)‖ + ‖Rc + t − c‖
        ≤ 2·sin(θ/2)·r + ‖(R−I)c + t‖`` with
        ``2·sin(θ/2) = sqrt(dim − tr R)``. The origin-referenced form
        (``σ·max‖x‖ + ‖t‖``) is the c=0 special case and falsely flagged
        scans far from the map mean: a rotation about the scan's own
        center shows up there as a large rotation PLUS a large
        compensating translation, each inflating the bound by
        ~angle·range (measured ~4x over-report at a 58 m scene).
        The reference's bounded search is never silently wrong within
        maxDist (MatchersImpl.cpp:86-101); this makes our static-cells
        equivalent verifiable at runtime."""
        dim = reading.dim
        cnt = jnp.maximum(reading.count(), 1)
        c = jnp.sum(
            jnp.where(reading.mask[:, None], reading.points, 0.0), axis=0
        ) / cnt
        r_local = jnp.max(
            jnp.where(reading.mask,
                      jnp.linalg.norm(reading.points - c[None, :], axis=1),
                      0.0)
        )

        def track(T_new, prev):
            R = T_new[:dim, :dim]
            t = T_new[:dim, dim]
            sigma = jnp.sqrt(jnp.maximum(dim - jnp.trace(R), 0.0))
            drift = jnp.linalg.norm(R @ c + t - c)
            return jnp.maximum(prev, sigma * r_local + drift)

        return track

    # ------------------------------------------------------- fused while_loop
    def make_loop_runner(self):
        """The complete fixed-point loop as one pure function
        ``(reading, reference) → (T_iter, iterations, code, stats)``.

        This is the unit the drivers build on: ``_run_fused`` jits it
        directly; ``parallel.batch`` vmaps it over stacked registration
        pairs; the multi-chip path runs it over sharded inputs and lets XLA
        insert the collectives."""
        step = self._make_step(None, None)
        if self.acceleration == "anderson":
            return self._make_anderson_runner(step)

        track_motion = type(self.matcher).__name__ == "BlockGridMatcher"
        matcher = self.matcher
        stateful = hasattr(type(matcher), "find_closests_in_stateful")

        def run_loop(reading, reference, matcher_aux=None):
            dim = reading.dim
            T0, checker_states, outlier_states, stats0 = (
                self._init_loop_state(dim)
            )
            track = (
                self._motion_tracker(reading)
                if track_motion and matcher_aux is not None else None
            )
            mstate0 = (
                matcher.loop_state_init(reading, matcher_aux)
                if stateful and matcher_aux is not None else None
            )

            def cond(carry):
                return carry[3]

            def body(carry):
                (T_iter, checker_states, outlier_states, _, iteration,
                 code, stats_prev, mstate) = carry
                T_new, checker_states, outlier_states, iterate, code2, \
                    stats, _, _, mstate = step(
                        reading, reference, T_iter, checker_states,
                        outlier_states, iteration, matcher_aux, mstate,
                    )
                motion = (
                    track(T_new, stats_prev.motion_max)
                    if track is not None else stats_prev.motion_max
                )
                stats = stats._replace(motion_max=motion)
                return (
                    T_new, checker_states, outlier_states, iterate,
                    iteration + 1, jnp.maximum(code, code2), stats, mstate,
                )

            init = (
                T0, checker_states, outlier_states, jnp.asarray(True),
                jnp.int32(0), jnp.int32(0), stats0, mstate0,
            )
            T, _, _, _, iters, code, stats, _ = jax.lax.while_loop(
                cond, body, init
            )
            return T, iters, code, stats

        return run_loop

    def _make_anderson_runner(self, step):
        r"""Anderson-accelerated fixed-point driver (AA-ICP,
        \cite{Pavlov2017AAICP}). The ICP map g(x) is one plain iteration;
        each step extrapolates over a window of the last m fixed-point
        residuals (constrained least squares via the KKT normal equations
        — an m x m closed-form solve) and falls back to the plain update
        whenever the residual norm grows.

        The window runs in FLATTENED-MATRIX space — x = vec(T[:d, :]) —
        with one Newton–Schulz re-orthogonalization of the extrapolated
        rotation block (R ← ½R(3I − RᵀR), twice), instead of the round-3
        se(n) log/exp maps: the log/exp trigonometry was ~3.5 ms/batch-
        iteration of small-op critical path that erased the iteration
        savings (ROADMAP round-3 measurement). Extrapolations stay near
        SO(d) (affine combos of nearby rotations), which is the
        Newton–Schulz convergence regime; an orthogonality-drift guard
        and a positive-determinant check fall back to the plain step
        outside it."""
        m = int(self.acceleration_window)
        track_motion = type(self.matcher).__name__ == "BlockGridMatcher"

        def run_loop(reading, reference, matcher_aux=None):
            dim = reading.dim
            p = dim * (dim + 1)
            T0, checker_states, outlier_states, stats0 = (
                self._init_loop_state(dim)
            )
            track = (
                self._motion_tracker(reading)
                if track_motion and matcher_aux is not None else None
            )
            mstate0 = (
                self.matcher.loop_state_init(reading, matcher_aux)
                if (hasattr(type(self.matcher), "find_closests_in_stateful")
                    and matcher_aux is not None) else None
            )

            def cond(carry):
                return carry[3]

            def body(carry):
                (T_iter, checker_states, outlier_states, _, iteration, code,
                 stats_prev, G, F, hist_len, prev_fnorm, mstate) = carry
                T_plain, checker_states, outlier_states, iterate, code2, \
                    stats, _, _, mstate = step(
                        reading, reference, T_iter, checker_states,
                        outlier_states, iteration, matcher_aux, mstate,
                    )
                g = T_plain[:dim, :].reshape(-1)
                x = T_iter[:dim, :].reshape(-1)
                f = g - x
                fnorm = jnp.linalg.norm(f)
                # residual grew → restart the window (safeguard)
                restart = jnp.logical_and(hist_len > 0, fnorm > prev_fnorm)
                hist_len = jnp.where(restart, 0, hist_len)
                G = jnp.concatenate([G[1:], g[None]], axis=0)  # [m, p]
                F = jnp.concatenate([F[1:], f[None]], axis=0)
                hist_len = jnp.minimum(hist_len + 1, m)
                # slot j (0 oldest) valid iff j >= m - hist_len
                slot = jnp.arange(m)
                valid = (slot >= (m - hist_len)).astype(F.dtype)
                Fv = F * valid[:, None]
                A = Fv @ Fv.T + 1e-10 * jnp.eye(m, dtype=F.dtype)
                # force invalid slots to identity rows (α = 0 there)
                A = jnp.where(
                    jnp.logical_and(valid[:, None] > 0, valid[None, :] > 0),
                    A, jnp.eye(m, dtype=F.dtype),
                )
                alpha, solve_ok = _small_solve(A, valid)
                # noise-level det → deterministic plain step (weight 1 on
                # the newest slot), instead of a garbage extrapolation the
                # trust region must catch
                e_new = (slot == (m - 1)).astype(F.dtype)
                alpha = jnp.where(solve_ok, alpha, e_new)
                alpha = alpha * valid / jnp.maximum(jnp.sum(alpha * valid), 1e-20)
                x_acc = alpha @ G
                M = x_acc.reshape(dim, dim + 1)
                R = M[:, :dim]
                eye_d = jnp.eye(dim, dtype=R.dtype)
                drift = jnp.linalg.norm(R.T @ R - eye_d)
                # Newton–Schulz polar projection: 3 iterations leave the
                # worst-case orthogonality error at f32 noise even from the
                # drift<0.3 guard boundary (two left ~4e-3 — an
                # early-terminating checker right after a large-drift
                # accepted extrapolation would have returned a slightly
                # non-rigid transform; advisor round-4)
                for _ in range(3):
                    R = 0.5 * R @ (3.0 * eye_d - R.T @ R)
                T_acc = (
                    jnp.eye(dim + 1, dtype=T_plain.dtype)
                    .at[:dim, :dim].set(R)
                    .at[:dim, dim].set(M[:, dim])
                )
                # trust region: reject extrapolations far beyond the plain
                # step (degenerate residual history makes the constrained
                # solve blow up); checkers only validated T_plain, so a wild
                # T_acc must never be carried or returned. The rotation
                # block must also stay inside the Newton–Schulz regime and
                # orientation-preserving (a reflection satisfies RᵀR = I).
                trust = jnp.logical_and(
                    jnp.linalg.norm(x_acc - g) <= 10.0 * fnorm,
                    jnp.logical_and(drift < 0.3,
                                    jnp.linalg.det(R) > 0.5),
                )
                use_aa = jnp.logical_and(hist_len > 1, trust)
                T_next = jnp.where(use_aa, T_acc, T_plain)
                motion = (
                    track(T_next, stats_prev.motion_max)
                    if track is not None else stats_prev.motion_max
                )
                stats = stats._replace(motion_max=motion)
                return (
                    T_next, checker_states, outlier_states, iterate,
                    iteration + 1, jnp.maximum(code, code2), stats,
                    G, F, hist_len, fnorm, mstate,
                )

            zeros = jnp.zeros((m, p), T0.dtype)
            init = (
                T0, checker_states, outlier_states, jnp.asarray(True),
                jnp.int32(0), jnp.int32(0), stats0,
                zeros, zeros, jnp.int32(0), jnp.float32(jnp.inf), mstate0,
            )
            out = jax.lax.while_loop(cond, body, init)
            T, _, _, _, iters, code, stats = out[:7]
            return T, iters, code, stats

        return run_loop

    def _fused_all_ok(self, reading, reference) -> bool:
        """Eligibility for the single-program one-shot path: traceable
        reading chain, a reference chain whose first filter may be
        HOST_PREP (structure on host, tail traced) with every later filter
        TRACEABLE, a matcher with no init-time acceleration state, and no
        host-side observability demands."""
        rf = self.reference_filters
        return (
            self._step_chain_traced()
            and not self.inspector.needs_iteration_data
            and not self.inspector.wants_stats
            and chain_is_traceable(self.reading_filters)
            and type(self.matcher).prepare_loop is Matcher.prepare_loop
            and type(self.matcher).init is Matcher.init
            and all(
                getattr(f, "TRACEABLE", False)
                or getattr(f, "HOST_PREP", False)
                for f in rf
            )
            and all(getattr(f, "TRACEABLE", False) for f in rf[1:])
            and not reading.has_descriptor("simpleSensorNoise")
            and not any(
                type(f).__name__ == "SimpleSensorNoiseDataPointsFilter"
                for f in list(self.reading_filters) + list(rf)
            )
        )

    def _run_fused_all(self, reading_in, reference_in, T_init, key):
        """One device program for the ENTIRE one-shot registration
        (reference: ICP.cpp:265-452 — the pipeline being fused): reference
        filter tail + static compaction + mean-centering + reading chain +
        pre-transform + fixed-point loop + frame composition, one dispatch,
        one readback. Returns the final T, or None on compaction-cap
        overflow (caller re-runs the exact eager path)."""
        from .cloud import bucket_size

        t0 = time.perf_counter()
        pts_h, mask_h = reference_in.host_rows()
        aux_static = []   # scalar entries: closed over, part of the key
        aux_arr = []      # array entries: passed as traced runner args
        bound = int(np.asarray(mask_h, bool).sum())
        for f in self.reference_filters:
            aux = (
                f.prepare_host(pts_h, mask_h)
                if getattr(f, "HOST_PREP", False) else None
            )
            bound = min(f.survivor_bound(bound, aux), bound)
            if aux is None:
                aux_static.append(None)
                aux_arr.append(None)
            else:
                # '_'-prefixed aux keys are host-only (survivor_bound
                # inputs, diagnostics) — not part of the traced program
                aux_static.append({
                    k: v for k, v in aux.items()
                    if not hasattr(v, "shape") and not k.startswith("_")
                })
                aux_arr.append({
                    k: v for k, v in aux.items()
                    if hasattr(v, "shape") and not k.startswith("_")
                })
        n_pad = reference_in.num_points
        # fine 256-granule cap (not the 1-1.5-2 ladder): the loop pays
        # O(N·cap_f) every iteration and same-size one-shots share the key
        cap_f = min(256 * -(-max(bound, 1) // 256), n_pad)
        del bucket_size

        aux_shapes = tuple(
            None if s is None else (
                tuple(sorted(s.items())),
                tuple(sorted((k, np.asarray(v).shape)
                             for k, v in a.items())),
            )
            for s, a in zip(aux_static, aux_arr)
        )
        cache_key = (
            "fused_all",
            reading_in.num_points, n_pad, cap_f, reading_in.dim,
            reading_in.descriptor_labels(), reference_in.descriptor_labels(),
            aux_shapes,
            self._config_fingerprint(),
            tuple(
                (type(f).__name__, tuple(sorted(f.parameters.items())))
                for f in list(self.reading_filters) + list(self.reference_filters)
            ),
        )
        runner = self._jit_cache.get(cache_key)
        if runner is None:
            reading_filters = tuple(self.reading_filters)
            reference_filters = tuple(self.reference_filters)
            transformations = tuple(self.transformations)
            run_loop = self.make_loop_runner()
            dim = reference_in.dim
            statics = tuple(
                None if s is None else dict(s) for s in aux_static
            )

            def full(reading_in, reference_in, aux_arrays, T_init, key):
                kf = jax.random.fold_in(key, 1)
                kr = jax.random.fold_in(key, 2)
                ref = reference_in
                for i, f in enumerate(reference_filters):
                    aux_i = (
                        None if aux_arrays[i] is None
                        else {**statics[i], **aux_arrays[i]}
                    )
                    ref = f.filter_traced(
                        ref, aux_i, jax.random.fold_in(kf, i)
                    )
                ref_count = ref.count()
                overflow = ref_count > cap_f
                ref = ref.compact_traced(cap_f)
                mean = jnp.sum(
                    jnp.where(ref.mask[:, None], ref.points, 0.0), axis=0
                ) / jnp.maximum(ref.count(), 1)
                ref = ref.replace(points=ref.points - mean[None, :])
                Trm = jnp.eye(
                    dim + 1, dtype=jnp.float32
                ).at[:dim, dim].set(mean)
                reading = apply_filter_chain_traced(
                    reading_filters, reading_in, kr
                )
                read_count = reading.count()
                T_rmd = se3.inverse(Trm) @ T_init
                reading = _apply_transform(transformations, reading, T_rmd)
                T, iters, code, stats = run_loop(reading, ref, None)
                T_final = Trm @ T @ T_rmd
                return (T_final, iters, code, stats, read_count, ref_count,
                        overflow)

            runner = jax.jit(full)
            self._jit_cache[cache_key] = runner

        aux_arrays = tuple(
            None if a is None
            else {k: jnp.asarray(v) for k, v in a.items()}
            for a in aux_arr
        )
        T_final, d_iters, d_code, d_stats, read_count, ref_count, overflow = \
            runner(reading_in, reference_in, aux_arrays, T_init, key)

        # one synchronized pull for everything the host needs
        iters, code, stats, read_count, ref_count, overflow = jax.device_get(
            (d_iters, d_code, d_stats, read_count, ref_count, overflow)
        )
        if bool(overflow):
            return None
        self.prefiltered_reading_pts_count = int(read_count)
        self.prefiltered_reference_pts_count = int(ref_count)
        code = int(code)
        self.max_num_iterations_reached = code == CODE_MAX_ITER
        self.last_iteration_count = int(iters)
        self.last_stats = stats
        self.last_overlap = None
        self.motion_bound_exceeded = False
        if code == CODE_NAN_ERROR:
            raise ConvergenceError("abs rotation/translation norm not a number")
        if code == CODE_BOUND_ERROR:
            raise ConvergenceError(
                "transformation bound exceeded (BoundTransformationChecker)"
            )
        if code == CODE_NO_INLIERS:
            raise ConvergenceError("ErrorMinimizer: no point to minimize")
        self.inspector.add_stat("IterationsCount", int(iters))
        self.inspector.add_stat(
            "PointCountTouched", self.matcher.get_visit_count()
        )
        self.matcher.reset_visit_count()
        self.inspector.add_stat("OverlapRatio", self.get_overlap())
        self.inspector.add_stat(
            "ConvergenceDuration", time.perf_counter() - t0
        )
        self.inspector.finish(int(iters))
        log_info(
            f"PointMatcher::icp - {int(iters)} iterations took "
            f"{time.perf_counter() - t0:.4f} s"
        )
        return T_final

    def _run_fused_prep(self, reading_in, reference, T_refMean_dataIn,
                        prep_key, loop_key):
        """One-shot single-program path: traceable reading filters, the
        pre-transform and the full fixed-point loop in one jit (see
        compute_with_transformed_reference). Returns the loop outputs plus
        the filtered reading's valid count (rides the same readback)."""
        cache_key = (
            "fused_prep",
            reading_in.num_points,
            reference.num_points,
            reading_in.dim,
            reading_in.descriptor_labels(),
            reference.descriptor_labels(),
            self._config_fingerprint(),
            tuple(
                (type(f).__name__, tuple(sorted(f.parameters.items())))
                for f in self.reading_filters
            ),
        )
        runner = self._jit_cache.get(cache_key)
        if runner is None:
            reading_filters = tuple(self.reading_filters)
            transformations = tuple(self.transformations)
            run_loop = self.make_loop_runner()

            def full(reading_in, reference, T_rmd, prep_key, loop_key):
                reading = apply_filter_chain_traced(
                    reading_filters, reading_in, prep_key
                )
                count = reading.count()
                reading = _apply_transform(transformations, reading, T_rmd)
                T, iters, code, stats = run_loop(reading, reference, None)
                return T, iters, code, stats, count

            runner = jax.jit(full)
            self._jit_cache[cache_key] = runner
        return runner(
            reading_in, reference, T_refMean_dataIn, prep_key, loop_key
        )

    def _run_fused(self, reading, reference, key, matcher_aux=None):
        aux_shapes = (
            tuple(sorted((k, tuple(v.shape)) for k, v in matcher_aux.items()))
            if matcher_aux is not None else None
        )
        cache_key = (
            "fused",
            reading.num_points,
            reference.num_points,
            reading.dim,
            reading.descriptor_labels(),
            reference.descriptor_labels(),
            aux_shapes,
            self._config_fingerprint(),
        )
        runner = self._jit_cache.get(cache_key)
        if runner is None:
            runner = jax.jit(self.make_loop_runner())
            self._jit_cache[cache_key] = runner

        return runner(reading, reference, matcher_aux)

    # -------------------------------------------------------- stepped driver
    def _run_stepped(self, reading, reference, key):
        dim = reading.dim
        T_iter, checker_states, outlier_states, stats = self._init_loop_state(dim)
        for f in self.reading_step_filters:
            f.init()
        step = self._make_step(reading, reference,
                               in_loop_step_filters=False)
        jit_step = jax.jit(step)
        iterate = True
        iteration = 0
        code = 0
        while iterate:
            step_reading = reading
            if self.reading_step_filters:
                # compact=False keeps shapes static so jit_step's cache holds
                step_reading = apply_filter_chain(
                    self.reading_step_filters,
                    reading,
                    jax.random.fold_in(key, iteration),
                    compact=False,
                )
            jit_fn = jit_step
            T_new, checker_states, outlier_states, it, c, stats, matches, \
                weights, _ = jit_fn(
                    step_reading, reference, T_iter, checker_states,
                    outlier_states, jnp.int32(iteration),
                )
            self.matcher.visit_count += self.matcher.touched_per_iteration(
                step_reading, reference
            )
            if self.inspector.needs_iteration_data:
                stepped_vis = _apply_transform(
                    self.transformations, step_reading, T_iter
                )
                self.inspector.dump_iteration(
                    iteration, jax.device_get(T_new), reference, stepped_vis,
                    jax.device_get(matches), jax.device_get(weights),
                    self.checkers,
                )
            T_iter = T_new
            iterate = bool(it)
            code = max(code, int(c))
            iteration += 1
            if code >= CODE_NAN_ERROR:
                break
        return T_iter, iteration, code, stats


class ICPSequence(ICP):
    """Persistent-map engine: filter the map and build matcher state once,
    then register many readings against it (reference: ICP.cpp:455-612)."""

    def __init__(self):
        super().__init__()
        self._map: Optional[PointCloud] = None
        self._T_refIn_refMean = None
        self._T_refIn_refMean_host = None

    def has_map(self) -> bool:
        return self._map is not None

    def trm_host(self) -> np.ndarray:
        """Host float64 copy of ``_T_refIn_refMean``, cached per map —
        the serving drivers need it every call for host-side pose
        composition, and an uncached ``device_get`` is a ~25 ms relay
        round trip per batch."""
        if self._T_refIn_refMean_host is None:
            self._T_refIn_refMean_host = np.asarray(
                jax.device_get(self._T_refIn_refMean), np.float64
            )
        return self._T_refIn_refMean_host

    def set_map(self, cloud: PointCloud, seed: int = 0) -> bool:
        """Center + filter the map and init the matcher
        (reference: ICP.cpp:463-508)."""
        self._require_modules()
        dim = cloud.dim
        key = jax.random.PRNGKey(seed)
        cloud = apply_filter_chain(
            self.reference_filters, cloud, jax.random.fold_in(key, 1)
        )
        # fine re-bucket: the map is long-lived (one compile per map shape is
        # fine) and every loop iteration pays O(N·M_alloc) in the sweep — the
        # coarse 1-1.5-2 ladder wastes up to 33% of that
        cloud = cloud.compact(granule=512, ladder=False)
        cloud, self._T_refIn_refMean = _center_cloud(cloud)
        self._T_refIn_refMean_host = None
        self._map = cloud
        self.matcher.init(cloud)
        self.prefiltered_reference_pts_count = cloud.count_host()
        self._jit_cache = {}
        return True

    def clear_map(self) -> None:
        self._map = None
        self._T_refIn_refMean = None
        self._T_refIn_refMean_host = None
        self._jit_cache = {}

    def warmup(self, num_points: int, batch: int = 8, lanes=None,
               queue_len=None, coarse=None, seed: int = 0,
               example: Optional[PointCloud] = None) -> float:
        """Precompile the serving program(s) for scans of ``num_points``
        raw rows, so the first real scan batch never eats the multi-minute
        relay first-compile stall mid-stream (LARGE_r04 measured a cold
        ``set_map``+serve chain at up to 135 s; warm 1-3 s — the
        persistent cache keys on shapes, which this call exercises). Warms
        the batched path at ``batch``; with ``queue_len``/``lanes`` also
        the continuous-batching queue driver (queue lengths are bucketed,
        so the compiled program covers nearby real queue sizes too) and
        its coarse-to-fine phases when ``coarse`` is given. Returns the
        wall seconds spent.

        Pass ``example`` (a representative real scan) whenever the
        reading chain contains CONTENT-DEPENDENT filters (bounding-box,
        density, shadow, distance cuts…): the serving compaction cap is
        probed once per (shape, config) from the first scan seen, and a
        synthetic probe's keep-rate could pin a cap real scans overflow
        (overflow is surfaced in ``info['compact_overflow']``, never
        silent, but the overflowing rows would be dropped). Without
        ``example`` the probe uses synthetic points drawn uniformly in
        the map's bounding box — exact for content-independent chains
        like the default RandomSampling one.

        The reference has no analogue (C++ has no compile step); this is
        the TPU-native counterpart of ICPSequence::setMap's index build
        (reference: ICP.cpp:463-508) extended to the compiled programs."""
        assert self.has_map(), "set_map first"
        t0 = time.perf_counter()
        import numpy as _np

        if example is not None:
            scan = example
        else:
            m = self.get_prefiltered_internal_map()
            pts, mask = jax.device_get((m.points, m.mask))
            pts = _np.asarray(pts)[_np.asarray(mask, bool)]
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            rng = _np.random.default_rng(seed)
            fake = rng.uniform(
                lo, hi, size=(int(num_points), m.dim)
            ).astype(_np.float32)
            scan = PointCloud(jnp.asarray(fake))
        from .parallel.batch import register_batch_to_map

        register_batch_to_map(self, [scan] * int(batch), seed=seed)
        if queue_len:
            from .parallel.stream import register_queue_to_map

            register_queue_to_map(
                self, [scan] * int(queue_len), seed=seed,
                lanes=int(lanes or batch), coarse=coarse,
            )
        return time.perf_counter() - t0

    def get_prefiltered_internal_map(self) -> PointCloud:
        if self._map is None:
            raise RuntimeError("no map set")
        return self._map

    def get_prefiltered_map(self) -> PointCloud:
        """Map expressed back in its original frame (reference: ICP.cpp:541-552)."""
        m = self.get_prefiltered_internal_map()
        d = m.dim
        t = self._T_refIn_refMean[:d, d]
        return m.replace(points=m.points + t[None, :])

    # deprecated aliases (reference: ICP.cpp:553-573)
    getInternalMap = get_prefiltered_internal_map
    getMap = get_prefiltered_map

    def __call__(self, cloud: PointCloud, T_init=None, seed: int = 0):
        return self.compute(cloud, T_init=T_init, seed=seed)

    def compute(self, reading: PointCloud, reference=None, T_init=None,
                seed: int = 0):
        if reference is not None:
            raise RuntimeError(
                "ICPSequence registers against its persistent map — call "
                "set_map(cloud) instead of passing a reference (reference: "
                "ICP.cpp:577-609); use ICP for one-shot pairs"
            )
        dim = reading.dim
        if T_init is None:
            T_init = se3.identity(dim)
        if self._map is None:
            # identity when no map (reference: ICP.cpp:595-600)
            log_warning("ICPSequence: no map, returning identity")
            return jnp.asarray(T_init, jnp.float32)
        return self.compute_with_transformed_reference(
            reading, self._map, self._T_refIn_refMean,
            jnp.asarray(T_init, jnp.float32), jax.random.PRNGKey(seed),
        )
