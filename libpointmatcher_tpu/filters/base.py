"""Filter interface and chain semantics.

Reference contract: ``filter(input) → DataPoints`` applied sequentially with
point-count logging and an empty-cloud ``ConvergenceError``
(reference: PointMatcher.h:437-467, DataPointsFilter.cpp:106-131).

TPU design: filters are pure functions on masked fixed-shape clouds. They run
eagerly on device *outside* the jitted ICP hot loop (the reference also runs
them once per registration, not per iteration), and the chain compacts +
re-buckets between filters so downstream cost scales with surviving points.
Filters needing randomness take an explicit ``jax.random`` key — there is no
hidden ``std::rand()`` state; reproducibility comes from the seed."""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from ..cloud import PointCloud
from ..errors import ConvergenceError
from ..loggers import log_info
from ..registry import Parametrizable, Registrar

__all__ = [
    "DataPointsFilter",
    "DataPointsFilterRegistrar",
    "apply_filter_chain",
    "apply_filter_chain_traced",
    "chain_is_traceable",
]

DataPointsFilterRegistrar = Registrar("DataPointsFilter")


class DataPointsFilter(Parametrizable):
    """Interface (reference: PointMatcher.h:437-450)."""

    #: True iff :meth:`filter` is a pure jnp function of (cloud, key) — no
    #: host syncs, no Python-side state — and may therefore run *inside* a
    #: jitted/vmapped program (the fused batch-serving path). Filters doing
    #: host work (count-dependent branches, schedules) keep the default.
    TRACEABLE = False

    #: True iff the filter's host work is PURE STRUCTURE derivation
    #: (:meth:`prepare_host` on numpy rows, no device syncs) followed by a
    #: jit-safe tail (:meth:`filter_traced`) — the one-shot engine fuses
    #: such chains into its single-program path. TRACEABLE filters satisfy
    #: the protocol trivially (aux=None, tail = filter).
    HOST_PREP = False

    #: True iff the filter's per-ICP-iteration behavior is a PURE traced
    #: function of (cloud, iteration) via :meth:`mask_at_iteration` — a
    #: deterministic schedule with no host state. Step-filter chains where
    #: every member sets this run INSIDE the fused ``lax.while_loop``
    #: (reference applies readingStepDataPointsFilters per iteration at
    #: ICP.cpp:373-379; the hostful stepped driver remains for the rest).
    SCHEDULE_TRACEABLE = False

    def init(self) -> None:
        """Reset per-registration state (reference: DataPointsFilter::init;
        only schedule-carrying filters like FixStepSampling use it)."""

    def mask_at_iteration(self, cloud: PointCloud, iteration) -> PointCloud:
        """Traced per-iteration form (see SCHEDULE_TRACEABLE): the cloud
        this filter would pass to iteration ``iteration`` (a traced int32),
        expressed as a mask shrink — shapes must stay static."""
        raise NotImplementedError

    def filter(self, cloud: PointCloud, key: Optional[jax.Array] = None) -> PointCloud:
        raise NotImplementedError

    # ---- host-prep protocol (see HOST_PREP) --------------------------------
    def prepare_host(self, pts_h, mask_h):
        """Derive data-dependent structure from padded host rows (numpy).
        Only meaningful when HOST_PREP or TRACEABLE."""
        return None

    def filter_traced(self, cloud: PointCloud, aux,
                      key: Optional[jax.Array] = None) -> PointCloud:
        """Jit-safe application given :meth:`prepare_host`'s aux."""
        return self.filter(cloud, key=key)

    def survivor_bound(self, n_valid: int, aux) -> int:
        """Upper bound on points surviving this filter given aux (used to
        size static compaction caps); the safe default is no reduction."""
        return n_valid


def apply_filter_chain(
    filters: Sequence[DataPointsFilter],
    cloud: PointCloud,
    key: Optional[jax.Array] = None,
    compact: bool = True,
) -> PointCloud:
    """Apply filters sequentially (reference: DataPointsFilter.cpp:106-131)."""
    before = None
    for i, f in enumerate(filters):
        sub = jax.random.fold_in(key, i) if key is not None else None
        cloud = f.filter(cloud, key=sub)
        if compact:
            cloud = cloud.compact()  # one scalar host sync per filter
        after = cloud.count_host()
        log_info(
            f"Applied {type(f).__name__} - {after} points remaining"
            + (f" (of {before})" if before is not None else "")
        )
        before = after
        if after == 0:
            raise ConvergenceError(
                f"no points remaining after filter {type(f).__name__}"
            )
    return cloud


def chain_is_traceable(filters: Sequence[DataPointsFilter]) -> bool:
    return all(getattr(f, "TRACEABLE", False) for f in filters)


def apply_filter_chain_traced(
    filters: Sequence[DataPointsFilter],
    cloud: PointCloud,
    key: Optional[jax.Array] = None,
) -> PointCloud:
    """Jit-safe filter chain: same sequence and per-filter key derivation as
    :func:`apply_filter_chain`, minus the host-side parts (compaction,
    point-count logging, the empty-cloud ``ConvergenceError`` — an emptied
    cloud surfaces as the engine's no-inliers code instead). Only valid when
    ``chain_is_traceable(filters)``."""
    for i, f in enumerate(filters):
        sub = jax.random.fold_in(key, i) if key is not None else None
        cloud = f.filter(cloud, key=sub)
    return cloud
