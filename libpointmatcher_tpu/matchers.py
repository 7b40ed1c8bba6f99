"""Matchers: associate each reading point with its nearest reference points.

Capability parity with the reference matcher layer
(reference: PointMatcher.h:470-494, MatchersImpl.{h,cpp}):

- ``NullMatcher``            — empty matches (MatchersImpl.cpp:40-52)
- ``KDTreeMatcher``          — the reference wraps a libnabo kd-tree; here the
  same name (so reference YAML runs unchanged) is served by the exact tiled
  brute-force sweep in :mod:`..ops.knn`, which is how nearest-neighbor search
  maps to the TPU. ``searchType``/``epsilon`` are accepted for config parity;
  search is always exact.

``epsilon`` semantics note (reference: MatchersImpl.h:85, libnabo's
approximate-search knob: return a neighbor within (1+ε) of the true NN).
On TPU the exact dense sweep IS the fast path at registration densities —
there is nothing for ε to trade away (the sweep inspects every pair
regardless; an ε-early-exit has no vector-unit analogue). The reference's
actual use of ε is bounding work on big clouds; this framework's equivalent
knob is :class:`BlockGridMatcher`'s bounded search radius (``maxDist`` +
``motionBound``), which bounds work geometrically while staying EXACT
within the radius — strictly stronger than ε's (1+ε)-approximate contract.
Measured crossover: tools/large_knn_bench.py (dense exact vs tile sweep at
10^5–10^6 points; numbers in ROADMAP.md).
- ``KDTreeVarDistMatcher``   — per-point match radius from a named descriptor
  (MatchersImpl.cpp:132-150).

Matches layout is row-major ``[N, knn]`` (reference uses [knn, N]): N is the
XLA-sharded axis and knn the minor, lane-friendly axis. Invalid entries carry
dist=+inf, id=-1 (reference: PointMatcher.h:377-378).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from .cloud import PointCloud
from .ops.dispatch import knn_search
from .ops.knn import knn_brute_force
from .registry import Param, Parametrizable, Registrar

__all__ = [
    "Matches",
    "Matcher",
    "NullMatcher",
    "KDTreeMatcher",
    "KDTreeVarDistMatcher",
    "BlockGridMatcher",
    "MatcherRegistrar",
]


class Matches(NamedTuple):
    """kNN result: squared distances and reference ids, both [N, knn]."""

    dists: jnp.ndarray  # [N, knn] float32, squared distances, +inf = invalid
    ids: jnp.ndarray  # [N, knn] int32, -1 = invalid

    @property
    def knn(self) -> int:
        return self.dists.shape[1]


class Matcher(Parametrizable):
    """Interface (reference: PointMatcher.h:470-494)."""

    def __init__(self, params=None):
        super().__init__(params)
        self._reference: Optional[PointCloud] = None
        self.visit_count = 0

    def init(self, reference: PointCloud) -> None:
        """Build acceleration state for a (filtered) reference cloud."""
        self._reference = reference

    def find_closests(self, reading: PointCloud) -> Matches:
        """Match against the reference set by :meth:`init`."""
        assert self._reference is not None, "matcher not initialized"
        return self.find_closests_in(reading, self._reference)

    def find_closests_in(self, reading: PointCloud, reference: PointCloud) -> Matches:
        """Pure form: match ``reading`` against an explicit ``reference``.

        The ICP engine calls this inside its traced step with the reference
        as a loop argument — never via ``init``'s stored state, which under
        jit would be baked into the program as a constant (bloating the
        executable and going stale if the same chain is reused with a new
        reference of identical shape)."""
        raise NotImplementedError

    def prepare_loop(self, reading: PointCloud):
        """Optional host-side per-registration setup (called by the ICP
        engine once per registration, with the reading at its *initial*
        pose, before the fused loop is entered). Returns an aux pytree of
        arrays threaded into :meth:`find_closests_in` as ``aux=``, or
        ``None`` (the default) when the matcher needs no loop-scoped state.

        This is the tpu analogue of a per-registration acceleration
        structure build: shapes derived here stay static for the whole
        ``lax.while_loop``."""
        return None

    def prepare_loop_host(self, pts, mask):
        """Numpy-level :meth:`prepare_loop` for batch serving: given host
        positions/mask of one (pre-transformed) scan, return
        ``(per_scan_aux, shared_aux)`` dicts of arrays — per-scan entries
        are stacked/vmapped over the batch axis, shared entries (the
        reference acceleration structure) are broadcast — or ``None`` when
        the matcher needs no loop state. Default: no loop state."""
        return None

    def invalidate_loop_state(self):
        """Engine hook for drivers that do NOT call :meth:`prepare_loop`
        (the stepped driver): drop any per-registration search state a
        previous registration left behind. Default: nothing to drop."""

    def serving_loop_aux(self, reference) -> bool:
        """Called once per serving batch with the prefiltered internal map:
        True routes serving through the aux path (per-scan
        :meth:`prepare_loop_host` state threaded into the vmapped loop).
        Default: any matcher that overrides ``prepare_loop_host``. Matchers
        with map-derived acceleration state may build/cache it here."""
        return type(self).prepare_loop_host is not Matcher.prepare_loop_host

    #: True when serving prep must apply the per-scan aux ``qorder`` row
    #: permutation (and may then compact) before entering the loop
    SERVING_PERMUTES_READING = False

    def serving_reference(self, reference):
        """The reference cloud the serving loop should run against (hook
        for matchers that re-lay the map out, e.g. the Morton-sorted copy
        of the skip path — row order is meaningless to the engine)."""
        return reference

    # Parity with the reference's touch statistics (MatchersImpl.cpp:86-101):
    # each matcher reports how many (query, candidate) pairs one call
    # actually inspects; the engine accumulates it per iteration into
    # ``visit_count`` (surfaced as the PointCountTouched stat). The dense
    # sweep inspects every (valid reading, valid reference) pair; culling
    # matchers report their real candidate counts (see overrides).
    def touched_per_iteration(self, reading: PointCloud,
                              reference: PointCloud) -> int:
        return reading.count_host() * reference.count_host()

    def get_visit_count(self) -> int:
        return self.visit_count

    def reset_visit_count(self) -> None:
        self.visit_count = 0


MatcherRegistrar = Registrar("Matcher")


@MatcherRegistrar.register
class NullMatcher(Matcher):
    """Does nothing, returns no valid matches (reference: MatchersImpl.cpp:40-52)."""

    def find_closests_in(self, reading: PointCloud, reference: PointCloud) -> Matches:
        n = reading.num_points
        return Matches(
            jnp.full((n, 1), jnp.inf, jnp.float32),
            jnp.full((n, 1), -1, jnp.int32),
        )

    def touched_per_iteration(self, reading, reference) -> int:
        return 0


@MatcherRegistrar.register
class KDTreeMatcher(Matcher):
    """Exact kNN matcher (reference: MatchersImpl.h:69-120 wraps libnabo;
    here: MXU-tiled brute force, see module docstring)."""

    PARAMS = (
        Param("knn", "number of nearest neighbors to consider", int, 1, min=1),
        Param("epsilon", "approximation to use for the nearest-neighbor "
              "search: values >= 1e-5 opt into the MXU matmul-form kernel "
              "on TPU, whose only deviation is mis-ranking ~1e-6-relative "
              "distance ties — within the reference's (1+epsilon) "
              "contract above that floor, at ~2x throughput; values in "
              "[0, 1e-5) run the exact sweep (the magnitude is otherwise "
              "unused: the sweep inspects every candidate either way, so "
              "there is no work-vs-accuracy dial beyond the kernel "
              "choice; see ops/dispatch.knn_search)",
              float, 0.0, min=0.0),
        Param("searchType", "kd-tree search strategy in the reference "
              "(ignored: search is a tiled sweep)", int, 1, min=0, max=2),
        Param("maxDist", "maximum distance to consider for neighbors",
              float, "inf", min=0.0),
    )

    #: queries per skip tile (spatially coherent Morton groups; the
    #: per-tile NN upper bound is a max over the tile, so smaller tiles
    #: skip more — measured in tools/skip_sim.py)
    SKIP_TILE_Q = 256
    #: 128-lane chunks per skip decision (one conditional + one scratch
    #: round trip per super-chunk; finer granularity skips more chunks but
    #: pays per-chunk predication — measured slower than dense at 1)
    SKIP_GROUP = 4

    def __init__(self, params=None):
        super().__init__(params)
        self._skip_shared = None
        self._skip_for = None  # the map the tables were built for
        self._skip_sorted_ref = None
        self._skip_stream = False
        self.cache_token = None

    def find_closests_in(self, reading: PointCloud, ref: PointCloud,
                         aux=None) -> Matches:
        dists, ids = knn_search(
            reading.points, reading.mask, ref.points, ref.mask, k=self.knn,
            epsilon=float(self.epsilon),
        )
        return self._apply_max_dist(Matches(dists, ids))

    def _apply_max_dist(self, m: Matches) -> Matches:
        if self.maxDist == float("inf"):
            return m
        keep = m.dists <= jnp.float32(self.maxDist) ** 2
        return Matches(
            jnp.where(keep, m.dists, jnp.inf), jnp.where(keep, m.ids, -1)
        )

    # ---- bbox-pruned serving path (ops/knn_skip.py): the dense sweep is
    # VPU-issue-bound, so serving throughput comes from touching fewer
    # (query, candidate) cells. Exact: skipped chunks provably contain no
    # query's true nearest neighbor (the reference kd-tree at epsilon 0 is
    # exact too, MatchersImpl.cpp:86-101). The WHOLE serving loop runs in
    # Morton-sorted space — reading rows permuted once in prep, the loop's
    # reference replaced by a once-sorted copy (row order is meaningless to
    # the engine: every consumer is a masked row-wise reduction) — so the
    # per-iteration step does ZERO row gathers beyond the dense path's own
    # pair gather (a sorted-space id indexes the sorted reference
    # directly). The measured first cut of this path kept original row
    # order and paid five ~25k-row gathers per iteration (qorder/qinv
    # reorders, prev-winner position fetch, rorder id translation): 2.4x
    # SLOWER than the dense fused path despite a 63% chunk-skip rate.
    #: resident-map row count above which the survivor-list sweep
    #: (ops/knn_sweep2) serves by default: fixed-budget serving measured
    #: PARITY with the dense kernel at the 12.5k-row car map (314.6 vs
    #: 320.9 ms/batch — per-grid-step and scalar-loop overheads cancel the
    #: pruned cells at 196 chunks; ROADMAP round-4 accounting), and the
    #: pruning fraction grows with chunk count while the overheads stay
    #: fixed. PMTPU_SERVE_SKIP=1/0 forces the path on/off for A/B.
    SKIP_AUTO_MIN_MAP = 16384
    #: largest padded map served by the survivor sweep at all — above
    #: VMEM residency (knn_skip.SKIP_MAX_MPAD) the streaming variant
    #: DMAs surviving chunks from HBM, up to this cap (SMEM flag-table
    #: budget); beyond it, BlockGridMatcher's tile sweep is the tool
    STREAM_MAX_MPAD = 131072

    def serving_loop_aux(self, reference) -> bool:
        import os

        mode = os.environ.get("PMTPU_SERVE_SKIP", "auto")
        if mode == "0":
            self._skip_shared = None
            return False
        # knn 2..4 runs the exact top-k survivor sweep, but only under an
        # EXPLICIT PMTPU_SERVE_SKIP=1 (no committed perf A/B yet — the
        # auto default stays measured-knn==1-only); knn > 4 and the MXU
        # epsilon opt-in always fall back to the dense path
        if (mode not in ("1", "auto")
                or (mode == "auto"
                    and (reference.num_points < self.SKIP_AUTO_MIN_MAP
                         or self.knn != 1))
                or self.knn > 4
                or float(self.epsilon) >= 1e-5  # MXU kernel opt-in wins
                or not _use_pallas()):
            self._skip_shared = None
            return False
        try:
            # map-sharded serving: the resident-map kernel (and the
            # sorted-copy substitution) would silently replicate a map the
            # caller laid out across the mesh — leave that path dense.
            # The chunk-axis-sharded sweep op EXISTS
            # (parallel/sharding.sharded_nn1_sorted_v2 + mesh parity
            # test; it multiplies the resident window by the mesh size),
            # but wiring it into serving is deferred until multi-chip
            # hardware can validate the end-to-end path — this
            # environment has one chip (virtual CPU meshes cannot run
            # the Pallas kernels outside interpret mode).
            if len(reference.points.devices()) > 1:
                self._skip_shared = None
                return False
        except Exception:
            pass
        if (self._skip_shared is not None
                and self._skip_for is reference):
            return True
        from .ops.knn_skip import (
            SKIP_MAX_MPAD, chunk_bboxes, morton_argsort,
        )
        import jax
        import numpy as np

        pts, mask = jax.device_get((reference.points, reference.mask))
        pts = np.asarray(pts, np.float32)
        mask = np.asarray(mask, bool)
        m, d = pts.shape
        m_pad = -(-m // 128) * 128
        stream_ok = (
            os.environ.get("PMTPU_SERVE_STREAM", "auto") != "0"
            and m_pad <= self.STREAM_MAX_MPAD
        )
        if (m_pad > SKIP_MAX_MPAD and not stream_ok) or d > 3:
            self._skip_shared = None
            return False
        if self.knn > 1 and m_pad > SKIP_MAX_MPAD:
            # top-k sweep is resident-only (the streaming variant is 1-NN)
            self._skip_shared = None
            return False
        # above VMEM residency the sweep streams surviving chunks from
        # HBM (ops/knn_sweep2.nn1_survivor_sweep_stream) — DEFAULT-ON
        # within (SKIP_MAX_MPAD, STREAM_MAX_MPAD] since the round-5 chip
        # A/B: at the 1e5-row terrain map it serves 16.3 reg/s vs the
        # dense sweep's 7.6 (2.15x) with exact matches (LARGE_r05.json;
        # compile 35 s through the relay, persistent-cached).
        # PMTPU_SERVE_STREAM=0 forces it off, =1 forces it on.
        # Beyond STREAM_MAX_MPAD the SMEM flag table and the O(nch)
        # scalar survivor scan per tile stop paying — BlockGridMatcher's
        # tile sweep is the tool there.
        self._skip_stream = m_pad > SKIP_MAX_MPAD
        rorder, _ = morton_argsort(pts, mask)
        rs = pts[rorder]
        rmask = mask[rorder]
        from .ops.knn_skip import augmented_ref_table
        from .ops.knn_sweep2 import chunk_summaries, chunked_ref_table

        # survivor-list sweep tables (ops/knn_sweep2 — the default
        # serving path)
        self._skip_shared = {
            "skip_rt3": jnp.asarray(chunked_ref_table(rs, rmask)),
            "skip_ct": jnp.asarray(chunk_summaries(rs, rmask)),
        }
        if not self._skip_stream:
            # v1 predicated-kernel + MXU-bound tables (opt-in A/B paths:
            # PMTPU_SKIP_V1=1 / PMTPU_SKIP_MXU_BOUND=1); their kernels
            # require VMEM residency, so streaming maps skip them
            rt = np.zeros((8, m_pad), np.float32)
            rt[:d, :m] = rs.T
            rpen = np.full((1, m_pad), np.inf, np.float32)
            rpen[0, :m] = np.where(rmask, 0.0, np.inf)
            ra, _ = augmented_ref_table(rs, rmask, m_pad)
            self._skip_shared.update({
                "skip_rt": jnp.asarray(rt),
                "skip_rpen": jnp.asarray(rpen),
                "skip_cbox": jnp.asarray(
                    chunk_bboxes(rs, rmask, chunk=128 * self.SKIP_GROUP)
                ),
                "skip_ra": jnp.asarray(ra),
            })
        # the loop's reference: the same cloud with every row-aligned
        # field in Morton order, so sorted-space match ids need no
        # translation (built once per map, like the tables)
        self._skip_sorted_ref = reference.permute_rows(
            jnp.asarray(rorder))
        # strong ref: the sequence holds its map for its own lifetime
        # anyway (PointCloud is a pytree NamedTuple — not weakref-able)
        self._skip_for = reference
        KDTreeMatcher._skip_counter = (
            getattr(KDTreeMatcher, "_skip_counter", 0) + 1
        )
        self.cache_token = KDTreeMatcher._skip_counter
        return True

    def serving_reference(self, reference):
        """The reference cloud the serving loop should run against: the
        Morton-sorted copy when the skip path is active."""
        if self._skip_shared is None or self._skip_for is not reference:
            return reference
        return self._skip_sorted_ref

    SERVING_PERMUTES_READING = True  # prep applies per-scan aux "qorder"
    #: serving computes the Morton order in-program
    #: (ops/knn_skip.morton_argsort_device) — no per-batch host prep;
    #: PMTPU_SKIP_HOST_MORTON=1 forces the host LUT path for A/B
    SERVING_DEVICE_ORDER = True

    def prepare_loop_host(self, pts, mask):
        if self._skip_shared is None:
            return None
        from .ops.knn_skip import morton_argsort

        qorder, _ = morton_argsort(pts, mask)
        return ({"qorder": jnp.asarray(qorder)}, dict(self._skip_shared))

    def prepare_loop_host_batch(self, pts_b, mask_b):
        """Batched :meth:`prepare_loop_host`: one bit-interleave pass over
        the whole scan batch (per-scan sequential Morton cost measured at
        ~9 ms/scan on 25k points — a third of the serving budget)."""
        if self._skip_shared is None:
            return None
        from .ops.knn_skip import morton_argsort_batch

        orders = morton_argsort_batch(pts_b, mask_b)
        return ({"qorder": jnp.asarray(orders)}, dict(self._skip_shared))

    def loop_state_init(self, reading: PointCloud, aux):
        """Per-registration matcher loop state: each query's position at
        the previous sweep and its squared distance to the winner found
        there (+inf = no sweep yet; iteration 0 sweeps everything)."""
        return (
            reading.points,
            jnp.full((reading.num_points,), jnp.inf, jnp.float32),
        )

    def find_closests_in_stateful(self, reading: PointCloud,
                                  ref: PointCloud, aux, state):
        """Exact 1-NN through the bbox-pruned sweep; returns
        ``(Matches, new_state)``. ``reading`` is already Morton-sorted
        (serving prep applied the per-scan ``qorder`` once) and ``ref`` is
        the sorted reference, so ids pass through untranslated. The upper
        bound per query is triangle-inequality-transported from the
        previous sweep: d(q_now, w_prev) ≤ d(q_prev, w_prev) +
        ‖q_now − q_prev‖, where w_prev is a REAL map point — so the bound
        (and with it every skip decision) is valid unconditionally, with
        no motion-bound assumption and no winner-position gather."""
        from .ops.knn_skip import (
            approx_min_sorted, augment_queries, bound_margin,
            build_skip_mask, nn1_sorted_skip,
        )

        qs = reading.points
        qm = reading.mask
        prev_pos, prev_d2 = state
        step = jnp.sqrt(jnp.sum((qs - prev_pos) ** 2, axis=-1))
        import os as _os2

        if ("skip_rt3" in aux
                and (self.knn > 1  # v1 kernels are 1-NN only
                     or _os2.environ.get("PMTPU_SKIP_V1", "0") != "1"
                     or "skip_rt" not in aux)):
            # survivor-list sweep (ops/knn_sweep2): per-query bbox/ball
            # bounds and a dynamic loop over surviving 128-row chunks —
            # no per-chunk branches, no XLA mask stage. The transported
            # bound rides in as a DISTANCE, inflated 4 ulps for its own
            # sqrt/add roundings.
            ub_t = (jnp.sqrt(prev_d2) + step) * (1.0 + 4e-7)
            if self.knn > 1:
                # exact top-k (k <= 4): the k previous winners are real
                # points within sqrt(prev_dk) of q_prev, so q_now has
                # >= k real points within the transported radius —
                # d_k(now) is bounded by it
                from .ops.knn_sweep2 import nnk_sorted_v2

                dk, ik, _ = nnk_sorted_v2(
                    qs, qm, ub_t, aux["skip_rt3"], aux["skip_ct"],
                    k=int(self.knn),
                )
                new_state = (qs, dk[:, -1])
                return self._apply_max_dist(Matches(dk, ik)), new_state
            from .ops.knn_sweep2 import nn1_sorted_v2

            d_s, i_s, _ = nn1_sorted_v2(
                qs, qm, ub_t, aux["skip_rt3"], aux["skip_ct"],
                stream=self._skip_stream,
            )
            new_state = (qs, d_s)
            matches = Matches(d_s[:, None], i_s[:, None])
            return self._apply_max_dist(matches), new_state

        ub = jnp.sqrt(prev_d2) + step          # inf-safe: inf + x = inf
        # the sqrt/add/square chain adds three f32 roundings that can land
        # strictly BELOW the exact d(q_now, w_prev)^2 (fl(fl(sqrt(d2))^2)
        # < d2 about half the time); inflate by a few ulps so the bound
        # over-estimates — any over-estimate is still a valid bound, so
        # the skip mask's exactness contract survives rounding
        ub2 = (ub * ub) * (1.0 + 4e-7)
        import os as _os

        if "skip_ra" in aux and _os.environ.get(
                "PMTPU_SKIP_MXU_BOUND", "0") == "1":
            # MXU bound pass (ops/knn_skip module comment): a tight
            # per-query upper bound every iteration, live from iteration 0
            # — but OPT-IN: measured 6.7 ms/scan/iteration on chip (the
            # K=8 HIGHEST dot runs at ~6% MXU utilization), 2.1x the exact
            # dense kernel it is meant to shortcut
            # (tools/bound_kernel_micro.py)
            n = qs.shape[0]
            n_pad = -(-n // self.SKIP_TILE_Q) * self.SKIP_TILE_Q
            qa, q2 = augment_queries(qs, n_pad)
            amin = approx_min_sorted(qa, aux["skip_ra"])[:n]
            ub2_mxu = amin + bound_margin(q2, amin)
            ub2 = jnp.minimum(ub2, ub2_mxu)
        skip = build_skip_mask(qs, qm, ub2, aux["skip_cbox"],
                               self.SKIP_TILE_Q)
        d_s, i_s = nn1_sorted_skip(
            qs, qm, aux["skip_rt"], aux["skip_rpen"], skip,
            tile_q=self.SKIP_TILE_Q, group=self.SKIP_GROUP,
        )
        # pre-maxDist winners stay valid bound candidates; invalid rows
        # carry +inf → their tiles keep skipping everything
        new_state = (qs, d_s)
        matches = Matches(d_s[:, None], i_s[:, None])
        return self._apply_max_dist(matches), new_state


def _use_pallas() -> bool:
    from .ops.dispatch import use_pallas

    return use_pallas()


@MatcherRegistrar.register
class CellGridMatcher(Matcher):
    """Bounded-radius kNN via a cell list — the large-cloud matcher
    (extension beyond the reference registry; see ops/cellgrid.py).

    Requires a finite ``maxDist``: correctness within the radius is exact,
    points with no reference neighbor inside it get (+inf, -1) — the same
    contract as KDTreeMatcher with maxDist. Use when clouds are big enough
    (≳10⁵ after filtering) that the dense sweep's O(N·M) loses to culling."""

    PARAMS = (
        Param("knn", "number of nearest neighbors to consider", int, 1, min=1),
        Param("maxDist", "maximum distance to consider for neighbors "
              "(required finite; also the cell edge length)", float, 1.0,
              min=0.0000001),
    )

    _init_counter = 0

    def __init__(self, params=None):
        super().__init__(params)
        self._grid = None
        self._grid_shape = None
        self.cache_token = None

    def init(self, reference: PointCloud) -> None:
        from .ops.cellgrid import build_cell_grid

        super().init(reference)
        import jax

        host = jax.device_get((reference.points, reference.mask))
        self._grid = build_cell_grid(host[0], host[1], float(self.maxDist))
        self._grid_shape = tuple(reference.points.shape)
        # host mirror of the cell occupancy for the touch statistic
        # (reference: MatchersImpl.cpp:86-101)
        import numpy as np

        pts = np.asarray(host[0], np.float64)
        valid = np.asarray(host[1], bool)
        vp = pts[valid] if valid.any() else np.zeros((1, pts.shape[1]))
        origin = vp.min(axis=0)
        coords = np.floor((vp - origin) / float(self.maxDist)).astype(np.int64)
        dims = coords.max(axis=0) + 1
        lin = coords[:, 0].copy()
        stride = int(dims[0])
        for a in range(1, pts.shape[1]):
            lin += coords[:, a] * stride
            stride *= int(dims[a])
        ulins, counts = np.unique(lin, return_counts=True)
        self._host_cells = (origin, dims, ulins, counts)
        # the grid arrays are closed over (baked into traced programs as
        # constants); bump the token so engine jit-cache keys change per init
        CellGridMatcher._init_counter += 1
        self.cache_token = CellGridMatcher._init_counter

    def find_closests_in(self, reading: PointCloud, ref: PointCloud) -> Matches:
        # Inside the jitted loop ``ref`` is a tracer, so the engine contract
        # (init(reference) then the loop passes that same reference) is
        # checked by shape: the grid's order array indexes rows of ``ref``.
        if self._grid is None or tuple(ref.points.shape) != self._grid_shape:
            # pure fallback for callers that pass a different reference
            dists, ids = knn_brute_force(
                reading.points, reading.mask, ref.points, ref.mask, k=self.knn
            )
            keep = dists <= jnp.float32(self.maxDist) ** 2
            return Matches(
                jnp.where(keep, dists, jnp.inf), jnp.where(keep, ids, -1)
            )
        from .ops.cellgrid import cell_knn

        dists, ids = cell_knn(
            reading.points, reading.mask, ref.points, self._grid,
            float(self.maxDist), k=self.knn,
        )
        return Matches(dists, ids)

    def touched_per_iteration(self, reading, reference) -> int:
        """Candidate pairs swept per call: each valid query inspects the
        occupancy of its 3^d cell neighborhood, evaluated at the reading's
        current host snapshot (loop-start positions in the fused engine —
        cells drift by at most the ICP correction across iterations)."""
        if getattr(self, "_host_cells", None) is None:
            return super().touched_per_iteration(reading, reference)
        import numpy as np
        import jax as _jax

        origin, dims, ulins, counts = self._host_cells
        pts, mask = _jax.device_get((reading.points, reading.mask))
        q = np.asarray(pts, np.float64)[np.asarray(mask, bool)]
        if len(q) == 0:
            return 0
        d = q.shape[1]
        qc = np.floor((q - origin) / float(self.maxDist)).astype(np.int64)
        offs = np.stack(
            np.meshgrid(*([[-1, 0, 1]] * d), indexing="ij"), axis=-1
        ).reshape(-1, d)
        nc = qc[:, None, :] + offs[None, :, :]            # [N, 3^d, d]
        in_grid = np.all((nc >= 0) & (nc < dims), axis=-1)
        lin = nc[..., 0].copy()
        stride = int(dims[0])
        for a in range(1, d):
            lin += nc[..., a] * stride
            stride *= int(dims[a])
        pos = np.clip(np.searchsorted(ulins, lin), 0, max(len(ulins) - 1, 0))
        hit = in_grid & (len(ulins) > 0) & (ulins[pos] == lin)
        return int(np.where(hit, counts[pos], 0).sum())


def tile_aux_to_device(per_scan, shared):
    """Convert :meth:`BlockGridMatcher.prepare_loop_host`'s HOST-form aux
    into the traced form :meth:`BlockGridMatcher.find_closests_in`
    consumes: gather the loop-static candidate tables from the resident
    sub-block tables. Works eagerly (one dispatch — the one-shot engine
    path) and under trace (the serving runners call it INSIDE their jitted
    programs, so a batch/queue of scans costs zero per-scan dispatches)."""
    from .ops.tilesweep import _gather_candidates

    cand_t, pen, cid = _gather_candidates(
        shared["sub_units"], jnp.asarray(per_scan["blocks"])
    )
    return {
        "q_rows": jnp.asarray(per_scan["q_rows"]),
        "cand_t": cand_t, "pen": pen, "cid": cid,
        "parent": jnp.asarray(per_scan["parent"]),
        "vrows": jnp.asarray(per_scan["vrows"]),
    }


@MatcherRegistrar.register
class BlockGridMatcher(Matcher):
    """Bounded-radius k-NN (k ≤ 16) via the tile sweep — the large-cloud /
    serving matcher built for the fused loop (extension beyond the
    reference registry; see ops/tilesweep.py for the design and
    ops/cellblocks.py for the earlier per-cell-padded variant it
    supersedes). knn is a free parameter like the reference matcher
    contract (MatchersImpl.h:69-120); k = 1 runs the running-min kernel,
    k > 1 the running-top-k kernel at ~k× the per-cell cost.

    Unlike :class:`CellGridMatcher` (per-point neighbor gathers, measured
    random-gather-bound on TPU), this matcher does dense tile sweeps with
    shapes fixed per registration: the reference is cell-sorted into
    8-row sub-blocks at ``init`` and queries are tiled once at loop start
    via the engine's :meth:`prepare_loop` hook. Exactness across the
    moving loop relies on the cell edge being ``maxDist + motionBound``:
    as long as no point moves farther than ``motionBound`` from its
    initial pose during the registration, the 3^d neighborhood always
    covers the true ``maxDist`` ball. Set ``motionBound`` to an upper
    bound on the expected ICP correction (prior error), e.g. the
    BoundTransformationChecker budget. Points with no neighbor inside
    ``maxDist`` get (+inf, -1) — the same contract as ``KDTreeMatcher``
    with ``maxDist`` (reference: MatchersImpl.cpp:78-150).
    """

    PARAMS = (
        Param("knn", "number of nearest neighbors to consider (the tile "
              "sweep serves k<=32 fused; per-iteration cost grows ~k)",
              int, 1, min=1, max=32),
        Param("maxDist", "maximum distance to consider for neighbors "
              "(required finite)", float, 1.0, min=0.0000001),
        Param("motionBound", "upper bound on how far any reading point "
              "moves during one registration (cell edge = maxDist + "
              "motionBound)", float, 1.0, min=0.0),
        Param("tileQueries", "queries per sweep tile (spatially coherent "
              "Morton groups; smaller tiles shrink candidate unions, "
              "larger tiles amortize per-step issue overhead)",
              int, 256, min=8),
        Param("blockCap", "candidate rows per virtual tile: tiles whose "
              "candidate union exceeds this are split, bounding the "
              "padded sweep at ceil(union/cap)*cap instead of the global "
              "max union (see ops/tilesweep.py)", int, 1024, min=128),
    )

    _init_counter = 0

    def __init__(self, params=None):
        super().__init__(params)
        self._blocks = None
        self._ref_shape = None
        self.cache_token = None
        self._loop_touched = None

    @property
    def _cell_size(self) -> float:
        return float(self.maxDist) + float(self.motionBound)

    def init(self, reference: PointCloud) -> None:
        from .ops.tilesweep import build_sub_blocks

        super().init(reference)
        import jax

        pts, mask = jax.device_get((reference.points, reference.mask))
        self._blocks = build_sub_blocks(pts, mask, self._cell_size)
        self._ref_shape = tuple(reference.points.shape)
        BlockGridMatcher._init_counter += 1
        self.cache_token = BlockGridMatcher._init_counter

    def prepare_loop(self, reading: PointCloud):
        self._loop_touched = None
        if self._blocks is None:
            return None
        import jax

        pts, mask = jax.device_get((reading.points, reading.mask))
        out = self.prepare_loop_host(pts, mask)
        if out is None:
            return None
        per_scan, shared = out
        # one-shot engine path: convert to the traced form here (one
        # eager gather dispatch — amortized over the whole registration)
        return tile_aux_to_device(per_scan, shared)

    def prepare_loop_host(self, pts, mask, pad_tiles_to=0, pad_blocks_to=0):
        """Host-side per-registration tile assignment.

        Returns ``(per_scan, shared)`` in HOST form: ``per_scan`` holds
        numpy ``q_rows``/``blocks``/``parent``/``vrows`` (the batch and
        queue drivers pad + stack many scans host-side and ship ONE
        device transfer), ``shared`` holds the device-resident sub-block
        tables. The candidate tables are gathered IN-PROGRAM by the
        serving runners (:func:`tile_aux_to_device` under trace) — the
        former per-scan eager ``gather_candidates`` dispatches measured
        ~250 ms/batch of relay overhead at the 4e5-map serving shape
        (tools/tile_phase_profile.py, round 5)."""
        if self._blocks is None:
            return None
        from .ops.tilesweep import assign_tiles

        ta = assign_tiles(pts, mask, self._blocks,
                          tile_q=int(self.tileQueries),
                          pad_tiles_to=pad_tiles_to,
                          pad_blocks_to=pad_blocks_to,
                          block_cap=int(self.blockCap),
                          to_device=False)
        # actual candidate pairs this assignment sweeps per iteration — the
        # whole point of the tile sweep is touching fewer pairs than N·M,
        # and the stat must say so (reference: MatchersImpl.cpp:86-101)
        self._loop_touched = ta.touched
        return (
            {"q_rows": ta.q_rows, "blocks": ta.blocks,
             "parent": ta.parent, "vrows": ta.vrows},
            {"sub_units": self._blocks.units},
        )

    def touched_per_iteration(self, reading, reference) -> int:
        if self._loop_touched is not None:
            return self._loop_touched
        # fallback paths use the dense sweep (see find_closests_in)
        return super().touched_per_iteration(reading, reference)

    def find_closests_in(self, reading: PointCloud, ref: PointCloud,
                         aux=None) -> Matches:
        if aux is not None and tuple(ref.points.shape) == self._ref_shape:
            # aux without "q_rows" means the serving runner permuted the
            # reading into TILE ORDER at prep (q-gather/scatter become
            # reshapes; see tile_nn1_from_candidates q_rows=None)
            q_rows = aux.get("q_rows")
            if self.knn > 1:
                from .ops.tilesweep import tile_knnk_from_candidates

                dk, ik = tile_knnk_from_candidates(
                    reading.points, reading.mask, q_rows,
                    aux["cand_t"], aux["pen"], aux["cid"],
                    float(self.maxDist), parent=aux["parent"],
                    vrows=aux["vrows"], k=int(self.knn),
                )
                return Matches(dk, ik)
            from .ops.tilesweep import tile_nn1_from_candidates

            d1, i1 = tile_nn1_from_candidates(
                reading.points, reading.mask, q_rows, aux["cand_t"],
                aux["pen"], aux["cid"], float(self.maxDist),
                parent=aux["parent"], vrows=aux["vrows"],
            )
            return Matches(d1[:, None], i1[:, None])
        # pure fallback (engine paths without prepare_loop: vmapped batch,
        # post-loop overlap estimation, direct calls)
        dists, ids = knn_brute_force(
            reading.points, reading.mask, ref.points, ref.mask, k=self.knn
        )
        keep = dists <= jnp.float32(self.maxDist) ** 2
        return Matches(
            jnp.where(keep, dists, jnp.inf), jnp.where(keep, ids, -1)
        )


@MatcherRegistrar.register
class KDTreeVarDistMatcher(Matcher):
    """kNN with a per-point maximum radius taken from a reading descriptor
    (reference: MatchersImpl.cpp:132-150).

    Large maps get the reference's kd-tree efficiency back through the
    cell grid: ``prepare_loop`` reads the per-point radii once per
    registration (they are loop-static — filters only run in prep),
    builds a cell structure on the host at the GLOBAL max radius, and the
    per-iteration search touches only candidate cells; each point's own
    tighter radius is applied as the exact post-mask, so results match
    the dense sweep bit for bit. Small maps keep the dense sweep (the
    grid build would cost more than it saves)."""

    #: map size below which the dense sweep beats grid build + culling
    CULL_MIN_MAP = 16384

    PARAMS = (
        Param("knn", "number of nearest neighbors to consider", int, 1, min=1),
        Param("epsilon", "approximation to use for the nearest-neighbor search "
              "(accepted for config parity; search here is always exact)",
              float, 0.0, min=0.0),
        Param("searchType", "kd-tree search strategy in the reference "
              "(ignored: search is a tiled exact sweep)", int, 1, min=0, max=2),
        Param("maxDistField", "descriptor name holding the per-point max "
              "search radius", str, "maxSearchDist"),
    )

    def __init__(self, params=None):
        super().__init__(params)
        self._ref_host = None
        self._vd_grid = None
        self._vd_rmax = None
        self._vd_ref_shape = None
        self.cache_token = None

    def init(self, reference: PointCloud) -> None:
        super().init(reference)
        import numpy as np
        import jax

        if reference.num_points >= self.CULL_MIN_MAP:
            pts, mask = jax.device_get(
                (reference.points, reference.mask))
            # same reference content re-inited (one-shot ICP calls init per
            # compute): keep the cached grid — a fresh one would bump
            # cache_token and recompile the fused loop for nothing
            if (self._ref_host is not None
                    and self._ref_host[0].shape == pts.shape
                    and np.array_equal(self._ref_host[0], pts)
                    and np.array_equal(self._ref_host[1], mask)):
                self._ref_shape_full = tuple(reference.points.shape)
                return
            self._ref_host = (np.asarray(pts), np.asarray(mask))
        else:
            self._ref_host = None
        self._ref_shape_full = tuple(reference.points.shape)
        self._vd_grid = None
        self._vd_rmax = None
        self._vd_ref_shape = None

    def prepare_loop(self, reading: PointCloud):
        """Host, once per registration: cell grid over the reference at
        the reading's max search radius, CLOSED OVER the matcher (the grid
        is a host structure of static arrays — it must never travel
        through the engine's traced aux pytree, whose entries are jit
        arguments; closing over, with a ``cache_token`` bump on change,
        is the same contract :class:`CellGridMatcher` uses). The build is
        cached per (reference, quantized rmax): rmax is rounded up on a
        1.25-geometric ladder, so scans with similar radii reuse one grid
        (and one compiled loop) instead of recompiling per registration.
        Returns None always — the culled search keys off matcher state
        inside :meth:`find_closests_in`."""
        if self._ref_host is None:
            self._drop_vd_grid()
            return None
        import math

        import numpy as np
        import jax

        try:
            radius = jax.device_get(
                reading.get_descriptor(self.maxDistField)[:, 0])
            mask = jax.device_get(reading.mask)
        except Exception:
            self._drop_vd_grid()
            return None
        rmax = float(np.max(np.where(np.asarray(mask), radius, 0.0),
                            initial=0.0))
        if not np.isfinite(rmax) or rmax <= 0.0:
            self._drop_vd_grid()
            return None
        # quantize UP on a 1.25 ladder: any cell edge >= the true max
        # radius keeps the 3^d-neighborhood search exact (each point's own
        # tighter radius is the post-mask), and a stable edge keeps the
        # jit-cache key stable across scans
        rq = 1.25 ** math.ceil(math.log(rmax, 1.25) - 1e-9)
        if self._vd_grid is not None and self._vd_rmax == rq:
            return None  # cached grid still valid; token unchanged
        from .ops.cellgrid import build_cell_grid

        self._vd_grid = build_cell_grid(
            self._ref_host[0], self._ref_host[1], rq
        )
        self._vd_rmax = rq
        self._vd_ref_shape = self._ref_shape_full
        KDTreeVarDistMatcher._vd_counter = (
            getattr(KDTreeVarDistMatcher, "_vd_counter", 0) + 1
        )
        self.cache_token = KDTreeVarDistMatcher._vd_counter
        return None

    def _drop_vd_grid(self):
        """Clear the culled grid AND bump the token: find_closests_in
        trusts matcher state under a shape-only check, so a compiled loop
        with the old grid closed over must never be reused once the
        intent is the dense sweep (round-5 review finding: the silent
        bail-outs left the stale program live)."""
        if self._vd_grid is not None:
            self._vd_grid = None
            self._vd_rmax = None
            self._vd_ref_shape = None
            KDTreeVarDistMatcher._vd_counter = (
                getattr(KDTreeVarDistMatcher, "_vd_counter", 0) + 1
            )
            self.cache_token = KDTreeVarDistMatcher._vd_counter

    def invalidate_loop_state(self):
        """Engine hook (stepped driver): prepare_loop is not called
        there, so stale per-registration search state from an earlier
        fused registration must be dropped — the stepped step would
        otherwise run the culled search with the previous reading's
        radii (silently missing matches beyond the old grid edge)."""
        self._drop_vd_grid()

    def find_closests_in(self, reading: PointCloud, ref: PointCloud,
                         aux=None) -> Matches:
        radius = reading.get_descriptor(self.maxDistField)[:, 0]
        if (self._vd_grid is not None
                and tuple(ref.points.shape) == self._vd_ref_shape):
            # engine contract check by shape, like CellGridMatcher: inside
            # the jitted loop ``ref`` is a tracer — the grid's row indices
            # address rows of the reference it was built for
            from .ops.cellgrid import cell_knn

            dists, ids = cell_knn(
                reading.points, reading.mask, ref.points, self._vd_grid,
                float(self._vd_rmax), k=self.knn,
            )
        else:
            dists, ids = knn_search(
                reading.points, reading.mask, ref.points, ref.mask,
                k=self.knn,
            )
        keep = dists <= (radius[:, None] ** 2)
        dists = jnp.where(keep, dists, jnp.inf)
        ids = jnp.where(keep, ids, -1)
        return Matches(dists, ids)
