"""Outlier filters: turn match distances into per-pair weights.

Capability parity with the reference outlier layer
(reference: PointMatcher.h:496-525, OutlierFiltersImpl.{h,cpp}). Interface:
``compute(reading, reference, matches, state) → (weights [N,knn], state)``.
Weight 0 rejects a pair; a chain multiplies weights element-wise
(reference: OutlierFilter.cpp:88-97); an empty chain still zeroes
infinite-distance pairs (reference: OutlierFilter.cpp:68-83).

All filters are pure jittable functions of the match tensors; the two
stateful ones (FixStep-style iteration schedules live in data filters; here
``RobustOutlierFilter``'s scale-estimator schedule) thread their state through
the ICP ``lax.while_loop`` instead of mutating members.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .cloud import PointCloud
from .errors import InvalidParameter
from .matchers import Matches
from .registry import Param, Parametrizable, Registrar
from .utils.masked import masked_mad, masked_median, masked_quantile, masked_std

__all__ = [
    "OutlierFilter",
    "OutlierFilterRegistrar",
    "compute_outlier_weights",
    "init_outlier_states",
]

OutlierFilterRegistrar = Registrar("OutlierFilter")


class OutlierFilter(Parametrizable):
    """Interface (reference: PointMatcher.h:496-525)."""

    def init_state(self):
        """Per-registration loop state pytree (most filters: none)."""
        return ()

    def compute(self, reading: PointCloud, reference: PointCloud, matches: Matches, state):
        raise NotImplementedError


def init_outlier_states(filters):
    return tuple(f.init_state() for f in filters)


def compute_outlier_weights(filters, reading, reference, matches, states):
    """Chain semantics (reference: OutlierFilter.cpp:63-97)."""
    if not filters:
        w = jnp.where(jnp.isfinite(matches.dists), 1.0, 0.0)
        return w, states
    w = jnp.ones_like(matches.dists)
    new_states = []
    for f, s in zip(filters, states):
        wi, s2 = f.compute(reading, reference, matches, s)
        w = w * wi
        new_states.append(s2)
    return w, tuple(new_states)


@OutlierFilterRegistrar.register
class NullOutlierFilter(OutlierFilter):
    """Accepts all matches (reference: OutlierFiltersImpl.cpp:52-59)."""

    def compute(self, reading, reference, matches, state):
        return jnp.ones_like(matches.dists), state


@OutlierFilterRegistrar.register
class MaxDistOutlierFilter(OutlierFilter):
    """Rejects pairs farther than maxDist (reference: OutlierFiltersImpl.cpp:66-81)."""

    PARAMS = (
        Param("maxDist", "maximum distance beyond which matches are rejected",
              float, 1.0, min=0.0),
    )

    def compute(self, reading, reference, matches, state):
        limit = jnp.float32(self.maxDist) ** 2
        return (matches.dists <= limit).astype(jnp.float32), state


@OutlierFilterRegistrar.register
class MinDistOutlierFilter(OutlierFilter):
    """Rejects pairs closer than minDist (reference: OutlierFiltersImpl.cpp:87-101).

    Note the reference semantics: an infinite (invalid) distance satisfies
    ``dist >= minDist`` and gets weight 1 here; the minimizer is what finally
    drops invalid pairs."""

    PARAMS = (
        Param("minDist", "minimum distance below which matches are rejected",
              float, 1.0, min=0.0),
    )

    def compute(self, reading, reference, matches, state):
        limit = jnp.float32(self.minDist) ** 2
        return (matches.dists >= limit).astype(jnp.float32), state


@OutlierFilterRegistrar.register
class MedianDistOutlierFilter(OutlierFilter):
    """Rejects pairs beyond factor·median distance
    (reference: OutlierFiltersImpl.cpp:109-125)."""

    PARAMS = (
        Param("factor", "points whose distance exceeds this factor times the "
              "median distance are rejected", float, 3.0, min=0.0000001),
    )

    def compute(self, reading, reference, matches, state):
        limit = self.factor * masked_median(matches.dists)
        return (matches.dists <= limit).astype(jnp.float32), state


@OutlierFilterRegistrar.register
class TrimmedDistOutlierFilter(OutlierFilter):
    """Keeps the best ``ratio`` fraction of matches by distance
    (reference: OutlierFiltersImpl.cpp:132-147; the default chain's filter,
    ICP.cpp:107)."""

    PARAMS = (
        Param("ratio", "fraction of matches to keep (by increasing distance)",
              float, 0.85, min=0.0000001, max=1.0),
    )

    def compute(self, reading, reference, matches, state):
        limit = masked_quantile(matches.dists, self.ratio)
        return (matches.dists <= limit).astype(jnp.float32), state


@OutlierFilterRegistrar.register
class VarTrimmedDistOutlierFilter(OutlierFilter):
    """Auto-tunes the trim ratio each iteration by minimizing the FRMS
    criterion over [minRatio, maxRatio]
    (reference: OutlierFiltersImpl.cpp:152-220, \\cite{Phillips2007})."""

    PARAMS = (
        Param("minRatio", "lower bound of the search interval", float, 0.05,
              min=0.0000001, max=1.0),
        Param("maxRatio", "upper bound of the search interval", float, 0.99,
              min=0.0000001, max=1.0),
        Param("lambda", "FRMS exponent λ; FRMS = cumdist/n/f^2λ", float, 2.35),
    )

    def __init__(self, params=None):
        super().__init__(params)
        if self.minRatio >= self.maxRatio:
            raise InvalidParameter(
                f"VarTrimmedDistOutlierFilter: minRatio ({self.minRatio}) must "
                f"be smaller than maxRatio ({self.maxRatio})"
            )

    def compute(self, reading, reference, matches, state):
        dists = matches.dists
        # Ratios are fractions of the *real* match population (finite,
        # nonzero) — with fixed-shape padding the raw entry count would
        # inflate the denominator and collapse the kept set.
        flat = jnp.ravel(dists)
        valid = jnp.logical_and(jnp.isfinite(flat), flat > 0)
        n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
        s = jnp.sort(jnp.where(valid, flat, jnp.inf))
        cumsum = jnp.cumsum(s)  # +inf tail poisons the padding region
        ids = jnp.arange(1, dists.size + 1, dtype=jnp.float32)
        ratio = ids / n
        in_window = jnp.logical_and(
            ids >= jnp.floor(self.minRatio * n) + 1.0,
            ids <= jnp.floor(self.maxRatio * n),
        )
        frms = cumsum / ids / ratio ** (2.0 * self.parameters["lambda"])
        frms = jnp.where(in_window, frms, jnp.inf)
        # reference indexing convention: optRatio = (minIndex + minEl)/n and
        # the quantile indexes floor(n·ratio) (OutlierFiltersImpl.cpp:215-219)
        opt_ratio = jnp.argmin(frms).astype(jnp.float32) / n
        limit = masked_quantile(dists, opt_ratio)
        return (dists <= limit).astype(jnp.float32), state


@OutlierFilterRegistrar.register
class SurfaceNormalOutlierFilter(OutlierFilter):
    """Rejects pairs whose normals disagree by more than maxAngle
    (reference: OutlierFiltersImpl.cpp:226-288)."""

    PARAMS = (
        Param("maxAngle", "maximum angle between the normals of a matched "
              "pair [rad]", float, 1.50, min=0.0, max=3.1416),
    )

    def compute(self, reading, reference, matches, state):
        if not (reading.has_descriptor("normals") and reference.has_descriptor("normals")):
            # Parity: skip filtering when normals are unavailable
            # (reference: OutlierFiltersImpl.cpp:271-281).
            return jnp.ones_like(matches.dists), state
        eps = jnp.float32(math.cos(self.maxAngle))
        nr = reading.get_descriptor("normals")
        nf = reference.get_descriptor("normals")
        nr = nr / jnp.maximum(jnp.linalg.norm(nr, axis=1, keepdims=True), 1e-20)
        nf = nf / jnp.maximum(jnp.linalg.norm(nf, axis=1, keepdims=True), 1e-20)
        ids = jnp.maximum(matches.ids, 0)
        nref = nf[ids]  # [N, knn, d]
        dot = jnp.abs(jnp.sum(nr[:, None, :] * nref, axis=-1))
        w = jnp.where(dot >= eps, 1.0, 0.0)
        w = jnp.where(matches.ids >= 0, w, 0.0)
        return w, state


@OutlierFilterRegistrar.register
class GenericDescriptorOutlierFilter(OutlierFilter):
    """Weights pairs by thresholding (or directly using) a 1-D descriptor
    (reference: OutlierFiltersImpl.cpp:291-374).

    Note: with ``source: reading`` the descriptor is indexed by the reading
    point (the reference contains a known quirk where both branches read the
    reference cloud; we implement the documented intent)."""

    PARAMS = (
        Param("source", "cloud carrying the descriptor: 'reference' or "
              "'reading'", str, "reference"),
        Param("descName", "name of the 1-D descriptor to use", str, "none"),
        Param("useSoftThreshold", "if true, use the descriptor value as "
              "weight (normalized by its max); if false, hard threshold",
              bool, False),
        Param("useLargerThan", "hard threshold direction: keep if descriptor "
              "larger (true) or smaller (false) than threshold", bool, True),
        Param("threshold", "hard threshold value", float, 0.9, min=0.0000001),
    )

    def __init__(self, params=None):
        super().__init__(params)
        if self.source not in ("reference", "reading"):
            raise InvalidParameter(
                "GenericDescriptorOutlierFilter: 'source' must be 'reference' "
                f"or 'reading', got '{self.source}'"
            )

    def compute(self, reading, reference, matches, state):
        n, knn = matches.dists.shape
        if self.source == "reference":
            desc = reference.get_descriptor(self.descName)
            if desc.shape[1] != 1:
                raise InvalidParameter(
                    f"GenericDescriptorOutlierFilter: '{self.descName}' must be 1-D"
                )
            vals = desc[jnp.maximum(matches.ids, 0), 0]  # [N, knn]
        else:
            desc = reading.get_descriptor(self.descName)
            if desc.shape[1] != 1:
                raise InvalidParameter(
                    f"GenericDescriptorOutlierFilter: '{self.descName}' must be 1-D"
                )
            vals = jnp.broadcast_to(desc[:, 0][:, None], (n, knn))
        if self.useSoftThreshold:
            w = vals
            w = jnp.where(matches.ids >= 0, w, 0.0)
            w = w / jnp.maximum(jnp.max(w), 1e-20)
        else:
            if self.useLargerThan:
                w = (vals > self.threshold).astype(jnp.float32)
            else:
                w = (vals < self.threshold).astype(jnp.float32)
            w = jnp.where(matches.ids >= 0, w, 0.0)
        return w, state


@OutlierFilterRegistrar.register
class RobustOutlierFilter(OutlierFilter):
    """M-estimator weighting with pluggable robust cost and scale estimator
    (reference: OutlierFiltersImpl.cpp:379-602, \\cite{RobustWeightFcts}).

    Supported robust functions: cauchy, welsch, sc (switchable constraint),
    gm (Geman-McClure), tukey, huber, L1, student; scale estimators: none,
    mad, std, berg — with an iteration schedule threaded through the ICP loop
    as explicit state (the reference mutates members instead)."""

    PARAMS = (
        Param("robustFct", "robust cost: cauchy|welsch|sc|gm|tukey|huber|L1|student",
              str, "cauchy"),
        Param("tuning", "tuning constant k of the robust function (or target "
              "scale for the berg estimator)", float, 1.0, min=0.0000001),
        Param("scaleEstimator", "scale estimator: none|mad|std|berg", str, "mad"),
        Param("nbIterationForScale", "number of iterations the scale is "
              "re-estimated for (0 = every iteration)", int, 0, min=0, max=100),
        Param("distanceType", "residual type: point2point|point2plane", str,
              "point2point"),
        Param("approximation", "cutoff distance above which weights are "
              "forced to 0 (inf = disabled)", float, "inf", min=0.0),
    )

    _BERG_TUNING = {"cauchy": 4.3040, "tukey": 7.0589, "huber": 2.0138}

    def __init__(self, params=None):
        super().__init__(params)
        if self.robustFct not in ("cauchy", "welsch", "sc", "gm", "tukey", "huber", "L1", "student"):
            raise InvalidParameter("Invalid robust function name.")
        if self.scaleEstimator not in ("none", "mad", "std", "berg"):
            raise InvalidParameter("Invalid scale estimator name.")
        if self.distanceType not in ("point2point", "point2plane"):
            raise InvalidParameter("Invalid distance type name.")
        self.berg_target_scale = 0.0
        self.k = self.tuning
        if self.scaleEstimator == "berg":
            self.berg_target_scale = self.tuning
            self.k = self._BERG_TUNING.get(self.robustFct, self.tuning)
        self.squared_approximation = float(self.approximation) ** 2

    def init_state(self):
        return (jnp.float32(1.0), jnp.int32(1))  # (scale, iteration)

    def _residuals(self, reading, reference, matches):
        if self.distanceType == "point2point":
            return matches.dists
        normals = reference.get_descriptor("normals")
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-20
        )
        ids = jnp.maximum(matches.ids, 0)
        nref = normals[ids]  # [N, knn, d]
        pref = reference.points[ids]  # [N, knn, d]
        delta = reading.points[:, None, :] - pref
        d = jnp.sum(nref * delta, axis=-1) ** 2
        return jnp.where(matches.ids >= 0, d, 0.0)

    def compute(self, reading, reference, matches, state):
        scale, iteration = state
        update = jnp.logical_or(
            iteration <= self.nbIterationForScale, self.nbIterationForScale == 0
        )
        if self.scaleEstimator == "mad":
            new_scale = jnp.sqrt(masked_mad(matches.dists))
        elif self.scaleEstimator == "std":
            new_scale = jnp.sqrt(masked_std(matches.dists))
        elif self.scaleEstimator == "berg":
            first = 1.9 * jnp.sqrt(masked_quantile(matches.dists, 0.5))
            decayed = 0.85 * (scale - self.berg_target_scale) + self.berg_target_scale
            new_scale = jnp.where(iteration == 1, first, decayed)
        else:
            new_scale = jnp.float32(1.0)
        scale = jnp.where(update, new_scale, scale)

        dists = self._residuals(reading, reference, matches)
        e2 = dists / (scale * scale)
        k = jnp.float32(self.k)
        k2 = k * k
        fct = self.robustFct
        if fct == "cauchy":
            w = 1.0 / (1.0 + e2 / k2)
        elif fct == "welsch":
            w = jnp.exp(-e2 / k2)
        elif fct == "sc":
            w = jnp.where(e2 >= k, 4.0 * k2 / (k + e2) ** 2, 1.0)
        elif fct == "gm":
            w = k2 / (k + e2) ** 2
        elif fct == "tukey":
            w = jnp.where(e2 >= k2, 0.0, (1.0 - e2 / k2) ** 2)
        elif fct == "huber":
            w = jnp.where(e2 >= k2, k / jnp.sqrt(jnp.maximum(e2, 1e-38)), 1.0)
        elif fct == "L1":
            w = 1.0 / jnp.sqrt(jnp.maximum(e2, 1e-38))
        else:  # student
            d = 3.0
            p = (1.0 + e2 / k) ** (-(k + d) / 2.0)
            w = p * (k + d) / (k + e2)
        # Parity: clamp tiny weights to 1e-50 so they stay "used"
        # (reference: OutlierFiltersImpl.cpp:587-588).
        w = jnp.where(w <= 1e-50, 1e-50, w)
        w = jnp.where(jnp.isfinite(matches.dists), w, 0.0)
        if self.squared_approximation != float("inf"):
            w = jnp.where(e2 >= self.squared_approximation, 0.0, w)
        return w, (scale, iteration + 1)
