"""Geometric and sampling filters (mask-writing, shape-preserving).

Each "removal" filter clears mask bits instead of resizing
(reference resizes: e.g. MaxDist.cpp conservativeResize); the chain's compact
step repacks. Parameter names, defaults and bounds mirror the reference
headers so reference YAML configs run unchanged."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cloud import PointCloud
from ..errors import InvalidField, InvalidParameter
from ..registry import Param
from .base import DataPointsFilter, DataPointsFilterRegistrar

_reg = DataPointsFilterRegistrar.register


def _axis_values(cloud: PointCloud, dim: int):
    """Value to threshold: axis coordinate, or radial norm when dim == -1."""
    if dim == -1:
        return jnp.linalg.norm(cloud.points, axis=1)
    if dim >= cloud.dim:
        raise InvalidParameter(
            f"filtering on dimension {dim}, larger than authorized axis id "
            f"{cloud.dim - 1}"
        )
    return cloud.points[:, dim]


@_reg
class IdentityDataPointsFilter(DataPointsFilter):
    """Does nothing (reference: DataPointsFilters/Identity.cpp)."""

    def filter(self, cloud, key=None):
        return cloud


@_reg
class RemoveNaNDataPointsFilter(DataPointsFilter):
    """Removes points with any non-finite coordinate
    (reference: DataPointsFilters/RemoveNaN.cpp)."""

    def filter(self, cloud, key=None):
        keep = jnp.all(jnp.isfinite(cloud.points), axis=1)
        return cloud.with_mask(keep)


@_reg
class MaxDistDataPointsFilter(DataPointsFilter):
    """Keeps points below a maximum distance on an axis or radially
    (reference: DataPointsFilters/MaxDist.cpp)."""

    PARAMS = (
        Param("dim", "dimension on which the filter will be applied. "
              "x=0, y=1, z=2, radius=-1", int, -1, min=-1, max=2),
        Param("maxDist", "maximum distance authorized. If dim is -1 (radius) "
              "the absolute value is used. All points beyond are filtered.",
              float, 1.0),
    )

    def filter(self, cloud, key=None):
        v = _axis_values(cloud, self.dim)
        limit = abs(self.maxDist) if self.dim == -1 else self.maxDist
        return cloud.with_mask(v < limit)


@_reg
class MinDistDataPointsFilter(DataPointsFilter):
    """Keeps points beyond a minimum distance on an axis or radially
    (reference: DataPointsFilters/MinDist.cpp)."""

    PARAMS = (
        Param("dim", "dimension on which the filter will be applied. "
              "x=0, y=1, z=2, radius=-1", int, -1, min=-1, max=2),
        Param("minDist", "minimum value authorized. If dim is -1 (radius) "
              "the absolute value is used. All points before are filtered.",
              float, 1.0),
    )

    def filter(self, cloud, key=None):
        v = _axis_values(cloud, self.dim)
        limit = abs(self.minDist) if self.dim == -1 else self.minDist
        return cloud.with_mask(v > limit)


@_reg
class DistanceLimitDataPointsFilter(DataPointsFilter):
    """Keeps points inside or outside a distance limit
    (reference: DataPointsFilters/DistanceLimit.cpp)."""

    PARAMS = (
        Param("dim", "dimension on which the filter will be applied. "
              "x=0, y=1, z=2, radius=-1", int, -1, min=-1, max=2),
        Param("dist", "distance limit; absolute value used when dim == -1",
              float, 1.0),
        Param("removeInside", "1: remove points before the limit; 0: remove "
              "points beyond", bool, True),
    )

    def filter(self, cloud, key=None):
        v = _axis_values(cloud, self.dim)
        limit = abs(self.dist) if self.dim == -1 else self.dist
        keep = v > limit if self.removeInside else v < limit
        return cloud.with_mask(keep)


@_reg
class BoundingBoxDataPointsFilter(DataPointsFilter):
    """Removes points inside (or outside) an axis-aligned box
    (reference: DataPointsFilters/BoundingBox.cpp)."""

    PARAMS = (
        Param("xMin", "minimum value on x-axis", float, -1.0),
        Param("xMax", "maximum value on x-axis", float, 1.0),
        Param("yMin", "minimum value on y-axis", float, -1.0),
        Param("yMax", "maximum value on y-axis", float, 1.0),
        Param("zMin", "minimum value on z-axis", float, -1.0),
        Param("zMax", "maximum value on z-axis", float, 1.0),
        Param("removeInside", "1: remove inside the box; 0: remove outside",
              bool, True),
    )

    def filter(self, cloud, key=None):
        p = cloud.points
        inb = jnp.logical_and(p[:, 0] > self.xMin, p[:, 0] < self.xMax)
        inb &= jnp.logical_and(p[:, 1] > self.yMin, p[:, 1] < self.yMax)
        if cloud.dim == 3:
            inb &= jnp.logical_and(p[:, 2] > self.zMin, p[:, 2] < self.zMax)
        keep = jnp.logical_not(inb) if self.removeInside else inb
        return cloud.with_mask(keep)


@_reg
class MaxQuantileOnAxisDataPointsFilter(DataPointsFilter):
    """Keeps points below the ratio-quantile of an axis coordinate
    (reference: DataPointsFilters/MaxQuantileOnAxis.cpp)."""

    PARAMS = (
        Param("dim", "dimension on which the filter will be applied. "
              "x=0, y=1, z=2", int, 0, min=0, max=2),
        Param("ratio", "maximum quantile authorized; points beyond are "
              "filtered", float, 0.5, min=0.0000001, max=0.9999999),
    )

    def filter(self, cloud, key=None):
        v = _axis_values(cloud, self.dim)
        vals = jnp.where(cloud.mask, v, jnp.inf)
        n = cloud.count()
        s = jnp.sort(vals)
        idx = jnp.clip((n * self.ratio).astype(jnp.int32), 0, cloud.num_points - 1)
        limit = s[idx]
        return cloud.with_mask(v < limit)


@_reg
class MaxDensityDataPointsFilter(DataPointsFilter):
    """Probabilistically thins points whose local density exceeds maxDensity
    (reference: DataPointsFilters/MaxDensity.cpp; needs a prior
    SurfaceNormal/SamplingSurfaceNormal pass to produce 'densities')."""

    PARAMS = (
        Param("maxDensity", "Maximum density of points to target. Unit: "
              "number of points per m^3.", float, 10.0, min=0.0000001),
    )

    def filter(self, cloud, key=None):
        if not cloud.has_descriptor("densities"):
            raise InvalidField(
                "MaxDensityDataPointsFilter: no densities found in descriptors"
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        dens = cloud.get_descriptor("densities")[:, 0]
        masked_dens = jnp.where(cloud.mask, dens, -jnp.inf)
        last_density = jnp.max(masked_dens)
        n_saturated = jnp.sum(masked_dens == last_density)
        n = jnp.maximum(cloud.count(), 1)
        accept = self.maxDensity / jnp.maximum(dens, 1e-20)
        # saturation correction (reference: MaxDensity.cpp acceptRatio scaling)
        sat = dens == last_density
        accept = jnp.where(sat, accept * (1.0 - n_saturated / n), accept)
        r = jax.random.uniform(key, (cloud.num_points,))
        keep = jnp.logical_or(dens <= self.maxDensity, r < accept)
        return cloud.with_mask(keep)


@_reg
class RandomSamplingDataPointsFilter(DataPointsFilter):
    """Keeps each point with probability ``prob``
    (reference: DataPointsFilters/RandomSampling.cpp; the default reading
    filter, ICP.cpp:105)."""

    PARAMS = (
        Param("prob", "probability to keep a point, one over decimation "
              "factor", float, 0.75, min=0.0, max=1.0),
    )

    def filter(self, cloud, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        r = jax.random.uniform(key, (cloud.num_points,))
        return cloud.with_mask(r < self.prob)


@_reg
class MaxPointCountDataPointsFilter(DataPointsFilter):
    """Random subsample iff the cloud exceeds maxCount points
    (reference: DataPointsFilters/MaxPointCount.cpp). The reference's
    Fisher-Yates prefix swap with a fixed srand seed becomes a seeded
    ``jax.random`` permutation — same contract: deterministic for a given
    seed, keeps exactly maxCount points."""

    PARAMS = (
        Param("seed", "random seed", int, 1, min=0),
        Param("maxCount", "maximum number of points", int, 1000, min=0),
    )

    def filter(self, cloud, key=None):
        n = cloud.count_host()
        if n <= self.maxCount:
            return cloud
        key = jax.random.PRNGKey(self.seed)
        # rank valid points by random draw; keep the maxCount smallest
        r = jax.random.uniform(key, (cloud.num_points,))
        r = jnp.where(cloud.mask, r, jnp.inf)
        order = jnp.argsort(r)
        keep_rows = order[: self.maxCount]
        keep = jnp.zeros((cloud.num_points,), bool).at[keep_rows].set(True)
        return cloud.with_mask(keep)


@_reg
class FixStepSamplingDataPointsFilter(DataPointsFilter):
    """Keeps every step-th point with a geometric step schedule across ICP
    iterations (reference: DataPointsFilters/FixStepSampling.cpp; the only
    filter whose ``init()`` matters)."""

    PARAMS = (
        Param("startStep", "initial number of points to skip (initial "
              "decimation factor)", int, 10, min=1),
        Param("endStep", "maximal or minimal number of points to skip (final "
              "decimation factor)", int, 10, min=1),
        Param("stepMult", "multiplication factor to compute the new "
              "decimation factor for each iteration", float, 1.0,
              min=0.0000001),
    )

    def __init__(self, params=None):
        super().__init__(params)
        self.step = float(self.startStep)

    def init(self):
        self.step = float(self.startStep)

    def filter(self, cloud, key=None):
        istep = max(int(self.step), 1)
        idx = jnp.cumsum(cloud.mask) - 1  # rank among valid points
        keep = (idx % istep) == 0
        # advance the schedule (reference: FixStepSampling.cpp bottom)
        delta = self.startStep * self.stepMult - self.startStep
        self.step *= self.stepMult
        if delta < 0 and self.step < self.endStep:
            self.step = float(self.endStep)
        if delta > 0 and self.step > self.endStep:
            self.step = float(self.endStep)
        return cloud.with_mask(keep)

    # the schedule is deterministic-geometric: a pure function of the
    # iteration counter, so the fused while_loop can evaluate it in-trace
    # (reference applies step filters per iteration at ICP.cpp:373-379).
    # The per-iteration step factor comes from a HOST-precomputed table
    # replaying filter()'s own f64 sequential-multiply-then-clamp
    # arithmetic — an in-trace f32 power() diverged from it (e.g.
    # startStep=25, stepMult=1.4, iteration 2: f64 gives int(49.00000...)
    # = 49, f32 power gives floor(48.999996) = 48 — a different keep
    # mask), and clamped endStep onto iteration 0 for endStep-beyond-
    # startStep configs. Geometric schedules are eventually constant
    # (clamped at endStep, or fixed at stepMult == 1), so a saturating
    # 512-entry table is exact for ANY iteration count.
    SCHEDULE_TRACEABLE = True
    _SCHED_LEN = 512

    def _schedule_table(self):
        import numpy as np

        steps = np.empty((self._SCHED_LEN,), np.int32)
        step = float(self.startStep)
        delta = self.startStep * self.stepMult - self.startStep
        for i in range(self._SCHED_LEN):
            steps[i] = max(int(step), 1)  # filter()'s truncation
            step *= self.stepMult
            if delta < 0 and step < self.endStep:
                step = float(self.endStep)
            if delta > 0 and step > self.endStep:
                step = float(self.endStep)
        return steps

    def mask_at_iteration(self, cloud, iteration):
        table = jnp.asarray(self._schedule_table())
        istep = table[jnp.clip(iteration, 0, self._SCHED_LEN - 1)]
        idx = jnp.cumsum(cloud.mask) - 1
        keep = (idx % istep) == 0
        return cloud.with_mask(keep)  # with_mask ANDs with the live mask


@_reg
class ShadowDataPointsFilter(DataPointsFilter):
    """Removes shadow (veil) points whose normal is nearly orthogonal to the
    viewing direction (reference: DataPointsFilters/Shadow.cpp)."""

    PARAMS = (
        Param("eps", "Small angle (in rad) around which a normal shouldn't "
              "be observable", float, 0.1, min=0.0, max=3.1416),
    )

    def filter(self, cloud, key=None):
        if not cloud.has_descriptor("normals"):
            raise InvalidField(
                "ShadowDataPointsFilter: cannot find normals in descriptors"
            )
        normals = cloud.get_descriptor("normals")
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-20
        )
        pts = cloud.points / jnp.maximum(
            jnp.linalg.norm(cloud.points, axis=1, keepdims=True), 1e-20
        )
        value = jnp.abs(jnp.sum(normals * pts, axis=1))
        return cloud.with_mask(value > self.eps)


@_reg
class CutAtDescriptorThresholdDataPointsFilter(DataPointsFilter):
    """Drops points whose named 1-D descriptor is above/below a threshold
    (reference: DataPointsFilters/CutAtDescriptorThreshold.cpp)."""

    PARAMS = (
        Param("descName", "Descriptor name used to cut points", str, "none"),
        Param("useLargerThan", "1: cut points with values above threshold; "
              "0: cut points below", bool, True),
        Param("threshold", "Value at which to cut.", float, 0.0),
    )

    def filter(self, cloud, key=None):
        if not cloud.has_descriptor(self.descName):
            raise InvalidField(
                "CutAtDescriptorThresholdDataPointsFilter: field "
                f"'{self.descName}' not found in descriptors"
            )
        v = cloud.get_descriptor(self.descName)[:, 0]
        keep = v <= self.threshold if self.useLargerThan else v >= self.threshold
        return cloud.with_mask(keep)


@_reg
class ObservationDirectionDataPointsFilter(DataPointsFilter):
    """Adds an 'observationDirections' descriptor pointing from each point to
    the sensor center (reference: DataPointsFilters/ObservationDirection.cpp)."""

    PARAMS = (
        Param("x", "x-coordinate of sensor", float, 0.0),
        Param("y", "y-coordinate of sensor", float, 0.0),
        Param("z", "z-coordinate of sensor", float, 0.0),
    )

    def filter(self, cloud, key=None):
        center = jnp.array(
            [self.x, self.y, self.z][: cloud.dim], dtype=cloud.points.dtype
        )
        return cloud.with_descriptor(
            "observationDirections", center[None, :] - cloud.points
        )


@_reg
class OrientNormalsDataPointsFilter(DataPointsFilter):
    """Flips normals toward (or away from) the observation direction
    (reference: DataPointsFilters/OrientNormals.cpp)."""

    PARAMS = (
        Param("towardCenter", "1: normals point toward the observation "
              "points; 0: away", bool, True),
    )

    def filter(self, cloud, key=None):
        if not cloud.has_descriptor("normals"):
            raise InvalidField(
                "OrientNormalsDataPointsFilter: cannot find normals in descriptors"
            )
        if not cloud.has_descriptor("observationDirections"):
            raise InvalidField(
                "OrientNormalsDataPointsFilter: cannot find observation "
                "directions in descriptors"
            )
        n = cloud.get_descriptor("normals")
        od = cloud.get_descriptor("observationDirections")
        scalar = jnp.sum(n * od, axis=1, keepdims=True)
        sign = jnp.where(scalar < 0, -1.0, 1.0)
        if not self.towardCenter:
            sign = -sign
        flip = jnp.where(scalar == 0, 1.0, sign)
        return cloud.with_descriptor("normals", n * flip)


@_reg
class IncidenceAngleDataPointsFilter(DataPointsFilter):
    """Adds the incidence angle acos(view·normal) as descriptor
    (reference: DataPointsFilters/IncidenceAngle.cpp)."""

    def filter(self, cloud, key=None):
        if not cloud.has_descriptor("normals"):
            raise InvalidField(
                "IncidenceAngleDataPointsFilter: cannot find normals in descriptors"
            )
        if not cloud.has_descriptor("observationDirections"):
            raise InvalidField(
                "IncidenceAngleDataPointsFilter: cannot find observation "
                "directions in descriptors"
            )
        n = cloud.get_descriptor("normals")
        od = cloud.get_descriptor("observationDirections")
        od = od / jnp.maximum(jnp.linalg.norm(od, axis=1, keepdims=True), 1e-20)
        dot = jnp.clip(jnp.sum(n * od, axis=1), -1.0, 1.0)
        return cloud.with_descriptor("incidenceAngles", jnp.arccos(dot))


@_reg
class SimpleSensorNoiseDataPointsFilter(DataPointsFilter):
    """Adds a 'simpleSensorNoise' descriptor from an empirical sensor model
    (reference: DataPointsFilters/SimpleSensorNoise.cpp,
    \\cite{Pomerleau2012Noise})."""

    PARAMS = (
        Param("sensorType", "Type of the sensor used. 0=Sick LMS-1xx, "
              "1=Hokuyo URG-04LX, 2=Hokuyo UTM-30LX, 3=Kinect/Xtion, "
              "4=Sick Tim3xx", int, 0, min=0, max=4),
        Param("gain", "Uncertainty gain for untrusted sources", float, 1.0,
              min=1.0),
    )

    _LASER = {
        0: (0.012, 0.0068, 0.0008),
        1: (0.028, 0.0013, 0.0001),
        2: (0.018, 0.0006, 0.0015),
        4: (0.004, 0.0053, -0.0092),
    }

    def filter(self, cloud, key=None):
        r = jnp.linalg.norm(cloud.points, axis=1)
        if self.sensorType == 3:
            noise = (r * r) * (0.5 * 0.00285)
        else:
            min_radius, beam_angle, beam_const = self._LASER[self.sensorType]
            noise = jnp.maximum(min_radius, beam_angle * r + beam_const)
        return cloud.with_descriptor("simpleSensorNoise", self.gain * noise)


# Pure jnp functions of (cloud, key) — safe to run inside jitted programs
# (the fused batch-serving path). MaxPointCount (host count branch) and
# FixStepSampling (Python-side schedule state) stay host-only.
for _cls in (
    IdentityDataPointsFilter,
    RemoveNaNDataPointsFilter,
    MaxDistDataPointsFilter,
    MinDistDataPointsFilter,
    DistanceLimitDataPointsFilter,
    BoundingBoxDataPointsFilter,
    MaxQuantileOnAxisDataPointsFilter,
    MaxDensityDataPointsFilter,
    RandomSamplingDataPointsFilter,
    ShadowDataPointsFilter,
    CutAtDescriptorThresholdDataPointsFilter,
    ObservationDirectionDataPointsFilter,
    OrientNormalsDataPointsFilter,
    IncidenceAngleDataPointsFilter,
    SimpleSensorNoiseDataPointsFilter,
):
    _cls.TRACEABLE = True
del _cls
