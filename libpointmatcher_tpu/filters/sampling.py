"""Structured subsampling filters: VoxelGrid, OctreeGrid, NormalSpace,
CovarianceSampling, Elipsoids.

TPU design note shared by all: cell/box assignment is computed with cheap
host-side numpy (data-dependent structure; runs once, off the hot loop),
while all per-cell statistics — centroids, covariances, eigendecompositions —
are one batched device computation via segment reductions + ``eigh``."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import PointCloud
from ..errors import InvalidField, InvalidParameter
from ..registry import Param
from .base import DataPointsFilter, DataPointsFilterRegistrar
from .normals import _median_split_boxes

_reg = DataPointsFilterRegistrar.register


def _segment_stats(pts: jnp.ndarray, seg: jnp.ndarray, num_seg: int):
    """counts [B], means [B,d], covariances [B,d,d] per segment."""
    n, d = pts.shape
    ones = jnp.ones((n,), jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_seg)
    sums = jax.ops.segment_sum(pts, seg, num_seg)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    centered = pts - means[seg]
    outer = (centered[:, :, None] * centered[:, None, :]).reshape(n, d * d)
    C = jax.ops.segment_sum(outer, seg, num_seg).reshape(num_seg, d, d)
    return counts, means, C


@_reg
class VoxelGridDataPointsFilter(DataPointsFilter):
    """Voxel-grid down-sampling to cell centroids or centers
    (reference: DataPointsFilters/VoxelGrid.cpp)."""

    PARAMS = (
        Param("vSizeX", "Dimension of each voxel cell in x direction", float,
              1.0, min=0.001),
        Param("vSizeY", "Dimension of each voxel cell in y direction", float,
              1.0, min=0.001),
        Param("vSizeZ", "Dimension of each voxel cell in z direction", float,
              1.0, min=0.001),
        Param("useCentroid", "1: down-sample to the centroid of each cell; "
              "0: to the cell center", bool, True),
        Param("averageExistingDescriptors", "1: average existing descriptors "
              "over the cell; 0: drop them", bool, True),
    )

    def filter(self, cloud, key=None):
        host_pts, host_descs, host_times = cloud.to_numpy()
        n, d = host_pts.shape
        if n == 0:
            return cloud
        if not np.all(np.isfinite(host_pts)):
            raise InvalidParameter(
                "VoxelGridDataPointsFilter: NaNs in features; use "
                "RemoveNaNDataPointsFilter first"
            )
        vsize = np.array([self.vSizeX, self.vSizeY, self.vSizeZ][:d])
        idx3 = np.floor(host_pts / vsize).astype(np.int64)
        idx3 -= idx3.min(axis=0)
        # linear voxel index then compact to occupied voxels
        dims = idx3.max(axis=0) + 1
        lin = idx3[:, 0]
        stride = dims[0]
        for a in range(1, d):
            lin = lin + idx3[:, a] * stride
            stride *= dims[a]
        uniq, first, seg = np.unique(
            lin, return_index=True, return_inverse=True
        )
        num_vox = len(uniq)

        pts = jnp.asarray(host_pts)
        segj = jnp.asarray(seg)
        counts, means, _ = _segment_stats(pts, segj, num_vox)
        if self.useCentroid:
            out_pts = means
        else:
            # cell centers in the original coordinate frame; ``first`` is
            # np.unique's first-occurrence index per cell (vectorized — no
            # per-point host iteration on the N axis)
            base = np.floor(host_pts[first] / vsize)
            centers = (base + 0.5) * vsize
            out_pts = jnp.asarray(centers.astype(np.float32))

        descs = {}
        if self.averageExistingDescriptors:
            for k, v in host_descs.items():
                va = jnp.asarray(v)
                s = jax.ops.segment_sum(va, segj, num_vox)
                descs[k] = s / jnp.maximum(counts, 1.0)[:, None]
        times = {}
        for k, v in host_times.items():
            tmin = np.full((num_vox, v.shape[1]), np.iinfo(np.int64).max)
            np.minimum.at(tmin, seg, v)
            times[k] = tmin
        return PointCloud.from_numpy(
            np.asarray(out_pts), {k: np.asarray(v) for k, v in descs.items()},
            times,
        )


def _octree_split(points: np.ndarray, max_points: int, max_size: float) -> np.ndarray:
    """Octree/quadtree leaf assignment: recursively split at the box center
    into 2^d children until ≤ max_points per leaf or box radius ≤ max_size
    (reference: DataPointsFilters/utils/octree.hpp build)."""
    n, d = points.shape
    leaf = np.zeros(n, np.int64)
    next_leaf = [0]
    order = np.arange(n)
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    center0 = (lo + hi) / 2
    radius0 = float((hi - lo).max() / 2)
    stack = [(0, n, center0, radius0)]
    while stack:
        first, last, center, radius = stack.pop()
        count = last - first
        if count <= max_points or (max_size > 0 and 2 * radius <= max_size) or radius <= 0:
            leaf[order[first:last]] = next_leaf[0]
            next_leaf[0] += 1
            continue
        seg = order[first:last]
        coords = points[seg]
        child = np.zeros(count, np.int64)
        for a in range(d):
            child |= (coords[:, a] > center[a]).astype(np.int64) << a
        sort_idx = np.argsort(child, kind="stable")
        order[first:last] = seg[sort_idx]
        child_sorted = child[sort_idx]
        bounds = np.searchsorted(child_sorted, np.arange(2**d + 1))
        half = radius / 2
        for c in range(2**d):
            b0, b1 = bounds[c], bounds[c + 1]
            if b1 > b0:
                offs = np.array(
                    [half if (c >> a) & 1 else -half for a in range(d)]
                )
                stack.append((first + b0, first + b1, center + offs, half))
    return leaf


@_reg
class OctreeGridDataPointsFilter(DataPointsFilter):
    """Octree/quadtree decomposition down-sampling with FIRST / RANDOM /
    CENTROID / MEDOID per-cell sampling (reference:
    DataPointsFilters/OctreeGrid.cpp + utils/octree.hpp; the reference's
    optional std::async parallel build becomes vectorized host assignment +
    batched device statistics)."""

    PARAMS = (
        Param("buildParallel", "use threads to build the octree (accepted "
              "for parity; the build here is vectorized)", bool, True),
        Param("maxPointByNode", "Number of points under which the octree "
              "stops dividing", int, 1, min=1),
        Param("maxSizeByNode", "Size of the bounding box under which the "
              "octree stops dividing", float, 0.0, min=0.0),
        Param("samplingMethod", "0: first point, 1: random, 2: centroid "
              "(more accurate but costly), 3: medoid (more accurate but "
              "costly)", int, 0, min=0, max=3),
    )

    def filter(self, cloud, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        host_pts, host_descs, host_times = cloud.to_numpy()
        n, d = host_pts.shape
        if n == 0:
            return cloud
        leaf = _octree_split(
            host_pts, int(self.maxPointByNode), float(self.maxSizeByNode)
        )
        num_leaves = int(leaf.max()) + 1

        rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
        if self.samplingMethod in (0, 1):
            # vectorized first/random representative per leaf: stable-sort
            # (by leaf, in scan or permuted order) then take each segment's
            # first row — no per-point Python iteration
            if self.samplingMethod == 0:
                perm = np.arange(n)
            else:
                perm = rng.permutation(n)
            order = perm[np.argsort(leaf[perm], kind="stable")]
            starts = np.searchsorted(leaf[order], np.arange(num_leaves))
            reps = order[starts]
            out_pts = host_pts[reps]
            descs = {k: v[reps] for k, v in host_descs.items()}
            times = {k: v[reps] for k, v in host_times.items()}
            return PointCloud.from_numpy(out_pts, descs, times)

        segj = jnp.asarray(leaf)
        pts = jnp.asarray(host_pts)
        counts, means, _ = _segment_stats(pts, segj, num_leaves)
        if self.samplingMethod == 2:  # centroid
            out_pts = np.asarray(means)
            descs = {}
            for k, v in host_descs.items():
                s = jax.ops.segment_sum(jnp.asarray(v), segj, num_leaves)
                descs[k] = np.asarray(s / jnp.maximum(counts, 1.0)[:, None])
            times = {}
            for k, v in host_times.items():
                tmin = np.full((num_leaves, v.shape[1]), np.iinfo(np.int64).max)
                np.minimum.at(tmin, leaf, v)
                times[k] = tmin
            return PointCloud.from_numpy(out_pts, descs, times)
        # medoid: the in-cell point closest to the centroid — vectorized
        # per-segment argmin via (leaf, distance) lexsort + segment firsts
        d2 = jnp.sum((pts - means[segj]) ** 2, axis=1)
        d2h = np.asarray(d2)
        order = np.lexsort((d2h, leaf))
        starts = np.searchsorted(leaf[order], np.arange(num_leaves))
        reps = order[starts]
        out_pts = host_pts[reps]
        descs = {k: v[reps] for k, v in host_descs.items()}
        times = {k: v[reps] for k, v in host_times.items()}
        return PointCloud.from_numpy(out_pts, descs, times)


@_reg
class NormalSpaceDataPointsFilter(DataPointsFilter):
    """Normal-space sampling [\\cite{Rusinkiewicz2001}]: bucket unit normals
    by (θ, φ), then uniformly draw from non-empty buckets until nbSample
    points are kept (reference: DataPointsFilters/NormalSpace.cpp; 3D only).
    The draw itself is inherently sequential and tiny → host-side with a
    seeded generator."""

    PARAMS = (
        Param("nbSample", "Number of points to select.", int, 5000, min=1),
        Param("seed", "Seed for the random generator.", int, 1, min=0),
        Param("epsilon", "Step of discretization for the angle spaces", float,
              0.09817477042, min=0.04908738521, max=3.14159265359),
    )

    def filter(self, cloud, key=None):
        if cloud.dim != 3:
            # parity: reference prints an error and does nothing in 2D
            return cloud
        n = cloud.count_host()
        if self.nbSample >= n:
            return cloud
        if not cloud.has_descriptor("normals"):
            raise InvalidField(
                "NormalSpaceDataPointsFilter: cannot find normals in descriptors"
            )
        host_pts, host_descs, host_times = cloud.to_numpy()
        normals = host_descs["normals"]
        eps = self.epsilon
        n_theta = int(math.ceil(math.pi / eps))
        n_phi = int(math.ceil(2 * math.pi / eps))
        theta = np.arccos(np.clip(normals[:, 2], -1.0, 1.0))
        phi = np.mod(np.arctan2(normals[:, 1], normals[:, 0]) + 2 * math.pi,
                     2 * math.pi)
        bucket = (np.floor(theta / eps).astype(np.int64) * n_phi
                  + np.floor(phi / eps).astype(np.int64))
        bucket = np.clip(bucket, 0, n_theta * n_phi - 1)

        rng = np.random.default_rng(self.seed)
        # vectorized bucket construction (no O(N) Python loop): permute,
        # then stable-sort by bucket — each bucket's members end up
        # contiguous, in permutation order; popping from the run's end
        # reproduces the reference's per-bucket stack draw
        order = rng.permutation(n)
        grouped = order[np.argsort(bucket[order], kind="stable")]
        ub, counts = np.unique(bucket, return_counts=True)
        ends = np.cumsum(counts)          # exclusive end of each run
        remaining = counts.copy()
        alive = np.arange(len(ub))        # non-empty bucket slots
        n_alive = len(alive)
        take = min(self.nbSample, n)
        keep = np.empty(take, np.int64)
        # uniform draw over remaining non-empty buckets until nbSample
        # (reference: NormalSpace.cpp:66-150); O(nbSample) host steps
        for j in range(take):
            ai = int(rng.integers(n_alive))
            b = alive[ai]
            remaining[b] -= 1
            keep[j] = grouped[ends[b] - 1 - (counts[b] - 1 - remaining[b])]
            if remaining[b] == 0:
                n_alive -= 1
                alive[ai] = alive[n_alive]
        keep = keep[:take]
        return PointCloud.from_numpy(
            host_pts[keep],
            {k: v[keep] for k, v in host_descs.items()},
            {k: v[keep] for k, v in host_times.items()},
        )


import functools


@functools.partial(jax.jit, static_argnames=("nb",))
def _covariance_greedy_pick(mag: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Greedy stability selection (reference: CovarianceSampling.cpp:112-180)
    as one device program: per pick, the least-constrained eigen-direction
    (argmin over the six accumulated squared magnitudes) chooses the not-yet
    -sampled point with the largest |magnitude| on it. Tie-breaking matches
    the host formulation (argmax/argmin return the first maximal index).
    Returns the ``nb`` selected row indices, in pick order."""
    n = mag.shape[0]
    absmag = jnp.abs(mag)            # [n, 6] pick score per direction
    mag2 = mag * mag                 # [n, 6] constraint contribution

    def body(i, carry):
        t, avail, keep = carry
        k = jnp.argmin(t)
        score = jnp.where(avail, absmag[:, k], -jnp.inf)
        idx = jnp.argmax(score)
        return (
            t + mag2[idx],
            avail.at[idx].set(False),
            keep.at[i].set(idx.astype(jnp.int32)),
        )

    _, _, keep = jax.lax.fori_loop(
        0, nb,
        body,
        (jnp.zeros((6,), jnp.float32), jnp.ones((n,), bool),
         jnp.zeros((nb,), jnp.int32)),
    )
    return keep


@_reg
class CovarianceSamplingDataPointsFilter(DataPointsFilter):
    """Covariance (stability) sampling [\\cite{Gelfand2003}]: greedily select
    points that constrain the 6 eigen-directions of the torque-normalized
    6x6 covariance equally (reference:
    DataPointsFilters/CovarianceSampling.cpp; 3D only, needs normals).
    The 6-D constraint vectors and covariance are computed on device; the
    greedy selection — sequential by construction (every pick updates the
    constraint totals that choose the next direction) — runs compiled in
    C++ (native/pm_native.cpp::pm_covariance_greedy, mirroring the
    reference's compiled loop, CovarianceSampling.cpp:112-180), with a
    single-program device ``fori_loop`` fallback when no toolchain is
    available. No per-sample Python loop on any path (a host loop cost
    ~1 s at the default nbSample=5000 on 10^5 points; the compiled pick
    is ~50 ms)."""

    PARAMS = (
        Param("nbSample", "Number of points to select.", int, 5000, min=1),
        Param("torqueNorm", "Torque normalization: 0 = L1 (none), 1 = Lavg "
              "(average distance), 2 = Lmax (scale in unit ball)", int, 1,
              min=0, max=2),
    )

    def filter(self, cloud, key=None):
        if cloud.dim != 3:
            raise InvalidField("CovarianceSamplingDataPointsFilter: 3D only")
        n = cloud.count_host()
        if self.nbSample >= n:
            return cloud
        if not cloud.has_descriptor("normals"):
            raise InvalidField(
                "CovarianceSamplingDataPointsFilter: cannot find normals in "
                "descriptors"
            )
        host_pts, host_descs, host_times = cloud.to_numpy()
        normals = host_descs["normals"]

        pts = jnp.asarray(host_pts)
        nrm = jnp.asarray(normals)
        center = jnp.mean(pts, axis=0)
        p = pts - center
        if self.torqueNorm == 0:
            lnorm = 1.0
        elif self.torqueNorm == 1:
            lnorm = jnp.mean(jnp.linalg.norm(p, axis=1))
        else:
            radii = jnp.max(pts, axis=0) - jnp.min(pts, axis=0)
            lnorm = jnp.max(radii) / 2.0
        torque = jnp.cross(p, nrm) / lnorm
        v = jnp.concatenate([torque, nrm], axis=1)  # [n, 6]
        cov = v.T @ v
        _, eigve = jnp.linalg.eigh(cov)
        mag = v @ eigve  # [n, 6] magnitude of each point on each eigvec

        # compiled sequential greedy (like the reference's); device
        # fori_loop fallback when no toolchain is available
        from ..io import native as _native

        keep = _native.covariance_greedy(
            np.asarray(mag, np.float64), int(self.nbSample)
        )
        if keep is None:
            keep = np.asarray(_covariance_greedy_pick(mag, int(self.nbSample)))
        return PointCloud.from_numpy(
            host_pts[keep],
            {k2: v2[keep] for k2, v2 in host_descs.items()},
            {k2: v2[keep] for k2, v2 in host_times.items()},
        )


@_reg
class ElipsoidsDataPointsFilter(DataPointsFilter):
    """Surfel (ellipsoid) decomposition: the SamplingSurfaceNormal box split
    with richer per-surfel outputs — means, covariances, weights (point
    counts), shape parameters (planarity/cylindricality/sphericality)
    (reference: DataPointsFilters/Elipsoids.cpp)."""

    PARAMS = (
        Param("ratio", "ratio of points to keep with random subsampling",
              float, 0.5, min=0.0000001, max=0.9999999),
        Param("knn", "number of points per box (box split threshold)", int,
              7, min=3),
        Param("samplingMethod", "0: random subsampling with ratio; 1: one "
              "point per box", int, 0, min=0, max=1),
        Param("maxBoxDim", "maximum box length above which it is discarded",
              float, "inf"),
        Param("maxTimeWindow", "maximum time spread of a surfel", float, "inf"),
        Param("minPlanarity", "minimum planarity to keep a surfel", float, 0.0),
        Param("averageExistingDescriptors", "average existing descriptors "
              "over the box", bool, True),
        Param("keepNormals", "add normals", bool, True),
        Param("keepDensities", "add densities", bool, False),
        Param("keepEigenValues", "add eigen values", bool, False),
        Param("keepEigenVectors", "add eigen vectors", bool, False),
        Param("keepCovariances", "add covariances", bool, False),
        Param("keepWeights", "add per-surfel point counts", bool, False),
        Param("keepMeans", "add box means", bool, False),
        Param("keepShapes", "add planarity/cylindricality/sphericality", bool,
              False),
        Param("keepIndices", "accepted for parity; per-surfel member indices "
              "are not materialized in the fixed-shape design", bool, False),
    )

    def filter(self, cloud, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        host_pts, host_descs, host_times = cloud.to_numpy()
        n, d = host_pts.shape
        if n == 0:
            return cloud
        box = _median_split_boxes(host_pts, int(self.knn))
        num_boxes = int(box.max()) + 1
        seg = jnp.asarray(box)
        pts = jnp.asarray(host_pts)
        counts, means, C = _segment_stats(pts, seg, num_boxes)
        eigva, eigve = jnp.linalg.eigh(C)

        box_min = jax.ops.segment_min(pts, seg, num_boxes)
        box_max = jax.ops.segment_max(pts, seg, num_boxes)
        box_dim = jnp.max(box_max - box_min, axis=1)
        centered_norm = jnp.linalg.norm(pts - means[seg], axis=1)
        max_cnorm = jax.ops.segment_max(centered_norm, seg, num_boxes)

        lam_max = jnp.maximum(eigva[:, -1], 1e-30)
        degenerate = eigva[:, 1] <= lam_max * 1e-9
        unfit = jnp.logical_or(degenerate, box_dim > self.maxBoxDim)

        # shape params from eigenvalues sorted DESCENDING
        va_desc = eigva[:, ::-1]
        s = jnp.maximum(jnp.sum(va_desc, axis=1, keepdims=True), 1e-30)
        vals = va_desc / s
        planarity = 2.0 * (vals[:, 1] - vals[:, 2])
        cylindricality = vals[:, 0] - vals[:, 1]
        sphericality = 3.0 * vals[:, 2]
        if self.minPlanarity > 0:
            unfit = jnp.logical_or(unfit, planarity < self.minPlanarity)

        if host_times:
            tname = next(iter(host_times))
            tvals = host_times[tname][:, 0]
            tmin = np.full(num_boxes, np.iinfo(np.int64).max)
            tmax = np.full(num_boxes, np.iinfo(np.int64).min)
            tsum = np.zeros(num_boxes, np.float64)
            np.minimum.at(tmin, box, tvals)
            np.maximum.at(tmax, box, tvals)
            np.add.at(tsum, box, tvals.astype(np.float64))
            tmean = (tsum / np.maximum(np.asarray(counts), 1)).astype(np.int64)
            if self.maxTimeWindow != float("inf"):
                unfit = jnp.logical_or(
                    unfit, jnp.asarray((tmax - tmin) > self.maxTimeWindow)
                )
            new_times = {
                tname: np.stack([tmin, tmax, tmean], axis=1)
            }
        else:
            new_times = {}

        normals = jnp.clip(eigve[:, :, 0], -1.0, 1.0)
        volume = (4.0 / 3.0) * math.pi * jnp.maximum(max_cnorm, 1e-12) ** 3
        densities = counts / volume
        ser_ev = eigve.reshape(num_boxes, d * d)
        ser_cov = C.reshape(num_boxes, d * d)

        if self.samplingMethod == 0:
            r = jax.random.uniform(key, (n,))
            keep = jnp.logical_and(r < self.ratio, jnp.logical_not(unfit[seg]))
            out_pts = pts
            per_point = True
        else:
            # vectorized first-occurrence per box
            first = np.full(num_boxes, n, np.int64)
            np.minimum.at(first, box, np.arange(n))
            keep = jnp.zeros((n,), bool).at[jnp.asarray(first)].set(True)
            keep = jnp.logical_and(keep, jnp.logical_not(unfit[seg]))
            out_pts = means[seg]
            per_point = False

        descs = {}
        for k, v in host_descs.items():
            va = jnp.asarray(v)
            if per_point or not self.averageExistingDescriptors:
                descs[k] = va
            else:
                sums = jax.ops.segment_sum(va, seg, num_boxes)
                descs[k] = (sums / jnp.maximum(counts, 1.0)[:, None])[seg]
        if self.keepNormals:
            descs["normals"] = normals[seg]
        if self.keepDensities:
            descs["densities"] = densities[seg][:, None]
        if self.keepEigenValues:
            descs["eigValues"] = eigva[seg]
        if self.keepEigenVectors:
            descs["eigVectors"] = ser_ev[seg]
        if self.keepCovariances:
            descs["covariance"] = ser_cov[seg]
        if self.keepWeights:
            descs["weights"] = counts[seg][:, None]
        if self.keepMeans:
            descs["means"] = means[seg]
        if self.keepShapes:
            shapes = jnp.stack([planarity, cylindricality, sphericality], axis=1)
            descs["shapes"] = shapes[seg]

        from ..cloud import split_int64

        times_full = {
            k: jnp.asarray(split_int64(v[box])) for k, v in new_times.items()
        }
        return PointCloud(out_pts, keep, descs, times_full)
