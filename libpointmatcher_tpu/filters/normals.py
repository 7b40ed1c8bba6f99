"""Normal-estimation filters: SurfaceNormal, SamplingSurfaceNormal, Sphericality.

The reference computes per-point neighborhoods with a kd-tree and loops over
points (reference: DataPointsFilters/SurfaceNormal.cpp:82-290). TPU design:
one batched kNN sweep (the same MXU-tiled kernel as the matcher), then
**batched** covariance assembly + ``eigh`` over all neighborhoods at once —
the whole filter is three fused XLA computations instead of N small eigens.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import PointCloud
from ..errors import InvalidField
from ..ops.dispatch import knn_search
from ..registry import Param
from .base import DataPointsFilter, DataPointsFilterRegistrar

_reg = DataPointsFilterRegistrar.register


def neighborhood_eigens(points, mask, ids, dists):
    """Batched neighborhood statistics.

    Given kNN results (ids [N,k], dists [N,k]; +inf = missing), returns
    (mean [N,d], eigenvalues [N,d] ascending, eigenvectors [N,d,d] columns,
    counts [N], max_centered_norm [N]) of each point's neighbor set."""
    valid = jnp.isfinite(dists)  # [N,k]
    idsc = jnp.maximum(ids, 0)
    nb = points[idsc]  # [N,k,d]
    w = valid.astype(points.dtype)[..., None]  # [N,k,1]
    count = jnp.maximum(jnp.sum(valid, axis=1), 1)  # [N]
    mean = jnp.sum(nb * w, axis=1) / count[:, None]
    centered = (nb - mean[:, None, :]) * w
    # C = Σ centered centeredᵀ  → [N,d,d]
    C = jnp.einsum("nkd,nke->nde", centered, centered)
    eigva, eigve = jnp.linalg.eigh(C)
    max_norm = jnp.max(
        jnp.where(valid, jnp.linalg.norm(centered, axis=-1), 0.0), axis=1
    )
    return mean, eigva, eigve, count, max_norm


def density_from_neighborhood(count, max_norm):
    """points / sphere volume of the neighborhood
    (reference: DataPointsFilters/utils/utils.h computeDensity)."""
    volume = (4.0 / 3.0) * math.pi * jnp.maximum(max_norm, 1e-12) ** 3
    return count / volume


@_reg
class SurfaceNormalDataPointsFilter(DataPointsFilter):
    """Per-point surface normals from kNN covariance eigendecomposition
    (reference: DataPointsFilters/SurfaceNormal.cpp, \\cite{Rusinkiewicz2001}).

    Adds (per flags): 'normals' [d], 'densities' [1], 'eigValues' [d]
    (ascending), 'eigVectors' [d·d] (row-major rows = eigenvectors),
    'matchedIds' [knn], 'meanDists' [1]."""

    PARAMS = (
        Param("knn", "number of nearest neighbors to consider, including the "
              "point itself", int, 5, min=3),
        Param("maxDist", "maximum distance to consider for neighbors", float,
              "inf", min=0.0),
        Param("epsilon", "approximation for the nearest-neighbor search "
              "(parity parameter; search is exact)", float, 0.0, min=0.0),
        Param("keepNormals", "add normals to the output", bool, True),
        Param("keepDensities", "add densities to the output", bool, False),
        Param("keepEigenValues", "add eigen values to the output", bool, False),
        Param("keepEigenVectors", "add eigen vectors to the output", bool, False),
        Param("keepMatchedIds", "add matched point ids to the output", bool, False),
        Param("keepMeanDist", "add distance to the neighborhood mean", bool, False),
        Param("sortEigen", "sort eigenvalues ascending (always true here: "
              "batched eigh returns ascending order)", bool, False),
        Param("smoothNormals", "average the normal with the nearest neighbors",
              bool, False),
    )

    def filter(self, cloud, key=None):
        d = cloud.dim
        # Large clouds: the dense self-sweep is O(N²); above the measured
        # crossover the bounded tile sweep + dense fallback serves the
        # same exact contract (ops/knn_self.py).
        from ..ops.knn_self import CULL_MIN_POINTS, knn_self_culled

        if cloud.count_host() >= CULL_MIN_POINTS:
            dists, ids = knn_self_culled(
                cloud.points, cloud.mask, k=int(self.knn),
                max_dist=float(self.maxDist),
            )
        else:
            dists, ids = knn_search(
                cloud.points, cloud.mask, cloud.points, cloud.mask,
                k=self.knn
            )
            if self.maxDist != float("inf"):
                keep = dists <= jnp.float32(self.maxDist) ** 2
                dists = jnp.where(keep, dists, jnp.inf)
                ids = jnp.where(keep, ids, -1)
        mean, eigva, eigve, count, max_norm = neighborhood_eigens(
            cloud.points, cloud.mask, ids, dists
        )
        # Degenerate neighborhoods: the reference zeroes the outputs when
        # rank(C) < d-1 (SurfaceNormal.cpp:193-217). Detect via the second
        # smallest eigenvalue relative to the largest.
        lam_max = jnp.maximum(eigva[:, -1], 1e-30)
        degenerate = eigva[:, 1] <= lam_max * 1e-9
        out = cloud
        if self.keepNormals:
            normal = eigve[:, :, 0]  # smallest-eigenvalue eigenvector
            normal = jnp.clip(normal, -1.0, 1.0)
            normal = jnp.where(degenerate[:, None], 0.0, normal)
            if self.smoothNormals:
                valid = jnp.isfinite(dists)
                nb_n = normal[jnp.maximum(ids, 0)]  # [N,k,d]
                sign = jnp.where(
                    jnp.sum(nb_n * normal[:, None, :], axis=-1) > 0.0, 1.0, -1.0
                )
                acc = jnp.sum(
                    nb_n * sign[..., None] * valid[..., None], axis=1
                )
                normal = acc / count[:, None]
            out = out.with_descriptor("normals", normal)
        if self.keepDensities:
            dens = density_from_neighborhood(count, max_norm)
            dens = jnp.where(degenerate, 0.0, dens)
            out = out.with_descriptor("densities", dens)
        if self.keepEigenValues:
            out = out.with_descriptor(
                "eigValues", jnp.where(degenerate[:, None], 0.0, eigva)
            )
        if self.keepEigenVectors:
            # serialize the eigenvector matrix row-major: segment k holds
            # component k of every eigenvector (columns are eigenvectors),
            # matching utils.h serializeEigVec.
            ser = eigve.reshape(-1, d * d)
            ser = jnp.where(degenerate[:, None], 0.0, ser)
            out = out.with_descriptor("eigVectors", ser)
        if self.keepMatchedIds:
            out = out.with_descriptor("matchedIds", ids.astype(jnp.float32))
        if self.keepMeanDist:
            md = jnp.linalg.norm(cloud.points - mean, axis=1)
            md = jnp.where(degenerate, jnp.float32(np.float32(2**31)), md)
            out = out.with_descriptor("meanDists", md)
        return out


def _median_split_boxes(points: np.ndarray, knn: int) -> np.ndarray:
    """Largest-extent median split until ≤ knn points per box
    (reference: SamplingSurfaceNormal.cpp buildNew). Host-side; returns a box
    id per point.

    Level-synchronous vectorization: all boxes of a level split together —
    one lexsort by (box, cut coordinate) per level instead of one
    argpartition per box (~10x faster on the 25k-point reference clouds,
    which sit on the host critical path of every registration)."""
    n, d = points.shape
    if n == 0:
        return np.zeros(0, np.int64)
    # invariant: `order` keeps points grouped by box; `box_of` is the compact
    # per-point box id aligned with `order`; splitting by (box, key) lexsort
    # preserves the grouping so only ONE O(n log n) sort runs per level.
    order = np.arange(n)
    box_of = np.zeros(n, dtype=np.int64)
    arange_n = np.arange(n)
    while True:
        # group boundaries along `order`
        change = np.empty(n, bool)
        change[0] = True
        np.not_equal(box_of[1:], box_of[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        if sizes.max() <= knn:
            break
        coords = points[order]
        mins = np.minimum.reduceat(coords, starts, axis=0)
        maxs = np.maximum.reduceat(coords, starts, axis=0)
        cut_dim = np.argmax(maxs - mins, axis=1)  # per box
        start_of = np.repeat(starts, sizes)
        size_of = np.repeat(sizes, sizes)
        key = coords[arange_n, np.repeat(cut_dim, sizes)]
        # boxes small enough don't split: force a constant key
        frozen = size_of <= knn
        key = np.where(frozen, 0.0, key)
        sort = np.lexsort((key, box_of))
        order = order[sort]
        rank = arange_n - start_of  # start_of aligned with sorted groups
        left_count = size_of - size_of // 2
        child = np.where(frozen, 0, (rank >= left_count).astype(np.int64))
        new_box = 2 * box_of + child
        # compact: new_box is non-decreasing along order
        box_of = np.cumsum(
            np.concatenate(([0], (np.diff(new_box) != 0).astype(np.int64)))
        )
    out = np.empty(n, np.int64)
    out[order] = box_of
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_boxes", "method", "avg", "kn", "kd", "kev",
                     "kevec"),
)
def _ssn_device(pts, mask, seg, descs, key, ratio, max_box_dim, first, *,
                num_boxes, method, avg, kn, kd, kev, kevec):
    """SamplingSurfaceNormal's whole device portion as ONE program.

    Eager dispatch of the ~20 segment/eigh ops cost ~5 ms each through the
    TPU relay (measured dominating one-shot latency); fused they are one
    dispatch. Operates on PADDED rows: ``seg`` routes masked rows into a
    reserved drop segment (``num_boxes - 1``) and ``keep`` is masked, so
    this tail is jit-safe inside larger programs (the one-shot fused
    reference-prep path). ``num_boxes`` is the bucketed box count + the
    drop segment (coarse recompile ladder); ``first`` is the per-box
    first-occurrence row (method 1), padded with n (dropped by the
    scatter)."""
    n, d = pts.shape
    ones = mask.astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_boxes)  # [B]
    sums = jax.ops.segment_sum(pts, seg, num_boxes)  # [B,d]
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    centered = pts - means[seg]
    outer = centered[:, :, None] * centered[:, None, :]  # [n,d,d]
    C = jax.ops.segment_sum(outer.reshape(n, d * d), seg, num_boxes)
    C = C.reshape(num_boxes, d, d)
    eigva, eigve = jnp.linalg.eigh(C)

    box_min = jax.ops.segment_min(pts, seg, num_boxes)
    box_max = jax.ops.segment_max(pts, seg, num_boxes)
    box_dim = jnp.max(box_max - box_min, axis=1)
    max_cnorm = jax.ops.segment_max(
        jnp.linalg.norm(centered, axis=1), seg, num_boxes
    )

    lam_max = jnp.maximum(eigva[:, -1], 1e-30)
    degenerate = eigva[:, 1] <= lam_max * 1e-9
    unfit = jnp.logical_or(degenerate, box_dim > max_box_dim)  # [B]

    normals = jnp.clip(eigve[:, :, 0], -1.0, 1.0)
    volume = (4.0 / 3.0) * math.pi * jnp.maximum(max_cnorm, 1e-12) ** 3
    densities = counts / volume
    ser = eigve.reshape(num_boxes, d * d)

    if method == 0:
        r = jax.random.uniform(key, (n,))
        keep = jnp.logical_and(r < ratio, jnp.logical_not(unfit[seg]))
        new_pts = pts
        desc_src = dict(descs)
    else:
        # one representative per box at the box mean
        keep = jnp.zeros((n,), bool).at[first].set(True, mode="drop")
        keep = jnp.logical_and(keep, jnp.logical_not(unfit[seg]))
        new_pts = means[seg]
        new_pts = jnp.where(mask[:, None], new_pts, pts)
        desc_src = {}
        for k, v in descs.items():
            if avg:
                dsum = jax.ops.segment_sum(v, seg, num_boxes)
                desc_src[k] = (dsum / jnp.maximum(counts, 1.0)[:, None])[seg]
            else:
                desc_src[k] = v

    keep = jnp.logical_and(keep, mask)
    out = dict(desc_src)
    if kn:
        out["normals"] = normals[seg]
    if kd:
        out["densities"] = densities[seg][:, None]
    if kev:
        out["eigValues"] = eigva[seg]
    if kevec:
        out["eigVectors"] = ser[seg]
    return new_pts, keep, out


@_reg
class SamplingSurfaceNormalDataPointsFilter(DataPointsFilter):
    """Subsample + estimate normals per kd-box decomposition
    (reference: DataPointsFilters/SamplingSurfaceNormal.cpp; the default
    reference-cloud filter, ICP.cpp:106).

    TPU design: the median-split decomposition runs on host (numpy,
    O(N log N)); the per-box covariance/eigen statistics, the fitness
    tests and the subsampling draw are one fused device program
    (``_ssn_device``)."""

    PARAMS = (
        Param("ratio", "ratio of points to keep with random subsampling",
              float, 0.5, min=0.0000001, max=1.0),
        Param("knn", "number of points per box used to compute the normals "
              "(box split threshold)", int, 7, min=3),
        Param("samplingMethod", "0: random subsampling with ratio; 1: bin "
              "subsampling, one point (the box centroid) per box", int, 0,
              min=0, max=1),
        Param("maxBoxDim", "maximum length of a box above which it is "
              "discarded", float, "inf"),
        Param("averageExistingDescriptors", "average existing descriptors "
              "over the box (1) or keep the first point's (0)", bool, True),
        Param("keepNormals", "add normals to the output", bool, True),
        Param("keepDensities", "add densities to the output", bool, False),
        Param("keepEigenValues", "add eigen values to the output", bool, False),
        Param("keepEigenVectors", "add eigen vectors to the output", bool, False),
    )

    #: host-prep protocol: the data-dependent structure (box split) is
    #: computed on host, the rest is a jit-safe tail — the one-shot engine
    #: fuses the tail into its single-program path (see icp.py)
    HOST_PREP = True

    def prepare_host(self, pts_h: np.ndarray, mask_h: np.ndarray) -> dict:
        """Median-split box assignment from padded host rows; numpy only,
        zero device syncs. Returns the aux arrays :meth:`filter_traced`
        consumes (shapes bucketed so downstream programs recompile on a
        coarse ladder)."""
        from ..cloud import bucket_size

        n_pad = len(pts_h)
        valid = np.flatnonzero(mask_h)
        if len(valid) == 0:
            return {
                "seg": np.zeros(n_pad, np.int64),
                "first": np.full(16, n_pad, np.int64),
                "num_boxes": 16,
                "_num_real_boxes": 0,
            }
        box_ids = _median_split_boxes(
            np.asarray(pts_h, np.float64)[valid], int(self.knn)
        )
        num_boxes = int(box_ids.max()) + 1
        # +1 reserves the drop segment for masked rows
        nb_pad = int(bucket_size(num_boxes + 1, granule=256))
        seg = np.full(n_pad, nb_pad - 1, np.int64)   # masked rows → drop
        seg[valid] = box_ids
        first_pad = np.full(nb_pad, n_pad, dtype=np.int64)  # n_pad → dropped
        if self.samplingMethod != 0:
            # first occurrence of each (compact, 0..B-1) box id — box ids
            # are assigned in sorted order so unique's indices line up
            _, first_idx = np.unique(box_ids, return_index=True)
            first_pad[: len(first_idx)] = valid[first_idx]
        return {
            "seg": seg,
            "first": first_pad,
            "num_boxes": nb_pad,
            "_num_real_boxes": num_boxes,
        }

    def filter_traced(self, cloud, aux, key=None):
        """Jit-safe tail: one fused device computation over padded rows."""
        if key is None:
            key = jax.random.PRNGKey(0)
        new_pts, keep, descs = _ssn_device(
            cloud.points,
            cloud.mask,
            jnp.asarray(aux["seg"]),
            dict(cloud.descriptors),
            key,
            jnp.float32(self.ratio),
            jnp.float32(self.maxBoxDim),
            jnp.asarray(aux["first"]),
            num_boxes=int(aux["num_boxes"]),
            method=int(self.samplingMethod),
            avg=bool(self.averageExistingDescriptors),
            kn=bool(self.keepNormals),
            kd=bool(self.keepDensities),
            kev=bool(self.keepEigenValues),
            kevec=bool(self.keepEigenVectors),
        )
        return PointCloud(new_pts, keep, descs, dict(cloud.times))

    def survivor_bound(self, n_valid: int, aux: dict) -> int:
        """Upper bound on surviving points (static compaction cap sizing):
        method 1 keeps at most one point per real box; method 0's binomial
        draw stays under mean + 6σ with ~1e-9 tail probability (overflow is
        detected in-program and falls back, never silently truncated)."""
        if self.samplingMethod != 0:
            return int(aux["_num_real_boxes"])
        p = float(self.ratio)
        return int(n_valid * p + 6.0 * np.sqrt(n_valid * p * (1 - p)) + 1)

    def filter(self, cloud, key=None):
        pts_h, mask_h = cloud.host_rows()
        aux = self.prepare_host(pts_h, mask_h)
        return self.filter_traced(cloud, aux, key)


@_reg
class SphericalityDataPointsFilter(DataPointsFilter):
    """Local shape descriptor from eigenvalues: −1 = plane … +1 = uniform
    (reference: DataPointsFilters/Sphericality.cpp; 3D only, needs
    'eigValues' from a prior SurfaceNormal pass)."""

    PARAMS = (
        Param("keepUnstructureness", "keep the unstructureness value", bool,
              False),
        Param("keepStructureness", "keep the structureness value", bool, False),
    )

    def filter(self, cloud, key=None):
        if cloud.dim != 3:
            raise InvalidField("SphericalityDataPointsFilter: works only in 3D")
        if not cloud.has_descriptor("eigValues"):
            raise InvalidField(
                "SphericalityDataPointsFilter: no eigValues found; run "
                "SurfaceNormalDataPointsFilter with keepEigenValues first"
            )
        eig = cloud.get_descriptor("eigValues")  # ascending [N,3]
        lam1 = eig[:, 2]
        lam2 = eig[:, 1]
        lam3 = eig[:, 0]
        # unstructureness: sphericality of the distribution; structureness:
        # planarity (reference: Sphericality.cpp sphericality = unstr - str)
        denom1 = jnp.maximum(lam1, 1e-20)
        unstructureness = lam3 / denom1
        denom2 = jnp.maximum(lam1 * lam2, 1e-20)
        structureness = (lam2 / denom1) * ((lam2 - lam3) / jnp.sqrt(denom2))
        sph = unstructureness - structureness
        bad = jnp.logical_or(lam1 <= 0, jnp.isnan(sph))
        sph = jnp.where(bad, jnp.nan, sph)
        out = cloud.with_descriptor("sphericality", sph)
        if self.keepUnstructureness:
            out = out.with_descriptor("unstructureness", unstructureness)
        if self.keepStructureness:
            out = out.with_descriptor("structureness", structureness)
        return out
