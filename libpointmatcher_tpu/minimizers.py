"""Error minimizers: weighted matched pairs → incremental transformation.

Capability parity with the reference minimizer layer
(reference: PointMatcher.h:527-577, pointmatcher/ErrorMinimizers/). Where the
reference first gathers the weight≠0 pairs into dense ``ErrorElements``
buffers (reference: ErrorMinimizer.cpp:59-193), the TPU design keeps every
pair in place and carries an **effective weight** that is zero for rejected or
invalid pairs — all reductions below are weighted sums, so rejected pairs
contribute nothing and every shape stays static under ``jax.jit``.

Minimizers return ``(T, MinimizerStats)`` where the stats reproduce the
reference's introspection values (pointUsedRatio, weightedPointUsedRatio —
reference: ErrorMinimizer.cpp:139-140 — and the residual)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .cloud import PointCloud
from .matchers import Matches
from .registry import Param, Parametrizable, Registrar
from .utils import se3

__all__ = [
    "ErrorMinimizer",
    "ErrorMinimizerRegistrar",
    "MinimizerStats",
    "Pairs",
    "make_pairs",
]

ErrorMinimizerRegistrar = Registrar("ErrorMinimizer")


class MinimizerStats(NamedTuple):
    point_used_ratio: jnp.ndarray  # scalar
    weighted_point_used_ratio: jnp.ndarray  # scalar
    residual: jnp.ndarray  # scalar
    covariance: object = None  # [6,6] for the WithCov minimizers, else None
    # rejection counters (reference: ErrorMinimizer.cpp:186-187); plain-int
    # defaults so importing the package does not touch the JAX backend
    nb_rejected_matches: object = 0
    nb_rejected_points: object = 0
    # running max over iterations of the displacement bound any reading
    # point can have undergone vs its initial pose (tracked by the fused
    # loop when a bounded-search matcher declares a motionBound; None on
    # paths that do not track it — see icp.make_loop_runner)
    motion_max: object = None


class Pairs(NamedTuple):
    """Flat matched-pair view, one row per (reading point, match) pair."""

    w: jnp.ndarray  # [P] effective weight (0 = rejected/invalid)
    read: jnp.ndarray  # [P, d] reading points
    ref: jnp.ndarray  # [P, d] matched reference points
    ids: jnp.ndarray  # [P] reference row ids (clamped to 0 when invalid)
    valid: jnp.ndarray  # [P] bool
    dists: jnp.ndarray  # [P] squared distances


def make_pairs(reading: PointCloud, reference: PointCloud, weights, matches: Matches) -> Pairs:
    """Masked equivalent of the ErrorElements gather
    (reference: ErrorMinimizer.cpp:59-193)."""
    n, k = matches.dists.shape
    d = reading.dim
    valid = jnp.logical_and(jnp.isfinite(matches.dists), weights != 0.0)
    w = jnp.where(valid, weights, 0.0).reshape(-1)
    ids = jnp.maximum(matches.ids, 0)
    read = jnp.broadcast_to(reading.points[:, None, :], (n, k, d)).reshape(-1, d)
    ref = reference.points[ids].reshape(-1, d)
    return Pairs(
        w=w,
        read=read,
        ref=ref,
        ids=ids.reshape(-1),
        valid=valid.reshape(-1),
        dists=jnp.where(valid, matches.dists, 0.0).reshape(-1),
    )


def _used_ratios(reading: PointCloud, weights, matches: Matches):
    """pointUsedRatio / weightedPointUsedRatio with the reference's
    denominator knn·(filtered reading count) (ErrorMinimizer.cpp:139-140)."""
    k = matches.dists.shape[1]
    valid = jnp.logical_and(jnp.isfinite(matches.dists), weights != 0.0)
    denom = jnp.maximum(k * reading.count(), 1).astype(jnp.float32)
    return jnp.sum(valid) / denom, jnp.sum(jnp.where(valid, weights, 0.0)) / denom


def rejection_counts(reading: PointCloud, weights, matches: Matches):
    """(nbRejectedMatches, nbRejectedPoints): finite-distance pairs whose
    weight is zero, and valid reading points with no surviving pair at all
    (reference: ErrorMinimizer.cpp:101-135)."""
    finite = jnp.isfinite(matches.dists)
    kept = jnp.logical_and(finite, weights != 0.0)
    rejected_matches = jnp.sum(
        jnp.logical_and(finite, weights == 0.0)
    ).astype(jnp.int32)
    point_has_match = jnp.any(kept, axis=1)
    rejected_points = jnp.sum(
        jnp.logical_and(reading.mask, jnp.logical_not(point_has_match))
    ).astype(jnp.int32)
    return rejected_matches, rejected_points


def gather_pair_descriptor(cloud_desc, pairs: Pairs, side: str, knn: int):
    """Descriptor values per pair: reading-side repeats, reference-side gathers."""
    if side == "reading":
        n = cloud_desc.shape[0]
        sp = cloud_desc.shape[1]
        return jnp.broadcast_to(
            cloud_desc[:, None, :], (n, knn, sp)
        ).reshape(-1, sp)
    return cloud_desc[pairs.ids]


def solve_possibly_underdetermined(A, b):
    """Minimal-norm solve of the (symmetric PSD) normal equations.

    The reference branches: Cholesky when invertible, else rank-reduced QR
    minimal-norm solution with a double-precision SVD fallback
    (reference: PointToPlane.cpp:108-161). Inside jit we use the branch-free
    equivalent — eigendecomposition pseudo-inverse (fused cyclic Jacobi,
    utils/smalleig.py) with a relative rank cutoff — which equals the
    Cholesky solution at full rank and the minimal-norm solution when
    singular (the ``icpSingular`` oracle).

    ``PMTPU_SOLVE=chol`` switches to a ridged unrolled Cholesky — a
    round-4 experiment with ~3x shorter sequential depth that did NOT
    survive scrutiny as a default: although the normal equations are
    consistent in exact arithmetic (b = Fᵀr ∈ range(FᵀF)), f32 rounding
    leaves O(eps·‖A‖·‖x‖) right-hand components along exactly-singular
    directions, and the ridge AMPLIFIES them by 1/λ (measured ~0.9
    relative error on the singular contract test) where the rank cutoff
    zeroes them; its standalone chip timing was also no faster than the
    Jacobi it meant to replace (tools/minimizer_micro.py)."""
    import os

    p = A.shape[0]
    if os.environ.get("PMTPU_SOLVE", "") != "chol":
        from .utils.smalleig import eigh_jacobi

        w, V = eigh_jacobi(A)
        tol = jnp.max(jnp.abs(w)) * p * 1e-7
        winv = jnp.where(w > tol, 1.0 / jnp.where(w > tol, w, 1.0), 0.0)
        return V @ (winv * (V.T @ b))

    lam = jnp.trace(A) / p * 3e-7 + 1e-30
    # unrolled Cholesky of A + λI (static python loops → fused scalar
    # graph; every quantity is a 0-d array so the whole solve vmaps)
    L = [[None] * p for _ in range(p)]
    inv_d = [None] * p
    for k in range(p):
        s = A[k, k] + lam
        for j in range(k):
            s = s - L[k][j] * L[k][j]
        dk = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[k][k] = dk
        inv_d[k] = 1.0 / dk
        for i in range(k + 1, p):
            si = A[i, k]
            for j in range(k):
                si = si - L[i][j] * L[k][j]
            L[i][k] = si * inv_d[k]
    # forward substitution L y = b
    y = [None] * p
    for i in range(p):
        s = b[i]
        for j in range(i):
            s = s - L[i][j] * y[j]
        y[i] = s * inv_d[i]
    # back substitution Lᵀ x = y
    x = [None] * p
    for i in reversed(range(p)):
        s = y[i]
        for j in range(i + 1, p):
            s = s - L[j][i] * x[j]
        x[i] = s * inv_d[i]
    return jnp.stack(x)



def build_stats(reading, weights, matches, residual, covariance=None):
    pr, wr = _used_ratios(reading, weights, matches)
    rm, rp = rejection_counts(reading, weights, matches)
    return MinimizerStats(pr, wr, residual, covariance, rm, rp)

class ErrorMinimizer(Parametrizable):
    """Interface (reference: PointMatcher.h:527-577)."""

    #: whether compute() fills MinimizerStats.covariance (WithCov variants)
    PRODUCES_COVARIANCE = False

    def compute(self, reading, reference, weights, matches):
        raise NotImplementedError

    def residual_error(self, reading, reference, weights, matches):
        pairs = make_pairs(reading, reference, weights, matches)
        return self._residual(pairs, reading, reference)

    def _residual(self, pairs: Pairs, reading, reference):
        # Default: point-to-point residual Σ‖Δ‖ over kept pairs
        # (reference: PointToPoint.cpp:155-164 — unweighted).
        delta = pairs.read - pairs.ref
        norms = jnp.linalg.norm(delta, axis=1)
        return jnp.sum(jnp.where(pairs.valid, norms, 0.0))


@ErrorMinimizerRegistrar.register
class IdentityErrorMinimizer(ErrorMinimizer):
    """Returns the identity transform (reference: ErrorMinimizers/Identity.cpp)."""

    def compute(self, reading, reference, weights, matches):
        d = reading.dim
        T = jnp.eye(d + 1, dtype=reading.points.dtype)
        return T, build_stats(reading, weights, matches, jnp.float32(0.0))


def _kabsch(pairs: Pairs, d: int, with_scale: bool = False):
    """Weighted Kabsch/Umeyama solve shared by the point-to-point family
    (reference: PointToPoint.cpp:62-101, PointToPointSimilarity.cpp:60-97)."""
    w = pairs.w
    wsum = jnp.maximum(jnp.sum(w), 1e-20)
    mean_read = jnp.sum(w[:, None] * pairs.read, axis=0) / wsum
    mean_ref = jnp.sum(w[:, None] * pairs.ref, axis=0) / wsum
    rc = pairs.read - mean_read
    fc = pairs.ref - mean_ref
    # cross-covariance m = referenceᵀ·diag(w)·reading  → [d, d]
    m = (fc * w[:, None]).T @ rc
    U, S, Vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(U @ Vt)
    # Sorkine reflection fix: flip the last right-singular vector when the
    # proper rotation requires it (reference: PointToPoint.cpp:86-94).
    flip = jnp.where(det < 0.0, -1.0, 1.0)
    D = jnp.ones((d,), m.dtype).at[-1].set(flip)
    R = (U * D[None, :]) @ Vt
    if with_scale:
        sigma = jnp.sum(w * jnp.sum(rc * rc, axis=1))
        s_signed = S.at[-1].multiply(flip)
        scale = jnp.sum(s_signed) / jnp.maximum(sigma, 1e-20)
        scale = jnp.where(sigma < 1e-4, 1.0, scale)
        t = mean_ref - scale * (R @ mean_read)
        return se3.from_rt(scale * R, t)
    t = mean_ref - R @ mean_read
    return se3.from_rt(R, t)


@ErrorMinimizerRegistrar.register
class PointToPointErrorMinimizer(ErrorMinimizer):
    """Weighted Kabsch rigid solve (reference: ErrorMinimizers/PointToPoint.cpp,
    \\cite{Besl1992Point2Point})."""

    def compute(self, reading, reference, weights, matches):
        pairs = make_pairs(reading, reference, weights, matches)
        T = _kabsch(pairs, reading.dim, with_scale=False)
        return T, build_stats(
            reading, weights, matches, self._residual(pairs, reading, reference)
        )


@ErrorMinimizerRegistrar.register
class PointToPointSimilarityErrorMinimizer(ErrorMinimizer):
    """Umeyama similarity solve — rotation, translation and uniform scale
    (reference: ErrorMinimizers/PointToPointSimilarity.cpp)."""

    def compute(self, reading, reference, weights, matches):
        pairs = make_pairs(reading, reference, weights, matches)
        T = _kabsch(pairs, reading.dim, with_scale=True)
        return T, build_stats(
            reading, weights, matches, self._residual(pairs, reading, reference)
        )


class _PointToPlaneBase(ErrorMinimizer):
    PARAMS = (
        Param("force2D", "force minimization in the XY plane for 3D input",
              bool, False),
        Param("force4DOF", "yaw-only rotation (z axis) + 3D translation "
              "(reference: PointToPlane.cpp:197-210)", bool, False),
    )

    def __init__(self, params=None):
        super().__init__(params)
        if self.force2D and self.force4DOF:
            from .errors import InvalidParameter

            raise InvalidParameter(
                "force2D and force4DOF are mutually exclusive"
            )

    def _solve(self, reading, reference, weights, matches):
        d = reading.dim
        knn = matches.dists.shape[1]
        # ONE fused row gather for ref positions + normals: two separate
        # [P]-row gathers measured 2.53 ms per serving batch-iteration vs
        # 1.88 fused (tools/minimizer_micro.py); the concat is
        # loop-invariant (the reference is static inside the fixed-point
        # loop) so XLA hoists it
        nrm_src = reference.get_descriptor("normals")
        fused_src = jnp.concatenate([reference.points, nrm_src], axis=1)
        n, k = matches.dists.shape
        valid = jnp.logical_and(
            jnp.isfinite(matches.dists), weights != 0.0)
        ids = jnp.maximum(matches.ids, 0)
        gathered = fused_src[ids].reshape(-1, fused_src.shape[1])
        pairs = Pairs(
            w=jnp.where(valid, weights, 0.0).reshape(-1),
            read=jnp.broadcast_to(
                reading.points[:, None, :], (n, k, d)).reshape(-1, d),
            ref=gathered[:, :d],
            ids=ids.reshape(-1),
            valid=valid.reshape(-1),
            dists=jnp.where(valid, matches.dists, 0.0).reshape(-1),
        )
        normals = gathered[:, d:d + nrm_src.shape[1]]  # [P, d]
        w = pairs.w
        delta = pairs.read - pairs.ref

        if d == 2 or self.force2D:
            if self.force2D and d == 3:
                read2 = pairs.read[:, :2]
                nrm = normals[:, :2]
                delta2 = delta[:, :2]
            else:
                read2 = pairs.read
                nrm = normals
                delta2 = delta
            # 2D pseudo-cross: x·ny − y·nx (reference: ErrorMinimizer.cpp:305-311)
            cross = read2[:, 0] * nrm[:, 1] - read2[:, 1] * nrm[:, 0]
            F = jnp.concatenate([cross[:, None], nrm], axis=1)  # [P, 3]
            dot = jnp.sum(delta2 * nrm, axis=1)
        elif self.force4DOF:
            # Γ-matrix trick: d(R_z p)/dγ · n = (Γp)·n with Γ=[[0,-1,0],[1,0,0],[0,0,0]]
            # (reference: PointToPlane.cpp:205-210)
            gp = jnp.stack(
                [-pairs.read[:, 1], pairs.read[:, 0], jnp.zeros_like(pairs.read[:, 0])],
                axis=1,
            )
            cross = jnp.sum(gp * normals, axis=1)
            F = jnp.concatenate([cross[:, None], normals], axis=1)  # [P, 4]
            dot = jnp.sum(delta * normals, axis=1)
        else:
            cross = jnp.cross(pairs.read, normals)  # [P, 3]
            F = jnp.concatenate([cross, normals], axis=1)  # [P, 6]
            dot = jnp.sum(delta * normals, axis=1)

        wF = w[:, None] * F
        A = wF.T @ F  # [p, p] normal matrix (reference: PointToPlane.cpp:213-230)
        b = -(wF.T @ dot)
        x = solve_possibly_underdetermined(A, b)

        dtype = reading.points.dtype
        if d == 2:
            R = se3.rot2d(x[0]).astype(dtype)
            T = se3.from_rt(R, x[1:3])
        elif self.force2D:
            R3 = jnp.eye(3, dtype=dtype)
            R2 = se3.rot2d(x[0]).astype(dtype)
            R3 = R3.at[:2, :2].set(R2)
            t = jnp.concatenate([x[1:3], jnp.zeros((1,), dtype)])
            T = se3.from_rt(R3, t)
        elif self.force4DOF:
            R = se3.rodrigues(jnp.array([0.0, 0.0, 1.0], dtype) * x[0])
            T = se3.from_rt(R, x[1:4])
        else:
            R = se3.rodrigues(x[:3])
            T = se3.from_rt(R, x[3:6])
        return T, pairs, normals, dot


@ErrorMinimizerRegistrar.register
class PointToPlaneErrorMinimizer(_PointToPlaneBase):
    """Linearized point-to-plane least squares
    (reference: ErrorMinimizers/PointToPlane.cpp, \\cite{Chen1991Point2Plane})."""

    def compute(self, reading, reference, weights, matches):
        T, pairs, normals, dot = self._solve(reading, reference, weights, matches)
        residual = jnp.sum(pairs.w * dot * dot)
        return T, build_stats(reading, weights, matches, residual)

    def residual_error(self, reading, reference, weights, matches):
        pairs = make_pairs(reading, reference, weights, matches)
        knn = matches.dists.shape[1]
        normals = gather_pair_descriptor(
            reference.get_descriptor("normals"), pairs, "reference", knn
        )
        dot = jnp.sum((pairs.read - pairs.ref) * normals, axis=1)
        return jnp.sum(pairs.w * dot * dot)


def _censi_covariance(pairs: Pairs, normals, T, sensor_std_dev):
    """Censi-style 6x6 covariance, vectorized over pairs
    (reference: PointToPlaneWithCov.cpp:73-162 and the point-to-point variant
    PointToPointWithCov.cpp:62-150, \\cite{Censi2007ICPCovariance})."""
    # Euler angles of the final transform (reference convention)
    beta = -jnp.arcsin(jnp.clip(T[2, 0], -1.0, 1.0))
    cosb = jnp.cos(beta)
    alpha = jnp.arctan2(T[2, 1], T[2, 2])
    gamma = jnp.arctan2(T[1, 0] / cosb, T[0, 0] / cosb)
    t = T[:3, 3]

    p = pairs.read  # [P,3]
    q = pairs.ref  # [P,3]
    n = normals  # [P,3]
    m = pairs.valid.astype(p.dtype)  # [P]

    rr = jnp.maximum(jnp.linalg.norm(p, axis=1), 1e-20)
    rd = p / rr[:, None]
    fr = jnp.maximum(jnp.linalg.norm(q, axis=1), 1e-20)
    fd = q / fr[:, None]

    n_abg = jnp.stack(
        [
            n[:, 2] * rd[:, 1] - n[:, 1] * rd[:, 2],
            n[:, 0] * rd[:, 2] - n[:, 2] * rd[:, 0],
            n[:, 1] * rd[:, 0] - n[:, 0] * rd[:, 1],
        ],
        axis=1,
    )  # [P,3]

    E = (
        n[:, 0] * (p[:, 0] - gamma * p[:, 1] + beta * p[:, 2] + t[0] - q[:, 0])
        + n[:, 1] * (gamma * p[:, 0] + p[:, 1] - alpha * p[:, 2] + t[1] - q[:, 1])
        + n[:, 2] * (-beta * p[:, 0] + alpha * p[:, 1] + p[:, 2] + t[2] - q[:, 2])
    )
    N_read = (
        n[:, 0] * (rd[:, 0] - gamma * rd[:, 1] + beta * rd[:, 2])
        + n[:, 1] * (gamma * rd[:, 0] + rd[:, 1] - alpha * rd[:, 2])
        + n[:, 2] * (-beta * rd[:, 0] + alpha * rd[:, 1] + rd[:, 2])
    )
    N_ref = -jnp.sum(n * fd, axis=1)

    v_h = jnp.concatenate([n, rr[:, None] * n_abg], axis=1)  # [P,6]
    J_hessian = (v_h * m[:, None]).T @ v_h

    coef_read = E + rr * N_read
    v_read = jnp.concatenate(
        [n * N_read[:, None], n_abg * coef_read[:, None]], axis=1
    )  # [P,6]
    v_ref = jnp.concatenate(
        [n * N_ref[:, None], (fr * N_ref)[:, None] * n_abg], axis=1
    )  # [P,6]
    d2 = (v_read * m[:, None]).T @ v_read + (v_ref * m[:, None]).T @ v_ref

    inv_h = jnp.linalg.pinv(J_hessian)
    cov = inv_h @ d2 @ inv_h
    return (sensor_std_dev * sensor_std_dev) * cov


@ErrorMinimizerRegistrar.register
class PointToPointWithCovErrorMinimizer(PointToPointErrorMinimizer):
    """PointToPoint + Censi covariance of the estimated transform
    (reference: ErrorMinimizers/PointToPointWithCov.cpp)."""

    PRODUCES_COVARIANCE = True
    PARAMS = (
        Param("sensorStdDev", "sensor noise standard deviation", float, 0.01,
              min=0.0),
    )

    def compute(self, reading, reference, weights, matches):
        T, stats = super().compute(reading, reference, weights, matches)
        pairs = make_pairs(reading, reference, weights, matches)
        ones = jnp.ones_like(pairs.read)
        cov = _censi_covariance(pairs, ones, T, self.sensorStdDev)
        return T, stats._replace(covariance=cov)


@ErrorMinimizerRegistrar.register
class PointToPlaneWithCovErrorMinimizer(PointToPlaneErrorMinimizer):
    """PointToPlane + Censi covariance of the estimated transform
    (reference: ErrorMinimizers/PointToPlaneWithCov.cpp)."""

    PRODUCES_COVARIANCE = True
    PARAMS = _PointToPlaneBase.PARAMS + (
        Param("sensorStdDev", "sensor noise standard deviation", float, 0.01,
              min=0.0),
    )

    def compute(self, reading, reference, weights, matches):
        T, pairs, normals, dot = self._solve(reading, reference, weights, matches)
        residual = jnp.sum(pairs.w * dot * dot)
        cov = _censi_covariance(pairs, normals, T, self.sensorStdDev)
        return T, build_stats(reading, weights, matches, residual, cov)


def estimate_overlap(reading, reference, weights, matches, weighted_ratio):
    """Overlap estimate given sensor-noise descriptors, parity with
    PointToPoint::getOverlap (reference: PointToPoint.cpp:119-152); falls back
    to the weighted point-used ratio when no noise information is present."""
    if not reading.has_descriptor("simpleSensorNoise"):
        return weighted_ratio
    pairs = make_pairs(reading, reference, weights, matches)
    knn = matches.dists.shape[1]
    noises = gather_pair_descriptor(
        reading.get_descriptor("simpleSensorNoise"), pairs, "reading", knn
    )[:, 0]
    dists = jnp.linalg.norm(pairs.read - pairs.ref, axis=1)
    nvalid = jnp.maximum(jnp.sum(pairs.valid), 1)
    mean = jnp.sum(jnp.where(pairs.valid, dists, 0.0)) / nvalid
    hit = jnp.logical_and(pairs.valid, dists < mean + noises)
    return jnp.sum(hit) / nvalid
