"""Error-minimizer solver tests (parity target: utest/ui/ErrorMinimizers.cpp
plus the reference's analytic oracles: icpSingular, similarity scale)."""

import numpy as np
import jax.numpy as jnp
import pytest

from libpointmatcher_tpu import PointCloud
from libpointmatcher_tpu.matchers import Matches
from libpointmatcher_tpu.minimizers import (
    ErrorMinimizerRegistrar,
    PointToPlaneErrorMinimizer,
    PointToPointErrorMinimizer,
    PointToPointSimilarityErrorMinimizer,
)


def _exact_match_setup(read_pts, ref_pts):
    n = read_pts.shape[0]
    reading = PointCloud.from_numpy(read_pts)
    reference = PointCloud.from_numpy(ref_pts)
    cap_read = reading.num_points
    dists = np.full((cap_read, 1), np.inf, np.float32)
    ids = np.full((cap_read, 1), -1, np.int32)
    dists[:n, 0] = np.sum((read_pts - ref_pts) ** 2, axis=1)
    ids[:n, 0] = np.arange(n)
    weights = np.zeros((cap_read, 1), np.float32)
    weights[:n, 0] = 1.0
    return reading, reference, jnp.asarray(weights), Matches(
        jnp.asarray(dists), jnp.asarray(ids)
    )


def _rot3(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_point_to_point_recovers_rigid():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(200, 3)).astype(np.float32)
    R = _rot3([0.2, -1.0, 0.5], 0.3).astype(np.float32)
    t = np.array([0.5, -0.2, 1.0], np.float32)
    dst = src @ R.T + t
    reading, reference, w, matches = _exact_match_setup(src, dst)
    mini = PointToPointErrorMinimizer()
    T, stats = mini.compute(reading, reference, w, matches)
    T = np.asarray(T)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)
    assert float(stats.point_used_ratio) == pytest.approx(1.0)


def test_point_to_point_2d():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(100, 2)).astype(np.float32)
    a = 0.4
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    t = np.array([1.0, -2.0], np.float32)
    dst = src @ R.T + t
    reading, reference, w, matches = _exact_match_setup(src, dst)
    T, _ = PointToPointErrorMinimizer().compute(reading, reference, w, matches)
    T = np.asarray(T)
    np.testing.assert_allclose(T[:2, :2], R, atol=1e-4)
    np.testing.assert_allclose(T[:2, 2], t, atol=1e-4)


def test_similarity_recovers_scale():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(150, 3)).astype(np.float32)
    R = _rot3([1.0, 0.3, -0.2], -0.25).astype(np.float32)
    scale = 1.04
    t = np.array([0.1, 0.2, 0.3], np.float32)
    dst = scale * (src @ R.T) + t
    reading, reference, w, matches = _exact_match_setup(src, dst)
    T, _ = PointToPointSimilarityErrorMinimizer().compute(
        reading, reference, w, matches
    )
    T = np.asarray(T)
    got_scale = np.linalg.det(T[:3, :3]) ** (1 / 3)
    assert got_scale == pytest.approx(scale, abs=1e-3)


def test_point_to_plane_small_transform():
    rng = np.random.default_rng(3)
    # points on a gently curved surface with normals ~z
    xy = rng.uniform(-1, 1, size=(300, 2)).astype(np.float32)
    z = (0.1 * xy[:, 0] ** 2).astype(np.float32)
    src = np.column_stack([xy, z])
    R = _rot3([0.0, 0.0, 1.0], 0.05).astype(np.float32)
    t = np.array([0.02, -0.03, 0.05], np.float32)
    dst = src @ R.T + t
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (300, 1))
    reading, reference, w, matches = _exact_match_setup(src, dst)
    reference = reference.with_descriptor(
        "normals", np.vstack([normals, np.zeros((reference.num_points - 300, 3), np.float32)])
    )
    T, stats = PointToPlaneErrorMinimizer().compute(reading, reference, w, matches)
    T = np.asarray(T)
    # point-to-plane only constrains the normal direction: z-translation exact
    assert T[2, 3] == pytest.approx(0.05, abs=5e-3)


def test_point_to_plane_singular_exact_z():
    """The reference's icpSingular oracle (utest.cpp:162-198): an
    under-determined plane-to-plane problem must return the exact
    z-translation via the minimal-norm solution."""
    rng = np.random.default_rng(4)
    xy = rng.uniform(-2, 2, size=(400, 2)).astype(np.float32)
    src = np.column_stack([xy, np.zeros(400, np.float32)])
    dst = src.copy()
    dst[:, 2] += 0.5  # pure z shift
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (400, 1))
    reading, reference, w, matches = _exact_match_setup(src, dst)
    reference = reference.with_descriptor(
        "normals",
        np.vstack([normals, np.zeros((reference.num_points - 400, 3), np.float32)]),
    )
    T, _ = PointToPlaneErrorMinimizer().compute(reading, reference, w, matches)
    T = np.asarray(T)
    np.testing.assert_allclose(T[2, 3], 0.5, atol=1e-4)
    # rotation stays identity
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-4)


def test_identity_minimizer():
    rng = np.random.default_rng(5)
    src = rng.normal(size=(10, 3)).astype(np.float32)
    reading, reference, w, matches = _exact_match_setup(src, src)
    mini = ErrorMinimizerRegistrar.create("IdentityErrorMinimizer")
    T, _ = mini.compute(reading, reference, w, matches)
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_with_cov_minimizers_produce_covariance():
    rng = np.random.default_rng(6)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    dst = src + np.array([0.1, 0.0, 0.0], np.float32)
    reading, reference, w, matches = _exact_match_setup(src, dst)
    normals = rng.normal(size=(reference.num_points, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    reference = reference.with_descriptor("normals", normals)
    for name in ("PointToPointWithCovErrorMinimizer",
                 "PointToPlaneWithCovErrorMinimizer"):
        mini = ErrorMinimizerRegistrar.create(name)
        T, stats = mini.compute(reading, reference, w, matches)
        assert stats.covariance is not None
        cov = np.asarray(stats.covariance)
        assert cov.shape == (6, 6)
        assert np.all(np.isfinite(cov))
