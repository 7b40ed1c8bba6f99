"""Transformation + checker unit tests (parity targets:
utest/ui/Transformations.cpp and the checker semantics of
TransformationCheckersImpl.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.checkers import (
    CODE_BOUND_ERROR,
    CODE_MAX_ITER,
    TransformationCheckerRegistrar as CReg,
)
from libpointmatcher_tpu.utils import se3


def rot3(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def make_T(R, t):
    d = R.shape[0]
    T = np.eye(d + 1, dtype=np.float32)
    T[:d, :d] = R
    T[:d, d] = t
    return jnp.asarray(T)


def cloud_with_dirs(n=100):
    rng = np.random.default_rng(0)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return pm.PointCloud.from_numpy(
        rng.normal(size=(n, 3)).astype(np.float32),
        {"normals": normals, "observationDirections": normals.copy(),
         "densities": rng.random(n).astype(np.float32)},
    )


def test_rigid_moves_points_and_rotates_directions():
    c = cloud_with_dirs()
    R = rot3([1, 2, 3], 0.7).astype(np.float32)
    t = np.array([1, -2, 3], np.float32)
    T = make_T(R, t)
    out = pm.RigidTransformation().compute(c, T)
    pts_in, descs_in, _ = c.to_numpy()
    pts_out, descs_out, _ = out.to_numpy()
    np.testing.assert_allclose(pts_out, pts_in @ R.T + t, rtol=1e-5, atol=1e-5)
    # directions rotate, scalars untouched
    np.testing.assert_allclose(
        descs_out["normals"], descs_in["normals"] @ R.T, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        descs_out["observationDirections"],
        descs_in["observationDirections"] @ R.T, rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(descs_out["densities"], descs_in["densities"])


def test_rigid_check_and_correct():
    rigid = pm.RigidTransformation()
    R = rot3([0, 0, 1], 0.3).astype(np.float32)
    good = make_T(R, np.zeros(3, np.float32))
    assert rigid.check_parameters(good)
    bad = make_T(R * 1.05, np.zeros(3, np.float32))  # det != 1
    assert not rigid.check_parameters(bad)
    fixed = rigid.correct_parameters(bad)
    assert rigid.check_parameters(fixed)
    np.testing.assert_allclose(np.asarray(fixed)[:3, :3], R, atol=1e-4)
    with pytest.raises(pm.TransformationError):
        rigid.compute_checked(cloud_with_dirs(), bad)


def test_similarity_scales():
    c = cloud_with_dirs()
    R = rot3([1, 0, 0], 0.2).astype(np.float32)
    T = make_T(1.5 * R, np.zeros(3, np.float32))
    out = pm.SimilarityTransformation().compute(c, T)
    pts_in, descs_in, _ = c.to_numpy()
    pts_out, descs_out, _ = out.to_numpy()
    np.testing.assert_allclose(pts_out, 1.5 * (pts_in @ R.T), rtol=1e-4,
                               atol=1e-4)
    # normals rotate WITHOUT scale
    np.testing.assert_allclose(
        np.linalg.norm(descs_out["normals"], axis=1), 1.0, atol=1e-4
    )


def test_pure_translation():
    c = cloud_with_dirs()
    R = rot3([0, 1, 0], 0.4).astype(np.float32)
    t = np.array([1, 2, 3], np.float32)
    T = make_T(R, t)
    out = pm.PureTranslation().compute(c, T)
    pts_in, _, _ = c.to_numpy()
    pts_out, _, _ = out.to_numpy()
    np.testing.assert_allclose(pts_out, pts_in + t, rtol=1e-5)
    corrected = pm.PureTranslation().correct_parameters(T)
    np.testing.assert_allclose(np.asarray(corrected)[:3, :3], np.eye(3))


# ----------------------------------------------------------------- checkers
def test_counter_checker():
    chk = CReg.create("CounterTransformationChecker", {"maxIterationCount": "3"})
    T = jnp.eye(4)
    st = chk.init_state(T)
    stops = []
    for i in range(3):
        st, stop, code = chk.check(st, T, i)
        stops.append((bool(stop), int(code)))
    assert stops == [(False, 0), (False, 0), (True, CODE_MAX_ITER)]


def test_differential_checker_converges():
    chk = CReg.create(
        "DifferentialTransformationChecker",
        {"minDiffRotErr": "0.01", "minDiffTransErr": "0.01",
         "smoothLength": "2"},
    )
    T = jnp.eye(4)
    st = chk.init_state(T)
    # constant transform → zero deltas → converge once window is full
    results = []
    for i in range(4):
        st, stop, code = chk.check(st, T, i)
        results.append(bool(stop))
    assert results[0] is False  # window not full yet
    assert results[-1] is True
    # large motion keeps iterating
    st = chk.init_state(T)
    for i in range(5):
        Tb = make_T(rot3([0, 0, 1], 0.3 * (i + 1)).astype(np.float32),
                    np.array([i, 0, 0], np.float32))
        st, stop, code = chk.check(st, Tb, i)
    assert not bool(stop)


def test_differential_checker_nan():
    chk = CReg.create("DifferentialTransformationChecker", {})
    T = jnp.eye(4)
    st = chk.init_state(T)
    bad = jnp.asarray(np.full((4, 4), np.nan, np.float32))
    for i in range(5):
        st, stop, code = chk.check(st, bad, i)
    assert bool(stop) and int(code) == 2


def test_bound_checker():
    chk = CReg.create(
        "BoundTransformationChecker",
        {"maxRotationNorm": "0.2", "maxTranslationNorm": "0.5"},
    )
    T0 = jnp.eye(4)
    st = chk.init_state(T0)
    ok = make_T(rot3([0, 0, 1], 0.1).astype(np.float32),
                np.array([0.3, 0, 0], np.float32))
    st, stop, code = chk.check(st, ok, 0)
    assert not bool(stop)
    too_far = make_T(np.eye(3, dtype=np.float32),
                     np.array([1.0, 0, 0], np.float32))
    st, stop, code = chk.check(st, too_far, 1)
    assert bool(stop) and int(code) == CODE_BOUND_ERROR


def test_se3_helpers():
    R = rot3([1, 1, 0], 0.6).astype(np.float32)
    t = np.array([1, 2, 3], np.float32)
    T = make_T(R, t)
    Tinv = se3.inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)
    # rodrigues round-trip
    w = np.array([0.1, -0.2, 0.3], np.float32)
    R2 = se3.rodrigues(jnp.asarray(w))
    angle = np.linalg.norm(w)
    np.testing.assert_allclose(
        np.asarray(se3.rotation_angle_between(R2, jnp.eye(3))), angle,
        atol=1e-5,
    )
    # zero rotation is exact
    np.testing.assert_allclose(
        np.asarray(se3.rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-7
    )
