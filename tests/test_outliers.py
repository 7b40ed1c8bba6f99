"""Outlier-filter unit tests (parity target: utest/ui/Outliers.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.matchers import Matches
from libpointmatcher_tpu.outlierfilters import (
    OutlierFilterRegistrar as Reg,
    compute_outlier_weights,
    init_outlier_states,
)


def make_matches(dists):
    dists = jnp.asarray(dists, jnp.float32)
    ids = jnp.where(
        jnp.isfinite(dists),
        jnp.arange(dists.shape[0], dtype=jnp.int32)[:, None],
        -1,
    )
    return Matches(dists, jnp.broadcast_to(ids, dists.shape).astype(jnp.int32))


def clouds(n, d=3):
    rng = np.random.default_rng(0)
    a = pm.PointCloud.from_numpy(rng.normal(size=(n, d)).astype(np.float32))
    b = pm.PointCloud.from_numpy(rng.normal(size=(n, d)).astype(np.float32))
    return a, b


def run_filter(name, params, matches, reading=None, reference=None):
    f = Reg.create(name, params)
    if reading is None:
        reading, reference = clouds(matches.dists.shape[0])
    w, _ = f.compute(reading, reference, matches, f.init_state())
    return np.asarray(w)


def test_null():
    m = make_matches([[1.0], [4.0], [9.0]])
    w = run_filter("NullOutlierFilter", {}, m)
    np.testing.assert_array_equal(w, 1.0)


def test_max_dist():
    m = make_matches([[1.0], [4.0], [9.0]])  # squared dists
    w = run_filter("MaxDistOutlierFilter", {"maxDist": "2.0"}, m)
    np.testing.assert_array_equal(w[:, 0], [1.0, 1.0, 0.0])


def test_min_dist():
    m = make_matches([[1.0], [4.0], [9.0]])
    w = run_filter("MinDistOutlierFilter", {"minDist": "2.0"}, m)
    np.testing.assert_array_equal(w[:, 0], [0.0, 1.0, 1.0])


def test_median_dist():
    m = make_matches([[1.0], [4.0], [9.0], [100.0]])
    # median (ref convention: element at n/2) = 9; factor 1 → keep ≤ 9
    w = run_filter("MedianDistOutlierFilter", {"factor": "1.0"}, m)
    np.testing.assert_array_equal(w[:, 0], [1.0, 1.0, 1.0, 0.0])


def test_trimmed_dist():
    m = make_matches([[float(i)] for i in range(1, 11)])
    w = run_filter("TrimmedDistOutlierFilter", {"ratio": "0.5"}, m)
    assert w.sum() == 6  # element at idx floor(10*0.5)=5 → dist 6 kept


def test_trimmed_ignores_infinite():
    m = make_matches([[1.0], [np.inf], [2.0], [np.inf]])
    w = run_filter("TrimmedDistOutlierFilter", {"ratio": "0.9999"}, m)
    assert w[0, 0] == 1.0 and w[2, 0] == 1.0
    assert w[1, 0] == 0.0 and w[3, 0] == 0.0


def test_var_trimmed():
    rng = np.random.default_rng(0)
    good = rng.uniform(0.01, 0.1, size=80)
    bad = rng.uniform(10, 20, size=20)
    dists = np.concatenate([good, bad])[:, None]
    m = make_matches(dists)
    w = run_filter(
        "VarTrimmedDistOutlierFilter",
        {"minRatio": "0.2", "maxRatio": "0.99", "lambda": "2.35"},
        m,
    )
    # all inliers kept, most outliers rejected
    assert w[:80].sum() == 80
    assert w[80:].sum() <= 2


def test_var_trimmed_bad_ratio():
    with pytest.raises(pm.InvalidParameter):
        Reg.create("VarTrimmedDistOutlierFilter",
                   {"minRatio": "0.9", "maxRatio": "0.5"})


def test_surface_normal_outlier():
    n = 4
    reading, reference = clouds(n)
    normals_r = np.zeros((reading.num_points, 3), np.float32)
    normals_r[:, 2] = 1.0
    normals_f = np.zeros((reference.num_points, 3), np.float32)
    normals_f[0] = [0, 0, 1]       # aligned → keep
    normals_f[1] = [1, 0, 0]       # orthogonal → reject
    normals_f[2] = [0, 0, -1]      # anti-parallel → |dot| = 1 → keep
    normals_f[3] = [0, 1, 1]
    normals_f[3] /= np.linalg.norm(normals_f[3])
    reading = reading.with_descriptor("normals", normals_r)
    reference = reference.with_descriptor("normals", normals_f)
    # matches span the full (bucketed) reading; rows past n are invalid
    m = make_matches(
        [[0.1]] * n + [[np.inf]] * (reading.num_points - n)
    )
    w = run_filter("SurfaceNormalOutlierFilter", {"maxAngle": "0.5"},
                   m, reading, reference)
    np.testing.assert_array_equal(w[:4, 0], [1.0, 0.0, 1.0, 0.0])


def test_generic_descriptor():
    n = 3
    reading, reference = clouds(n)
    reference = reference.with_descriptor(
        "score", np.array([0.1, 0.5, 0.9], np.float32).repeat(
            reference.num_points // 3 + 1
        )[: reference.num_points]
    )
    reference = reference.with_descriptor(
        "score",
        np.concatenate([
            np.array([0.1, 0.5, 0.9], np.float32),
            np.zeros(reference.num_points - 3, np.float32),
        ])[:, None],
    )
    m = make_matches([[0.1]] * n)
    w = run_filter(
        "GenericDescriptorOutlierFilter",
        {"source": "reference", "descName": "score", "useLargerThan": "1",
         "threshold": "0.4"},
        m, reading, reference,
    )
    np.testing.assert_array_equal(w[:3, 0], [0.0, 1.0, 1.0])
    # soft threshold normalizes by max
    w = run_filter(
        "GenericDescriptorOutlierFilter",
        {"source": "reference", "descName": "score", "useSoftThreshold": "1"},
        m, reading, reference,
    )
    np.testing.assert_allclose(w[:3, 0], [0.1 / 0.9, 0.5 / 0.9, 1.0],
                               rtol=1e-5)


@pytest.mark.parametrize("fct", ["cauchy", "welsch", "sc", "gm", "tukey",
                                 "huber", "L1", "student"])
def test_robust_functions_weights_decreasing(fct):
    dists = np.array([[0.01], [0.1], [1.0], [10.0]], np.float32)
    m = make_matches(dists)
    w = run_filter(
        "RobustOutlierFilter",
        {"robustFct": fct, "tuning": "1.0", "scaleEstimator": "none",
         "distanceType": "point2point"},
        m,
    )
    w = w[:4, 0]
    assert np.all(np.diff(w) <= 1e-6), w  # monotone non-increasing
    assert np.all(w >= 1e-50)


def test_robust_scale_state_advances():
    f = Reg.create(
        "RobustOutlierFilter",
        {"robustFct": "cauchy", "scaleEstimator": "berg", "tuning": "0.5",
         "nbIterationForScale": "5"},
    )
    reading, reference = clouds(10)
    m = make_matches(np.abs(np.random.default_rng(0).normal(
        size=(10, 1))).astype(np.float32))
    state = f.init_state()
    scales = []
    for _ in range(3):
        w, state = f.compute(reading, reference, m, state)
        scales.append(float(state[0]))
    assert int(state[1]) == 4
    assert scales[1] != scales[0]  # berg decay


def test_robust_invalid_params():
    with pytest.raises(pm.InvalidParameter):
        Reg.create("RobustOutlierFilter", {"robustFct": "bogus"})
    with pytest.raises(pm.InvalidParameter):
        Reg.create("RobustOutlierFilter", {"scaleEstimator": "bogus"})
    with pytest.raises(pm.InvalidParameter):
        Reg.create("RobustOutlierFilter", {"distanceType": "bogus"})


def test_chain_empty_zeros_infinite():
    """Empty chain still rejects infinite-distance pairs
    (reference: OutlierFilter.cpp:68-83)."""
    reading, reference = clouds(3)
    m = make_matches([[1.0], [np.inf], [4.0]])
    w, _ = compute_outlier_weights((), reading, reference, m, ())
    np.testing.assert_array_equal(np.asarray(w)[:3, 0], [1.0, 0.0, 1.0])


def test_chain_multiplies():
    reading, reference = clouds(3)
    m = make_matches([[1.0], [4.0], [9.0]])
    filters = (
        Reg.create("MaxDistOutlierFilter", {"maxDist": "2.5"}),  # keeps d2<=6.25
        Reg.create("MinDistOutlierFilter", {"minDist": "1.5"}),  # keeps d2>=2.25
    )
    w, _ = compute_outlier_weights(
        filters, reading, reference, m, init_outlier_states(filters)
    )
    np.testing.assert_array_equal(np.asarray(w)[:3, 0], [0.0, 1.0, 0.0])
