"""Property tests: random chains on random clouds must terminate with a
finite transform or raise a typed error — never NaN, never hang."""

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.errors import PointMatcherError


MATCHERS = [
    ("KDTreeMatcher", {"knn": "1"}),
    ("KDTreeMatcher", {"knn": "3", "maxDist": "0.8"}),
    ("CellGridMatcher", {"knn": "1", "maxDist": "0.5"}),
]
OUTLIERS = [
    [],
    [("TrimmedDistOutlierFilter", {"ratio": "0.75"})],
    [("MedianDistOutlierFilter", {"factor": "3"})],
    [("VarTrimmedDistOutlierFilter", {"minRatio": "0.1", "maxRatio": "0.9"})],
    [("RobustOutlierFilter", {"robustFct": "cauchy", "scaleEstimator": "mad"})],
    [("MaxDistOutlierFilter", {"maxDist": "1.0"}),
     ("TrimmedDistOutlierFilter", {"ratio": "0.9"})],
]
MINIMIZERS = [
    ("PointToPointErrorMinimizer", {}),
    ("PointToPlaneErrorMinimizer", {}),
    ("PointToPointSimilarityErrorMinimizer", {}),
]


@pytest.mark.parametrize("trial", range(12))
def test_random_chain_terminates_finite(trial):
    rng = np.random.default_rng(trial)
    n = int(rng.integers(150, 700))
    src = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    angle = rng.uniform(-0.15, 0.15)
    Rz = np.array(
        [[np.cos(angle), -np.sin(angle), 0],
         [np.sin(angle), np.cos(angle), 0], [0, 0, 1]], np.float32)
    dst = src @ Rz.T + rng.uniform(-0.1, 0.1, 3).astype(np.float32)

    m_name, m_par = MATCHERS[trial % len(MATCHERS)]
    minimizer, mp = MINIMIZERS[trial % len(MINIMIZERS)]
    outliers = OUTLIERS[trial % len(OUTLIERS)]

    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    if minimizer != "PointToPlaneErrorMinimizer":
        icp.reference_filters = []
    icp.matcher = pm.MatcherRegistrar.create(m_name, m_par)
    icp.outlier_filters = [
        pm.OutlierFilterRegistrar.create(nm, par) for nm, par in outliers
    ]
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(minimizer, mp)
    if trial % 2:
        icp.acceleration = "anderson"
    try:
        T = np.asarray(
            icp(pm.PointCloud.from_numpy(src), pm.PointCloud.from_numpy(dst),
                seed=trial)
        )
    except PointMatcherError:
        return  # typed failure is acceptable
    assert np.all(np.isfinite(T)), T
    # rigid minimizers must return orthogonal rotations
    if minimizer != "PointToPointSimilarityErrorMinimizer":
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=5e-3)
