"""End-to-end ICP tests, mirroring the reference's IcpHelper strategy
(reference: utest/utest.h:31-86, utest/utest.cpp:162-290)."""

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from tests.conftest import validate_2d, validate_3d


def default_icp():
    icp = pm.ICP()
    icp.set_default()
    return icp


def test_icp_default_2d(data2d, ref2d):
    icp = default_icp()
    T = icp(data2d, ref2d, seed=42)
    validate_2d(T)


def test_icp_default_3d(data3d, ref3d):
    icp = default_icp()
    T = icp(data3d, ref3d, seed=42)
    validate_3d(T)


def test_icp_identity(ref3d):
    """Registering a cloud against itself → near identity
    (reference: utest.cpp:200-220)."""
    icp = default_icp()
    T = np.asarray(icp(ref3d, ref3d, seed=7))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=0.01)
    assert np.linalg.norm(T[:3, 3]) < 0.02


def test_icp_point_to_point_yaml(data3d, ref3d):
    yaml_text = """
readingDataPointsFilters:
  - RandomSamplingDataPointsFilter:
      prob: 0.5
referenceDataPointsFilters:
  - RandomSamplingDataPointsFilter:
      prob: 0.5
matcher:
  KDTreeMatcher:
    knn: 1
outlierFilters:
  - TrimmedDistOutlierFilter:
      ratio: 0.85
errorMinimizer:
  PointToPointErrorMinimizer
transformationCheckers:
  - CounterTransformationChecker:
      maxIterationCount: 60
  - DifferentialTransformationChecker:
      minDiffRotErr: 0.001
      minDiffTransErr: 0.01
      smoothLength: 4
inspector:
  NullInspector
logger:
  NullLogger
"""
    icp = pm.ICP()
    icp.load_from_yaml(yaml_text)
    T = icp(data3d, ref3d, seed=3)
    validate_3d(T)


def test_icp_with_initial_guess(data3d, ref3d, valid_t_3d):
    icp = default_icp()
    T = icp(data3d, ref3d, T_init=valid_t_3d, seed=11)
    validate_3d(T)


def test_max_iterations_flag(data3d, ref3d):
    icp = default_icp()
    icp.checkers = [
        pm.TransformationCheckerRegistrar.create(
            "CounterTransformationChecker", {"maxIterationCount": "2"}
        )
    ]
    icp(data3d, ref3d, seed=5)
    assert icp.get_max_num_iterations_reached()
    assert icp.last_iteration_count == 2


def test_bound_checker_raises(data3d, ref3d):
    icp = default_icp()
    icp.checkers.append(
        pm.TransformationCheckerRegistrar.create(
            "BoundTransformationChecker",
            {"maxRotationNorm": "1e-6", "maxTranslationNorm": "1e-6"},
        )
    )
    with pytest.raises(pm.ConvergenceError):
        icp(data3d, ref3d, seed=5)


def test_icp_sequence(data3d, ref3d):
    """Map lifecycle invariants (reference: utest.cpp:245-290)."""
    seq = pm.ICPSequence()
    seq.set_default()
    assert not seq.has_map()
    T_no_map = np.asarray(seq(data3d))
    np.testing.assert_allclose(T_no_map, np.eye(4), atol=1e-7)

    assert seq.set_map(ref3d)
    assert seq.has_map()
    T = seq(data3d, seed=42)
    validate_3d(T)
    # second compute reuses the map
    T2 = seq(data3d, seed=43)
    validate_3d(T2)
    seq.clear_map()
    assert not seq.has_map()


def test_unknown_yaml_section_rejected():
    icp = pm.ICP()
    with pytest.raises(pm.InvalidModuleType):
        icp.load_from_yaml("bogusSection:\n  Foo\n")


def test_unknown_module_param_rejected():
    with pytest.raises(pm.InvalidParameter):
        pm.MatcherRegistrar.create("KDTreeMatcher", {"nonsense": "1"})


def test_params_to_paramless_module_rejected():
    with pytest.raises(pm.InvalidParameter):
        pm.MatcherRegistrar.create("NullMatcher", {"knn": "1"})


def test_stats_exposed(data3d, ref3d):
    icp = default_icp()
    icp.inspector = pm.InspectorRegistrar.create("PerformanceInspector")
    icp(data3d, ref3d, seed=42)
    hist = icp.inspector.histograms
    for key in (
        "ReferencePreprocessingDuration",
        "ReadingPreprocessingDuration",
        "IterationsCount",
        "PointCountTouched",
        "OverlapRatio",
        "ConvergenceDuration",
    ):
        assert key in hist, key
    assert icp.last_stats is not None
    assert 0.0 < float(icp.last_stats.weighted_point_used_ratio) <= 1.0


def test_icp_object_reuse_with_new_reference():
    """Reusing one ICP object across pairs must not leak the previous
    reference through the jit cache (regression: the matcher's stored
    reference must never be baked into the traced step)."""
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    shift_a = np.float32([0.2, 0.0, 0.0])
    shift_b = np.float32([0.0, 0.0, -0.3])
    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    ref_a = pm.PointCloud.from_numpy(src + shift_a)
    ref_b = pm.PointCloud.from_numpy(src + shift_b)
    reading = pm.PointCloud.from_numpy(src)
    T_a = np.asarray(icp(reading, ref_a, seed=0))
    T_b = np.asarray(icp(reading, ref_b, seed=0))
    np.testing.assert_allclose(T_a[:3, 3], shift_a, atol=0.05)
    np.testing.assert_allclose(T_b[:3, 3], shift_b, atol=0.05)


def test_similarity_transform_scale():
    """Reference oracle (utest.cpp:222-243): registering car_cloud400 onto
    its 1.04-scaled copy with the similarity minimizer must recover the
    scale to 1e-3."""
    from tests.conftest import _decimate, DATA
    import os

    pts0 = _decimate(pm.io.load(os.path.join(DATA, "car_cloud400.csv")))
    pts1 = _decimate(pm.io.load(os.path.join(DATA, "car_cloud400_scaled.csv")))
    icp = pm.ICP()
    with open(os.path.join(
        DATA, "icp_data",
        "defaultSimilarityPointToPointMinDistDataPointsFilter.yaml",
    )) as f:
        icp.load_from_yaml(f.read())
    T = np.asarray(icp(pts0, pts1, seed=0))
    scale = np.linalg.det(T[:3, :3]) ** (1.0 / 3.0)
    assert abs(scale - 1.04) < 0.002, scale
    # similarity minimizer must auto-select the similarity transformation
    assert isinstance(icp.transformations[0], pm.SimilarityTransformation)


def test_reading_step_filters_run_per_iteration():
    """FixStepSampling as a readingStep filter advances its schedule every
    iteration (reference: ICP.cpp:371-377). Its schedule is deterministic,
    so it runs IN-TRACE inside the fused while_loop (round 5); the pose
    must still be right."""
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
    reading = pm.PointCloud.from_numpy(src)
    reference = pm.PointCloud.from_numpy(src + np.float32([0.05, 0, 0]))
    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
        "PointToPointErrorMinimizer"
    )
    step_f = pm.DataPointsFilterRegistrar.create(
        "FixStepSamplingDataPointsFilter",
        {"startStep": "4", "endStep": "1", "stepMult": "0.5"},
    )
    icp.reading_step_filters = [step_f]
    T = np.asarray(icp(reading, reference, seed=0))
    np.testing.assert_allclose(T[:3, 3], [0.05, 0, 0], atol=0.02)
    assert icp.last_iteration_count > 1


def test_step_filter_fused_matches_stepped_driver():
    """The in-trace FixStepSampling schedule must reproduce the host
    stepped driver's registration: same schedule values, same masks, same
    pose (power-of-two stepMult keeps the f32 schedule arithmetic exact)."""
    rng = np.random.default_rng(4)
    src = rng.uniform(-1, 1, size=(1200, 3)).astype(np.float32)
    reading = pm.PointCloud.from_numpy(src)
    reference = pm.PointCloud.from_numpy(src + np.float32([0.04, -0.02, 0]))

    def build():
        icp = pm.ICP()
        icp.set_default()
        icp.reading_filters = []
        icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
            "PointToPointErrorMinimizer"
        )
        icp.reading_step_filters = [pm.DataPointsFilterRegistrar.create(
            "FixStepSamplingDataPointsFilter",
            {"startStep": "8", "endStep": "1", "stepMult": "0.5"},
        )]
        return icp

    fused = build()
    assert fused._step_chain_traced()
    T_f = np.asarray(fused(reading, reference, seed=0))

    stepped = build()
    stepped._step_chain_traced = lambda: False  # force the host driver
    T_s = np.asarray(stepped(reading, reference, seed=0))
    assert stepped.last_iteration_count == fused.last_iteration_count
    np.testing.assert_allclose(T_f, T_s, atol=1e-5)


def test_matmul_precision_pinned():
    """The package must pin f32-accurate matmuls: TPU's default single-pass
    bf16 rounds the 4x4 transform compositions' diagonals to 1.0, silently
    degrading every registration (found via the force4DOF golden config:
    6.5% on chip vs 0.7% on CPU until pinned)."""
    import jax

    assert "highest" in str(jax.config.jax_default_matmul_precision).lower()


def test_anderson_acceleration_converges_faster(data3d, ref3d):
    """AA-ICP (opt-in) reaches the same pose in fewer iterations."""
    from tests.conftest import validate_3d

    plain = pm.ICP()
    plain.set_default()
    T_plain = np.asarray(plain(data3d, ref3d, seed=42))
    it_plain = plain.last_iteration_count

    acc = pm.ICP()
    acc.set_default()
    acc.acceleration = "anderson"
    T_acc = np.asarray(acc(data3d, ref3d, seed=42))
    it_acc = acc.last_iteration_count

    validate_3d(T_acc)
    np.testing.assert_allclose(T_acc, T_plain, atol=0.02)
    assert it_acc <= it_plain


def test_jit_cache_keyed_by_configuration(data3d, ref3d):
    """Mutating the chain (e.g. toggling acceleration) must never reuse a
    stale compiled loop (regression: cache key lacked the configuration)."""
    icp = pm.ICP()
    icp.set_default()
    icp(data3d, ref3d, seed=42)
    it_plain = icp.last_iteration_count
    icp.acceleration = "anderson"
    icp(data3d, ref3d, seed=42)
    it_aa = icp.last_iteration_count

    fresh = pm.ICP()
    fresh.set_default()
    fresh.acceleration = "anderson"
    fresh(data3d, ref3d, seed=42)
    assert it_aa == fresh.last_iteration_count
    assert it_aa <= it_plain


def test_load_from_yaml_resets_all_slots():
    """A YAML config defines the whole chain: unspecified sections must not
    inherit modules from a previous configuration (reference cleanup()
    semantics, ICP.cpp:117-128)."""
    icp = pm.ICP()
    icp.set_default()
    icp.load_from_yaml("readingDataPointsFilters:\n  - IdentityDataPointsFilter\n")
    assert icp.matcher is None
    assert icp.error_minimizer is None
    assert icp.outlier_filters == []
    assert icp.checkers == []
