"""Test harness: force an 8-virtual-device CPU platform.

The build environment pins JAX to the axon TPU plugin via sitecustomize;
tests run on CPU (fast, deterministic, and gives a virtual 8-device mesh for
the sharding tests). The config update must happen before any backend is
initialized, hence at conftest import time."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

DATA = "/root/reference/examples/data"

# Two test tiers: `-m quick` (~2 min) for iteration, full suite for CI.
# Heavy modules — full-pipeline goldens, app end-to-end sweeps, fuzzing,
# batched/sharded loops — are `slow`; everything else is auto-marked
# `quick`.
_SLOW_MODULES = {
    "test_golden",
    "test_apps",
    "test_fuzz",
    "test_sharding",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES or "slow" in item.keywords:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def data_path():
    return DATA


@pytest.fixture(scope="session")
def ref2d():
    from libpointmatcher_tpu import io

    return io.load(os.path.join(DATA, "2D_oneBox.csv"))


@pytest.fixture(scope="session")
def data2d():
    from libpointmatcher_tpu import io

    return io.load(os.path.join(DATA, "2D_twoBoxes.csv"))


def _decimate(cloud, step=4):
    """CPU test budget: the tiled brute-force matcher is O(N·M) — designed
    for the MXU, where the full car clouds are trivial; on the CPU test rig
    we decimate the fixtures 4x (the validation tolerances of the reference,
    utest.h:60-83, comfortably hold at this density)."""
    pts, descs, times = cloud.to_numpy()
    from libpointmatcher_tpu import PointCloud

    return PointCloud.from_numpy(
        pts[::step],
        {k: v[::step] for k, v in descs.items()},
        {k: v[::step] for k, v in times.items()},
    )


@pytest.fixture(scope="session")
def ref3d():
    from libpointmatcher_tpu import io

    return _decimate(io.load(os.path.join(DATA, "car_cloud400.csv")))


@pytest.fixture(scope="session")
def data3d():
    from libpointmatcher_tpu import io

    return _decimate(io.load(os.path.join(DATA, "car_cloud401.csv")))


# Ground-truth transforms from visual inspection, shared with the reference
# test suite (reference: utest/utest.cpp:341-356).
VALID_T_2D = np.array(
    [
        [0.987498, 0.157629, 0.0859918],
        [-0.157629, 0.987498, 0.203247],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)

VALID_T_3D = np.array(
    [
        [0.982304, 0.166685, -0.0854066, 0.0446816],
        [-0.150189, 0.973488, 0.172524, 0.191998],
        [0.111899, -0.156644, 0.981296, -0.0356313],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float32,
)


@pytest.fixture(scope="session")
def valid_t_2d():
    return VALID_T_2D


@pytest.fixture(scope="session")
def valid_t_3d():
    return VALID_T_3D


def validate_2d(test_T, valid_T=VALID_T_2D, tol=0.05):
    """Reference tolerance contract (utest/utest.h:60-61)."""
    test_T = np.asarray(test_T)
    valid_trans = np.linalg.norm(valid_T[:2, 2])
    test_trans = np.linalg.norm(test_T[:2, 2])
    valid_angle = np.arccos(np.clip(valid_T[0, 0], -1, 1))
    test_angle = np.arccos(np.clip(test_T[0, 0], -1, 1))
    assert abs(valid_trans - test_trans) < tol, (valid_trans, test_trans)
    assert abs(valid_angle - test_angle) < tol, (valid_angle, test_angle)


def validate_3d(test_T, valid_T=VALID_T_3D, tol=0.1):
    """Reference tolerance contract (utest/utest.h:82-83)."""
    test_T = np.asarray(test_T)
    valid_trans = np.linalg.norm(valid_T[:3, 3])
    test_trans = np.linalg.norm(test_T[:3, 3])
    R_rel = valid_T[:3, :3] @ test_T[:3, :3].T
    angle = np.arccos(np.clip((np.trace(R_rel) - 1) / 2, -1, 1))
    assert abs(valid_trans - test_trans) < tol, (valid_trans, test_trans)
    assert abs(angle) < tol, angle
