"""Application-level smoke tests (parity targets: examples/*.cpp flows)."""

import json
import os

import numpy as np
import pytest

import libpointmatcher_tpu as pm


@pytest.fixture(scope="module")
def small_cloud_files(tmp_path_factory, ref3d, data3d):
    d = tmp_path_factory.mktemp("clouds")
    ref_p = str(d / "ref.csv")
    data_p = str(d / "data.csv")
    pm.io.save(ref3d, ref_p)
    pm.io.save(data3d, data_p)
    return data_p, ref_p, str(d)


def test_eval_solution_protocol(small_cloud_files, valid_t_3d, tmp_path):
    """The ETH-protocol runner end to end on a local pair with ground truth
    (reference: evaluations/eval_solution.cpp flow)."""
    from libpointmatcher_tpu.apps.eval_solution import (
        evaluate_protocol,
        summarize,
    )

    data_p, ref_p, root = small_cloud_files
    proto = str(tmp_path / "protocol.csv")
    gt = np.asarray(valid_t_3d)
    header = "reading, reference, " + ", ".join(
        f"gT{i}{j}" for i in range(4) for j in range(4)
    )
    row = f"{data_p}, {ref_p}, " + ", ".join(
        str(v) for v in gt.reshape(-1)
    )
    with open(proto, "w") as f:
        f.write(header + "\n" + row + "\n")

    config = str(tmp_path / "sol.yaml")
    with open(config, "w") as f:
        f.write(
            "matcher:\n  KDTreeMatcher:\n    knn: 1\n"
            "outlierFilters:\n  - TrimmedDistOutlierFilter:\n      ratio: 0.85\n"
            "errorMinimizer:\n  PointToPointErrorMinimizer\n"
            "transformationCheckers:\n"
            "  - CounterTransformationChecker:\n      maxIterationCount: 60\n"
            "  - DifferentialTransformationChecker:\n"
            "      minDiffRotErr: 0.001\n      minDiffTransErr: 0.01\n"
            "      smoothLength: 4\n"
        )
    results = evaluate_protocol(proto, config, data_path=root)
    assert len(results) == 1
    r = results[0]
    assert r["error"] is None
    assert r["trans_err"] < 0.15
    assert r["rot_err"] < 0.15
    s = summarize(results)
    assert s["pairs"] == 1 and s["failed"] == 0
    assert s["registrations_per_s"] > 0


def test_eval_solution_batched_agrees_with_sequential(
        small_cloud_files, valid_t_3d, tmp_path):
    """The pair-parallel sweep (one vmapped program per shape-bucketed
    group — the reference's thread-per-core analogue,
    eval_solution.cpp:125-131) must agree with the per-pair driver."""
    from libpointmatcher_tpu.apps.eval_solution import (
        evaluate_protocol,
        summarize,
    )

    data_p, ref_p, root = small_cloud_files
    proto = str(tmp_path / "protocol.csv")
    gt = np.asarray(valid_t_3d)
    header = "reading, reference, " + ", ".join(
        f"gT{i}{j}" for i in range(4) for j in range(4)
    )
    row = f"{data_p}, {ref_p}, " + ", ".join(
        str(v) for v in gt.reshape(-1)
    )
    with open(proto, "w") as f:
        f.write(header + "\n" + "\n".join([row] * 5) + "\n")

    config = str(tmp_path / "sol.yaml")
    with open(config, "w") as f:
        f.write(
            "matcher:\n  KDTreeMatcher:\n    knn: 1\n"
            "outlierFilters:\n  - TrimmedDistOutlierFilter:\n      ratio: 0.85\n"
            "errorMinimizer:\n  PointToPointErrorMinimizer\n"
            "transformationCheckers:\n"
            "  - CounterTransformationChecker:\n      maxIterationCount: 60\n"
            "  - DifferentialTransformationChecker:\n"
            "      minDiffRotErr: 0.001\n      minDiffTransErr: 0.01\n"
            "      smoothLength: 4\n"
        )
    batched = evaluate_protocol(proto, config, data_path=root, batch=4,
                                verbose=False)
    sequential = evaluate_protocol(proto, config, data_path=root, batch=1,
                                   verbose=False)
    assert len(batched) == len(sequential) == 5
    for rb, rs in zip(batched, sequential):
        assert rb["pair"] == rs["pair"]
        assert rb["error"] is None and rs["error"] is None
        # same clouds, same pipeline: both drivers must land on the same
        # pose (RNG streams differ per driver, so compare poses not bits)
        np.testing.assert_allclose(
            np.asarray(rb["T"]), np.asarray(rs["T"]), atol=0.03
        )
        assert rb["trans_err"] < 0.15 and rb["rot_err"] < 0.15
    s = summarize(batched)
    assert s["pairs"] == 5 and s["failed"] == 0


def test_icp_cli_main(small_cloud_files, tmp_path, monkeypatch):
    from libpointmatcher_tpu.apps import icp as icp_app

    data_p, ref_p, root = small_cloud_files
    monkeypatch.chdir(tmp_path)
    rc = icp_app.main([ref_p, data_p, "--output", "out",
                       "--initTranslation", "0.0,0.0,0.0"])
    assert rc == 0
    assert os.path.exists("out_data_out.vtk")


def test_build_map_and_overlap(small_cloud_files, tmp_path, monkeypatch,
                               valid_t_3d):
    from libpointmatcher_tpu.apps import build_map, compute_overlap

    data_p, ref_p, root = small_cloud_files
    monkeypatch.chdir(tmp_path)
    gt = np.asarray(valid_t_3d)
    header = "reading, " + ", ".join(
        f"gT{i}{j}" for i in range(4) for j in range(4)
    )
    eye = np.eye(4)
    with open("list.csv", "w") as f:
        f.write(header + "\n")
        f.write(f"{ref_p}, " + ", ".join(str(v) for v in eye.reshape(-1)) + "\n")
        f.write(f"{data_p}, " + ", ".join(str(v) for v in gt.reshape(-1)) + "\n")
    rc = build_map.main(["list.csv", "map.vtk"])
    assert rc == 0
    merged = pm.io.load("map.vtk")
    assert merged.count_host() > 0

    rc = compute_overlap.main(["list.csv", "--noise", "0.3",
                               "--output", "ov.csv"])
    assert rc == 0
    M = np.loadtxt("ov.csv", delimiter=",")
    assert M.shape == (2, 2)
    assert M[0, 1] > 0.5  # ground-truth aligned clouds overlap heavily


def test_list_modules_bibliography(capsys):
    from libpointmatcher_tpu.apps import list_modules

    rc = list_modules.main([])
    assert rc == 0
    out = capsys.readouterr().out
    for section in ("DataPointsFilters", "Matchers", "ErrorMinimizers",
                    "Bibliography"):
        assert section in out
    assert "KDTreeMatcher" in out
    # citations resolved
    assert "Besl" in out or "Chen" in out


def test_align_sequence_builds_map(tmp_path, monkeypatch):
    """Scan-to-map odometry over a 3-scan synthetic sequence
    (reference: examples/align_sequence.cpp flow)."""
    import numpy as np
    from libpointmatcher_tpu.apps import align_sequence

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    base = rng.uniform(-2, 2, size=(1500, 3)).astype(np.float32)

    def rotz(a):
        return np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]], np.float32)

    names = []
    for i in range(3):
        R = rotz(0.02 * i)
        t = np.float32([0.05 * i, 0.02 * i, 0.0])
        pm.io.save(pm.PointCloud.from_numpy(base @ R.T + t), f"scan{i}.csv")
        names.append(f"scan{i}.csv")
    with open("list.csv", "w") as f:
        f.write("reading\n" + "\n".join(names) + "\n")
    rc = align_sequence.main(["list.csv", "--output", "map.vtk"])
    assert rc == 0
    merged = pm.io.load("map.vtk")
    assert merged.count_host() > 1000


def test_demo_pipeline_end_to_end():
    """Full stack: synthetic trajectory → ICPSequence odometry with priors →
    pose-graph refinement with a loop closure → ATE improves."""
    import contextlib
    import io as _io2
    from libpointmatcher_tpu.apps import demo_pipeline

    buf = _io2.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = demo_pipeline.main(["--scans", "4", "--decimate", "12"])
    assert rc == 0
    import json
    last = buf.getvalue().strip().splitlines()[-1]
    out = json.loads(last)
    assert out["ate_refined"] <= out["ate_odometry_noisy"]
