"""Logger + inspector unit tests (parity targets: utest/ui/Loggers.cpp,
utest/ui/Inspectors.cpp)."""

import io
import os

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.loggers import (
    FileLogger,
    NullLogger,
    get_logger,
    log_info,
    log_warning,
    set_logger,
)
from libpointmatcher_tpu.utils.histogram import Histogram


def test_null_logger_channels():
    lg = NullLogger()
    assert not lg.has_info_channel()
    assert not lg.has_warning_channel()
    lg.info("nothing")  # must not raise


def test_file_logger_writes(tmp_path):
    info = str(tmp_path / "info.log")
    warn = str(tmp_path / "warn.log")
    lg = pm.LoggerRegistrar.create(
        "FileLogger",
        {"infoFileName": info, "warningFileName": warn,
         "displayLocation": "1"},
    )
    assert lg.has_info_channel() and lg.has_warning_channel()
    set_logger(lg)
    try:
        log_info("hello", where="here")
        log_warning("uh oh")
    finally:
        set_logger(NullLogger())
    lg._info.flush()
    lg._warn.flush()
    assert "hello" in open(info).read()
    assert "uh oh" in open(warn).read()


def test_global_logger_swap():
    set_logger(None)
    assert isinstance(get_logger(), NullLogger)


def test_histogram_stats():
    h = Histogram("test")
    for v in [1.0, 2.0, 3.0, 4.0, 100.0]:
        h.push(v)
    s = h.stats()
    assert s["min"] == 1.0 and s["max"] == 100.0
    assert s["median"] == 3.0
    assert s["mean"] == pytest.approx(22.0)
    counts, lo, hi = h.bins()
    assert sum(counts) == 5
    assert "test" in h.dump_stats()


def test_performance_inspector_accumulates():
    insp = pm.InspectorRegistrar.create("PerformanceInspector")
    insp.add_stat("IterationsCount", 12)
    insp.add_stat("IterationsCount", 14)
    assert insp.stats("IterationsCount")["mean"] == 13.0
    header = insp.dump_stats_header()
    assert "IterationsCount_mean" in header


def test_performance_inspector_dumps_file(tmp_path):
    base = str(tmp_path / "run")
    insp = pm.InspectorRegistrar.create(
        "PerformanceInspector",
        {"baseFileName": base, "dumpStats": "1"},
    )
    insp.add_stat("OverlapRatio", 0.8)
    insp.finish(1)
    assert os.path.exists(base + "-stats.csv")


def test_icp_introspection_accessors(data3d, ref3d):
    icp = pm.ICP()
    icp.set_default()
    with pytest.raises(RuntimeError):
        icp.get_overlap()
    icp(data3d, ref3d, seed=0)
    assert 0.0 < icp.get_overlap() <= 1.0
    assert 0.0 < icp.get_point_used_ratio() <= 1.0
    assert icp.get_residual_error() >= 0.0
    with pytest.raises(RuntimeError):
        icp.get_covariance()
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
        "PointToPlaneWithCovErrorMinimizer"
    )
    icp._jit_cache = {}
    icp(data3d, ref3d, seed=0)
    cov = icp.get_covariance()
    assert cov.shape == (6, 6)


def test_rejection_counters(data3d, ref3d):
    icp = pm.ICP()
    icp.set_default()
    icp.outlier_filters = [
        pm.OutlierFilterRegistrar.create(
            "TrimmedDistOutlierFilter", {"ratio": "0.5"}
        )
    ]
    icp(data3d, ref3d, seed=0)
    # half the matches trimmed → roughly half rejected
    assert icp.get_nb_rejected_matches() > 0
    assert icp.get_nb_rejected_points() > 0
    total = icp.get_nb_rejected_matches()
    used = icp.get_point_used_ratio()
    assert 0.3 < used < 0.7


def test_vtk_inspector_dumps_iterations(tmp_path, monkeypatch):
    """VTKFileInspector forces the stepped engine and writes per-iteration
    clouds + link files that parse back (reference: InspectorsImpl.cpp)."""
    import glob
    import numpy as np
    from libpointmatcher_tpu.io import load_vtk

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    a = pm.PointCloud.from_numpy(src)
    b = pm.PointCloud.from_numpy(src + np.float32([0.05, 0, 0]))
    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    icp.inspector = pm.InspectorRegistrar.create(
        "VTKFileInspector",
        {"baseFileName": "dump", "dumpReading": "1", "dumpDataLinks": "1",
         "writeBinary": "1"},
    )
    icp(a, b, seed=0)
    readings = sorted(glob.glob("dump-reading-*.vtk"))
    links = sorted(glob.glob("dump-link-*.vtk"))
    assert len(readings) == icp.last_iteration_count
    assert len(links) == icp.last_iteration_count
    c = load_vtk(readings[0])
    assert c.count_host() == 300
