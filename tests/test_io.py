"""IO round-trip and parser tests (parity target: utest/ui/IO.cpp)."""

import io as _io
import os

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.io import (
    load_csv,
    save_csv,
    load_vtk,
    save_vtk,
)
from libpointmatcher_tpu.io.plyio import load_ply, save_ply
from libpointmatcher_tpu.io.pcdio import load_pcd, save_pcd

DATA = "/root/reference/examples/data"


def sample_cloud(n=50, with_desc=True):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    descs = {}
    if with_desc:
        normals = rng.normal(size=(n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        descs = {"normals": normals, "intensity": rng.random((n, 1)).astype(np.float32)}
    return pm.PointCloud.from_numpy(pts, descs)


# ------------------------------------------------------------------ loading
def test_load_reference_csv_3d():
    c = pm.io.load(os.path.join(DATA, "car_cloud400.csv"))
    assert c.dim == 3
    assert c.count_host() == 24989
    assert c.has_descriptor("normals")


def test_load_reference_csv_2d():
    c = pm.io.load(os.path.join(DATA, "2D_twoBoxes.csv"))
    assert c.dim == 2
    assert c.count_host() == 361


def test_load_reference_vtk():
    c = pm.io.load(os.path.join(DATA, "cloud.00000.vtk"))
    assert c.dim == 3
    assert c.count_host() == 24989


def test_inline_csv_header_variants():
    # comma with header
    c = load_csv(_io.StringIO("x,y,z\n1,2,3\n4,5,6\n"))
    assert c.count_host() == 2 and c.dim == 3
    # semicolon
    c = load_csv(_io.StringIO("x;y\n1;2\n3;4\n"))
    assert c.dim == 2
    # headerless space-separated 2D
    c = load_csv(_io.StringIO("0.5 0.25\n0.75 0.125\n"))
    assert c.dim == 2 and c.count_host() == 2
    # normals grouped from nx/ny/nz
    c = load_csv(_io.StringIO("x,y,z,nx,ny,nz\n1,2,3,0,0,1\n"))
    assert c.has_descriptor("normals")
    # normal_x style also maps to normals (reference label table)
    c = load_csv(_io.StringIO("x,y,z,normal_x,normal_y,normal_z\n1,2,3,0,0,1\n"))
    assert c.has_descriptor("normals")


def test_unknown_extension():
    with pytest.raises(RuntimeError):
        pm.io.load("/tmp/nonexistent.xyz")


# --------------------------------------------------------------- round-trips
@pytest.mark.parametrize("binary", [False, True])
def test_vtk_roundtrip(tmp_path, binary):
    c = sample_cloud()
    path = str(tmp_path / "t.vtk")
    save_vtk(c, path, binary=binary)
    c2 = load_vtk(path)
    np.testing.assert_allclose(c2.to_numpy()[0], c.to_numpy()[0], rtol=1e-6)
    np.testing.assert_allclose(
        c2.to_numpy()[1]["normals"], c.to_numpy()[1]["normals"], rtol=1e-6
    )


def test_vtk_time_split_roundtrip(tmp_path):
    c = sample_cloud(with_desc=False)
    t = (np.arange(c.num_points, dtype=np.int64) + (7 << 33))[:, None]
    c = c.with_time("time", t)
    path = str(tmp_path / "t.vtk")
    save_vtk(c, path)
    c2 = load_vtk(path)
    _, _, times = c2.to_numpy()
    np.testing.assert_array_equal(times["time"][:, 0], t[: c.count_host(), 0])


def test_csv_roundtrip(tmp_path):
    c = sample_cloud()
    path = str(tmp_path / "t.csv")
    save_csv(c, path)
    c2 = load_csv(path)
    np.testing.assert_allclose(c2.to_numpy()[0], c.to_numpy()[0], rtol=1e-5)
    assert c2.has_descriptor("normals")
    assert c2.has_descriptor("intensity")


@pytest.mark.parametrize("binary", [False, True])
def test_ply_roundtrip(tmp_path, binary):
    c = sample_cloud()
    path = str(tmp_path / "t.ply")
    save_ply(c, path, binary=binary)
    c2 = load_ply(path)
    np.testing.assert_allclose(c2.to_numpy()[0], c.to_numpy()[0], rtol=1e-6)
    np.testing.assert_allclose(
        c2.to_numpy()[1]["normals"], c.to_numpy()[1]["normals"], rtol=1e-6
    )


@pytest.mark.parametrize("binary", [False, True])
def test_pcd_roundtrip(tmp_path, binary):
    c = sample_cloud()
    path = str(tmp_path / "t.pcd")
    save_pcd(c, path, binary=binary)
    c2 = load_pcd(path)
    np.testing.assert_allclose(c2.to_numpy()[0], c.to_numpy()[0], rtol=1e-6)
    assert c2.has_descriptor("normals")


# ------------------------------------------------------------ inline parsers
def test_inline_ply():
    text = """ply
format ascii 1.0
comment hi
element vertex 3
property float x
property float y
property float z
property float nx
property float ny
property float nz
end_header
1 2 3 0 0 1
4 5 6 0 1 0
7 8 9 1 0 0
"""
    c = load_ply(_io.BytesIO(text.encode()))
    assert c.count_host() == 3
    assert c.has_descriptor("normals")
    np.testing.assert_allclose(
        c.to_numpy()[0], [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    )


def test_inline_pcd():
    text = """# .PCD v.7 - Point Cloud Data file format
VERSION .7
FIELDS x y z
SIZE 4 4 4
TYPE F F F
COUNT 1 1 1
WIDTH 2
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS 2
DATA ascii
1 2 3
4 5 6
"""
    c = load_pcd(_io.BytesIO(text.encode()))
    assert c.count_host() == 2
    np.testing.assert_allclose(c.to_numpy()[0], [[1, 2, 3], [4, 5, 6]])


def test_save_load_dispatch(tmp_path):
    c = sample_cloud()
    for ext in ("csv", "vtk", "ply", "pcd"):
        p = str(tmp_path / f"cloud.{ext}")
        pm.io.save(c, p)
        c2 = pm.io.load(p)
        assert c2.count_host() == c.count_host(), ext


def test_malformed_ply_rejected():
    bad_headers = [
        "not_a_ply\nformat ascii 1.0\nend_header\n",           # bad magic
        "ply\nformat ascii 1.0\nproperty float x\nend_header\n",  # property before element
    ]
    for text in bad_headers:
        with pytest.raises(ValueError):
            load_ply(_io.BytesIO(text.encode()))


def test_malformed_pcd_rejected():
    # missing FIELDS
    text = "VERSION .7\nPOINTS 1\nDATA ascii\n1 2 3\n"
    with pytest.raises(ValueError):
        load_pcd(_io.BytesIO(text.encode()))


def test_vtk_wrong_dataset_rejected():
    text = ("# vtk DataFile Version 3.0\nx\nASCII\n"
            "DATASET STRUCTURED_POINTS\n")
    with pytest.raises(ValueError):
        load_vtk(_io.BytesIO(text.encode()))


def test_csv_missing_coordinates_rejected():
    with pytest.raises(ValueError):
        load_csv(_io.StringIO("a,b\n1,2\n"))


def test_save_binary_flag_respected(tmp_path):
    c = sample_cloud(n=10, with_desc=False)
    for ext in ("ply", "pcd", "vtk"):
        p = str(tmp_path / f"b.{ext}")
        pm.io.save(c, p, binary=True)
        head = open(p, "rb").read(200)
        assert b"ascii" not in head.lower() or ext == "vtk" and b"BINARY" in head, (ext, head)
        c2 = pm.io.load(p)
        assert c2.count_host() == 10


def test_pcd_binary_int64_time_roundtrip(tmp_path):
    import io as _io2
    # binary PCD with an int64 time field parses exactly
    t = 1723880000123456789
    import struct
    header = (b"VERSION .7\nFIELDS x y z time\nSIZE 4 4 4 8\n"
              b"TYPE F F F I\nCOUNT 1 1 1 1\nWIDTH 1\nHEIGHT 1\n"
              b"POINTS 1\nDATA binary\n")
    body = struct.pack("<fffq", 1.0, 2.0, 3.0, t)
    c = load_pcd(_io.BytesIO(header + body))
    assert c.to_numpy()[2]["time"][0, 0] == t


def test_native_baseline_register_conv():
    """The compiled CPU baseline's convergence-stopped loop (bench
    infrastructure, native/pm_native.cpp::pm_icp_cpu_register_conv):
    identical per-iteration work as the fixed-budget form, stopping by
    the reference Differential checker semantics
    (TransformationCheckersImpl.cpp:85-158). It must agree with the
    fixed-budget form at its returned iteration count and recover a
    small known pose."""
    from libpointmatcher_tpu.io.native import cpu_baseline

    rng = np.random.default_rng(3)
    ref = rng.uniform(0, 10, (3000, 3))
    ref[:, 2] = 0.2 * np.sin(ref[:, 0]) + 0.1 * np.cos(ref[:, 1] * 2)
    nb = cpu_baseline(ref)
    if nb is None:
        pytest.skip("native toolchain unavailable")
    nb.compute_normals(10)
    ang = 0.02
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1.0]])
    t = np.array([0.05, -0.04, 0.02])
    src = (ref[::2] - t) @ R  # = R^-1 (x - t): registration recovers (R, t)
    T, iters = nb.register_conv(src, max_iterations=40)
    assert 0 < iters <= 40
    T_budget = nb.register(src, iters)
    np.testing.assert_allclose(T, T_budget, rtol=0, atol=1e-12)
    np.testing.assert_allclose(T[:3, :3], R, atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-3)
