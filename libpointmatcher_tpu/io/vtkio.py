"""Legacy VTK point-cloud IO (reference: IO.cpp loadVTK/saveVTK, ~line 830+).

Supports DATASET POLYDATA and UNSTRUCTURED_GRID, ASCII and BINARY
(big-endian, reference: IOFunctions.h:49-78), POINT_DATA attributes SCALARS /
VECTORS / NORMALS / TENSORS / COLOR_SCALARS, and int64 time channels split
into ``<name>_splitTime_high32`` / ``..._low32`` scalar fields
(reference: IO.cpp:1106-1236)."""

from __future__ import annotations

import io
from typing import BinaryIO, Dict, List, Union

import numpy as np

from ..cloud import PointCloud

__all__ = ["load_vtk", "save_vtk", "save_vtk_links"]

_DTYPES = {
    "float": (np.dtype(">f4"), np.float32),
    "double": (np.dtype(">f8"), np.float64),
    "int": (np.dtype(">i4"), np.int32),
    "unsigned_int": (np.dtype(">u4"), np.uint32),
    "unsigned_char": (np.dtype(">u1"), np.uint8),
    "long": (np.dtype(">i8"), np.int64),
    "short": (np.dtype(">i2"), np.int16),
    "unsigned_short": (np.dtype(">u2"), np.uint16),
    "char": (np.dtype(">i1"), np.int8),
}


class _Reader:
    """Token reader over a binary buffer holding a legacy VTK file."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def readline(self) -> str:
        end = self.data.find(b"\n", self.pos)
        if end == -1:
            line = self.data[self.pos:]
            self.pos = len(self.data)
        else:
            line = self.data[self.pos:end]
            self.pos = end + 1
        return line.decode("ascii", errors="replace").strip()

    def next_nonempty_line(self) -> str:
        while self.pos < len(self.data):
            ln = self.readline()
            if ln:
                return ln
        return ""

    def read_values(self, count: int, type_name: str, binary: bool) -> np.ndarray:
        big, native = _DTYPES[type_name]
        if binary:
            nbytes = count * big.itemsize
            buf = self.data[self.pos:self.pos + nbytes]
            self.pos += nbytes
            # binary section is followed by a newline
            if self.pos < len(self.data) and self.data[self.pos:self.pos + 1] == b"\n":
                self.pos += 1
            return np.frombuffer(buf, dtype=big).astype(native)
        from . import native as native_io

        res = native_io.parse_floats_n(self.data[self.pos:], count)
        if res is not None:
            arr, consumed = res
            if len(arr) == count:
                self.pos += consumed
                return arr.astype(native)
        vals: List[float] = []
        while len(vals) < count:
            ln = self.next_nonempty_line()
            if not ln:
                break
            vals.extend(float(t) for t in ln.split())
        return np.asarray(vals[:count], dtype=native)


def load_vtk(source: Union[str, BinaryIO], granule: int = 256) -> PointCloud:
    if hasattr(source, "read"):
        data = source.read()
        if isinstance(data, str):
            data = data.encode()
    else:
        with open(source, "rb") as f:
            data = f.read()
    r = _Reader(data)
    magic = r.readline()
    if "# vtk DataFile" not in magic:
        raise ValueError(f"not a VTK legacy file: {magic!r}")
    r.readline()  # comment
    fmt = r.next_nonempty_line().upper()
    binary = fmt == "BINARY"
    dataset_line = r.next_nonempty_line().split()
    if len(dataset_line) != 2 or dataset_line[0] != "DATASET":
        raise ValueError(f"expected DATASET line, got {dataset_line}")
    dataset = dataset_line[1]
    if dataset not in ("POLYDATA", "UNSTRUCTURED_GRID"):
        raise ValueError(f"unsupported VTK dataset type {dataset}")

    points = None
    n_points = 0
    descriptors: Dict[str, np.ndarray] = {}
    split_times: Dict[str, Dict[str, np.ndarray]] = {}

    while r.pos < len(r.data):
        line = r.next_nonempty_line()
        if not line:
            break
        tokens = line.split()
        kw = tokens[0].upper()
        if kw == "POINTS":
            n_points = int(tokens[1])
            vals = r.read_values(n_points * 3, tokens[2], binary)
            points = vals.reshape(n_points, 3)
        elif kw in ("VERTICES", "POLYGONS", "LINES", "TRIANGLE_STRIPS"):
            n, size = int(tokens[1]), int(tokens[2])
            r.read_values(size, "int", binary)
        elif kw == "CELLS":
            n, size = int(tokens[1]), int(tokens[2])
            r.read_values(size, "int", binary)
        elif kw == "CELL_TYPES":
            n = int(tokens[1])
            r.read_values(n, "int", binary)
        elif kw == "POINT_DATA":
            if int(tokens[1]) != n_points:
                raise ValueError("POINT_DATA size differs from POINTS")
        elif kw == "CELL_DATA":
            pass
        elif kw == "FIELD":
            n_arrays = int(tokens[2])
            for _ in range(n_arrays):
                h = r.next_nonempty_line().split()
                name, ncomp, cnt, typ = h[0], int(h[1]), int(h[2]), h[3]
                vals = r.read_values(ncomp * cnt, typ, binary)
                descriptors[name] = vals.reshape(cnt, ncomp)
        elif kw == "SCALARS":
            name, typ = tokens[1], tokens[2]
            ncomp = int(tokens[3]) if len(tokens) > 3 else 1
            nxt = r.next_nonempty_line()
            if not nxt.upper().startswith("LOOKUP_TABLE"):
                # value data started on this line (rare); rewind not needed for
                # binary, handle ascii by prepending tokens
                raise ValueError("expected LOOKUP_TABLE after SCALARS")
            vals = r.read_values(n_points * ncomp, typ, binary)
            arr = vals.reshape(n_points, ncomp)
            if name.endswith("_splitTime_high32"):
                split_times.setdefault(
                    name[: -len("_splitTime_high32")], {}
                )["high"] = arr[:, 0]
            elif name.endswith("_splitTime_low32"):
                split_times.setdefault(
                    name[: -len("_splitTime_low32")], {}
                )["low"] = arr[:, 0]
            else:
                descriptors[name] = arr
        elif kw == "VECTORS":
            name, typ = tokens[1], tokens[2]
            vals = r.read_values(n_points * 3, typ, binary)
            descriptors[name] = vals.reshape(n_points, 3)
        elif kw == "NORMALS":
            _, typ = tokens[1], tokens[2]
            vals = r.read_values(n_points * 3, typ, binary)
            descriptors["normals"] = vals.reshape(n_points, 3)
        elif kw == "TENSORS":
            name, typ = tokens[1], tokens[2]
            vals = r.read_values(n_points * 9, typ, binary)
            descriptors[name] = vals.reshape(n_points, 9)
        elif kw == "COLOR_SCALARS":
            name, ncomp = tokens[1], int(tokens[2])
            if binary:
                vals = r.read_values(n_points * ncomp, "unsigned_char", True)
                arr = vals.reshape(n_points, ncomp).astype(np.float32) / 255.0
            else:
                vals = r.read_values(n_points * ncomp, "float", False)
                arr = vals.reshape(n_points, ncomp)
            descriptors[name] = arr
        else:
            raise ValueError(f"unknown VTK field {kw}")

    if points is None:
        raise ValueError("VTK file has no POINTS")
    # 2D clouds are stored with z = 0 in VTK; keep 3D (the reference also
    # loads VTK as 3D clouds with a zero z row).
    times = {}
    for name, hl in split_times.items():
        if "high" not in hl or "low" not in hl:
            raise ValueError(
                f"time channel '{name}' missing one of the _splitTime_ fields"
            )
        t = (hl["high"].astype(np.int64) << 32) | hl["low"].astype(np.int64)
        times[name] = t[:, None]
    descriptors = {
        k: v.astype(np.float32) for k, v in descriptors.items()
    }
    return PointCloud.from_numpy(
        points.astype(np.float32), descriptors, times, granule=granule
    )


def _write_values(f, arr: np.ndarray, type_name: str, binary: bool):
    big, _ = _DTYPES[type_name]
    if binary:
        f.write(np.ascontiguousarray(arr, dtype=big).tobytes())
        f.write(b"\n")
    else:
        flat = np.asarray(arr).reshape(arr.shape[0], -1)
        for row in flat:
            f.write(
                (" ".join(format(v, ".9g") for v in row) + "\n").encode()
            )


def save_vtk(cloud: PointCloud, dest: Union[str, BinaryIO],
             binary: bool = False) -> None:
    """Write POLYDATA with VERTICES and descriptor-typed POINT_DATA
    (reference: InspectorsImpl.cpp:159-235 / IO.cpp saveVTK)."""
    pts, descs, times = cloud.to_numpy()
    n, d = pts.shape
    if d == 2:
        pts = np.concatenate([pts, np.zeros((n, 1), np.float32)], axis=1)
    own = False
    if hasattr(dest, "write"):
        f = dest
    else:
        f = open(dest, "wb")
        own = True
    try:
        f.write(b"# vtk DataFile Version 3.0\n")
        f.write(b"libpointmatcher-tpu cloud\n")
        f.write(b"BINARY\n" if binary else b"ASCII\n")
        f.write(b"DATASET POLYDATA\n")
        f.write(f"POINTS {n} float\n".encode())
        _write_values(f, pts, "float", binary)
        f.write(f"VERTICES {n} {2 * n}\n".encode())
        verts = np.stack(
            [np.ones(n, np.int32), np.arange(n, dtype=np.int32)], axis=1
        )
        _write_values(f, verts, "int", binary)
        f.write(f"POINT_DATA {n}\n".encode())
        for name, arr in descs.items():
            span = arr.shape[1]
            if name == "normals" and span == 3:
                f.write(b"NORMALS normals float\n")
                _write_values(f, arr, "float", binary)
            elif name == "color":
                f.write(f"COLOR_SCALARS color {span}\n".encode())
                if binary:
                    _write_values(
                        f, np.clip(arr * 255.0, 0, 255), "unsigned_char", True
                    )
                else:
                    _write_values(f, arr, "float", False)
            elif span == 3:
                f.write(f"VECTORS {name} float\n".encode())
                _write_values(f, arr, "float", binary)
            elif span == 9:
                f.write(f"TENSORS {name} float\n".encode())
                _write_values(f, arr, "float", binary)
            else:
                for i in range(span):
                    cname = name if span == 1 else f"{name}{i}"
                    f.write(f"SCALARS {cname} float\n".encode())
                    f.write(b"LOOKUP_TABLE default\n")
                    _write_values(f, arr[:, i:i + 1], "float", binary)
        for name, arr in times.items():
            t = arr[:, 0].astype(np.int64)
            hi = (t >> 32).astype(np.uint32)
            lo = (t & 0xFFFFFFFF).astype(np.uint32)
            for suffix, vals in (("_splitTime_high32", hi), ("_splitTime_low32", lo)):
                f.write(
                    f"SCALARS {name}{suffix} unsigned_int\n".encode()
                )
                f.write(b"LOOKUP_TABLE default\n")
                _write_values(f, vals[:, None], "unsigned_int", binary)
    finally:
        if own:
            f.close()


def save_vtk_links(reading: PointCloud, reference: PointCloud, matches,
                   weights, dest, binary: bool = False) -> None:
    """Write match links as LINES with outlier weights as CELL_DATA
    (reference: InspectorsImpl.cpp:286-366)."""
    r_pts, _, _ = reading.to_numpy()
    f_pts, _, _ = reference.to_numpy()
    dists = np.asarray(matches.dists)
    ids = np.asarray(matches.ids)
    w = np.asarray(weights)
    rmask = np.asarray(reading.mask)
    valid_rows = np.flatnonzero(rmask)
    n_read = len(valid_rows)
    if r_pts.shape[1] == 2:
        r_pts = np.concatenate([r_pts, np.zeros((n_read, 1))], axis=1)
        f_pts = np.concatenate([f_pts, np.zeros((len(f_pts), 1))], axis=1)

    fmask = np.asarray(reference.mask)
    # map reference row index (padded space) → compact index
    remap = -np.ones(len(fmask), np.int64)
    remap[np.flatnonzero(fmask)] = np.arange(fmask.sum())

    lines = []
    cell_w = []
    for li, row in enumerate(valid_rows):
        for k in range(ids.shape[1]):
            j = ids[row, k]
            if j < 0 or not np.isfinite(dists[row, k]):
                continue
            rj = remap[j]
            if rj < 0:
                continue
            lines.append((li, n_read + rj))
            cell_w.append(w[row, k])

    own = False
    if hasattr(dest, "write"):
        f = dest
    else:
        f = open(dest, "wb")
        own = True
    try:
        all_pts = np.concatenate([r_pts, f_pts], axis=0).astype(np.float32)
        f.write(b"# vtk DataFile Version 3.0\n")
        f.write(b"libpointmatcher-tpu match links\n")
        f.write(b"BINARY\n" if binary else b"ASCII\n")
        f.write(b"DATASET POLYDATA\n")
        f.write(f"POINTS {len(all_pts)} float\n".encode())
        _write_values(f, all_pts, "float", binary)
        f.write(f"LINES {len(lines)} {3 * len(lines)}\n".encode())
        larr = np.asarray(
            [(2, a, b) for a, b in lines], dtype=np.int32
        ).reshape(-1, 3)
        _write_values(f, larr, "int", binary)
        f.write(f"CELL_DATA {len(lines)}\n".encode())
        f.write(b"SCALARS outlier_weights float\n")
        f.write(b"LOOKUP_TABLE default\n")
        _write_values(
            f, np.asarray(cell_w, np.float32)[:, None], "float", binary
        )
    finally:
        if own:
            f.close()
