"""CSV point-cloud IO (reference: IO.cpp:534-805 loadCSV/saveCSV).

Header-sniffing parser: delimiter ∈ {',', ';', tab, space}, has-header
detection by non-numeric tokens, x/y/z column detection through the external
label table; headerless files map their first 2–3 columns to coordinates."""

from __future__ import annotations

import csv as _csv
import io
from typing import List, TextIO, Union

import numpy as np

from ..cloud import PointCloud
from .labels import descriptor_column_names, group_columns

__all__ = ["load_csv", "save_csv"]


def _is_number(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _sniff_delimiter(line: str) -> str:
    for cand in (",", ";", "\t"):
        if cand in line:
            return cand
    return " "


def _split(line: str, delim: str) -> List[str]:
    if delim == " ":
        return line.split()
    return [t.strip() for t in line.split(delim) if t.strip() != ""]


def load_csv(source: Union[str, TextIO], granule: int = 256) -> PointCloud:
    if hasattr(source, "read"):
        text = source.read()
    else:
        with open(source) as f:
            text = f.read()
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        raise ValueError("empty CSV file")
    delim = _sniff_delimiter(lines[0])
    first = _split(lines[0], delim)
    has_header = any(not _is_number(tok) for tok in first)

    if has_header:
        col_names = first
        data_lines = lines[1:]
    else:
        ncols = len(first)
        base = ["x", "y", "z"]
        col_names = base[: min(ncols, 3)] + [
            f"desc{i}" for i in range(max(0, ncols - 3))
        ]
        data_lines = lines

    from .labels import TIME, external_label_info

    time_col_idx = [
        i for i, name in enumerate(col_names)
        if (external_label_info(name) or (None, None, None))[1] == TIME
    ]

    data = None
    if data_lines and not time_col_idx:
        # fast path: the native tokenizer (native/pm_native.cpp) parses the
        # whole numeric block in one pass (~20x the Python float() loop).
        # Skipped when int64 time columns are present: they must not pass
        # through float64.
        from . import native

        vals = native.parse_floats("\n".join(data_lines).encode())
        if vals is not None and len(vals) == len(data_lines) * len(col_names):
            data = vals.reshape(len(data_lines), len(col_names))
    if data is None:
        token_rows = [_split(ln, delim) for ln in data_lines]
        cols = []
        for ci in range(len(col_names)):
            if ci in time_col_idx:
                cols.append(
                    np.asarray([int(r[ci]) for r in token_rows], np.int64)
                )
            else:
                cols.append(
                    np.asarray([float(r[ci]) for r in token_rows], np.float64)
                )
        data = cols
    points, descriptors, times = group_columns(col_names, data)
    return PointCloud.from_numpy(points, descriptors, times, granule=granule)


def save_csv(cloud: PointCloud, dest: Union[str, TextIO]) -> None:
    pts, descs, times = cloud.to_numpy()
    dim = pts.shape[1]
    headers = ["x", "y", "z"][:dim]
    cols = [pts[:, i] for i in range(dim)]
    for name, arr in descs.items():
        names = descriptor_column_names(name, arr.shape[1], dim)
        for i, cn in enumerate(names):
            headers.append(cn)
            cols.append(arr[:, i])
    for name, arr in times.items():
        for i in range(arr.shape[1]):
            headers.append(name if arr.shape[1] == 1 else f"{name}{i}")
            cols.append(arr[:, i])

    own = False
    if hasattr(dest, "write"):
        f = dest
    else:
        f = open(dest, "w", newline="")
        own = True
    try:
        w = _csv.writer(f)
        w.writerow(headers)
        mat = np.stack(cols, axis=1)
        for row in mat:
            w.writerow([format(v, ".9g") for v in row])
    finally:
        if own:
            f.close()
