"""Point-cloud IO: extension-dispatched load/save.

Capability parity with the reference IO layer (reference: IO.cpp:375-390 load
dispatch, IO.cpp:808-827 save dispatch): ``.csv``, ``.vtk``, ``.ply``,
``.pcd``. Host-side parsing (IO is off the hot path; reference keeps it on
the CPU too)."""

from __future__ import annotations

import os

from ..cloud import PointCloud
from .csvio import load_csv, save_csv  # noqa: F401
from .vtkio import load_vtk, save_vtk, save_vtk_links  # noqa: F401

__all__ = [
    "load",
    "save",
    "load_csv",
    "save_csv",
    "load_vtk",
    "save_vtk",
    "validate_file",
]


def validate_file(path: str) -> None:
    """Existence/readability check (reference: PointMatcher.h:122)."""
    if not os.path.isfile(path):
        raise RuntimeError(f"file does not exist: {path}")
    if not os.access(path, os.R_OK):
        raise RuntimeError(f"file is not readable: {path}")


def load(path: str, granule: int = 256) -> PointCloud:
    validate_file(path)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return load_csv(path, granule=granule)
    if ext == ".vtk":
        return load_vtk(path, granule=granule)
    if ext == ".ply":
        from .plyio import load_ply

        return load_ply(path, granule=granule)
    if ext == ".pcd":
        from .pcdio import load_pcd

        return load_pcd(path, granule=granule)
    raise RuntimeError(
        f"unknown extension for file {path}; supported: .csv .vtk .ply .pcd"
    )


def save(cloud: PointCloud, path: str, binary: bool = False) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        return save_csv(cloud, path)
    if ext == ".vtk":
        return save_vtk(cloud, path, binary=binary)
    if ext == ".ply":
        from .plyio import save_ply

        return save_ply(cloud, path, binary=binary)
    if ext == ".pcd":
        from .pcdio import save_pcd

        return save_pcd(cloud, path, binary=binary)
    raise RuntimeError(
        f"unknown extension for file {path}; supported: .csv .vtk .ply .pcd"
    )
