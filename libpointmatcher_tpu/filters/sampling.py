"""Structured subsampling filters: VoxelGrid, OctreeGrid, NormalSpace,
CovarianceSampling, Elipsoids, Gestalt.

Filled in progressively; see ``filters/__init__`` for the registry."""

from __future__ import annotations
