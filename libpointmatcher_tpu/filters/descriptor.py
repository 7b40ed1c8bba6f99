"""Descriptor-computing filters: RemoveSensorBias, Gestalt descriptors, etc.

Filled in progressively; see ``filters/__init__`` for the registry."""

from __future__ import annotations
