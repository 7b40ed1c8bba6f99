"""DataPointsFilters — the data-preparation bricks of the pipeline.

Capability parity with the reference filter inventory
(reference: pointmatcher/DataPointsFilters/, registered in Registry.cpp:66-92).
Importing this package registers every filter with
``DataPointsFilterRegistrar``."""

from .base import (  # noqa: F401
    DataPointsFilter,
    DataPointsFilterRegistrar,
    apply_filter_chain,
)
from . import basic  # noqa: F401
from . import normals  # noqa: F401
from . import sampling  # noqa: F401
from . import descriptor  # noqa: F401
