"""libpointmatcher_tpu — a TPU-native point-cloud registration framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
libpointmatcher (the modular ICP library; reference mounted read-only at
/root/reference): masked fixed-shape point clouds, an MXU-tiled
nearest-neighbor matcher in place of the kd-tree, jit-compiled
``lax.while_loop`` ICP engines, the full module registry (data filters,
outlier filters, error minimizers, transformation checkers, inspectors,
loggers) configurable from reference-format YAML, CSV/VTK/PLY/PCD IO, and
multi-device sharding for large clouds and batched registration.
"""

import jax as _jax

# On TPU, float32 matmuls default to single-pass bf16 on the MXU. For
# registration geometry that is catastrophic in a subtle way: the 4x4
# transform compositions inside the ICP loop round their diagonals to 1.0
# (bf16 spacing at 1.0 is 2^-8), so small per-iteration rotations degrade to
# non-orthogonal I + θK updates and the pose drifts — caught by the
# force4DOF golden config failing at 6.5% on chip while exact on CPU. All
# matmuls in this package therefore run at HIGHEST precision (true f32 via
# multi-pass bf16); the performance-critical distance kernel does not use
# the MXU and is unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

# Opt-in persistent compilation cache: first compiles of the fused ICP loop
# are expensive (tens of seconds on TPU), and production serving restarts
# should not re-pay them. Point PMTPU_CACHE_DIR at a writable directory to
# reuse compiled programs across processes.
import os as _os

if _os.environ.get("PMTPU_CACHE_DIR"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["PMTPU_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .cloud import PointCloud  # noqa: F401
from .errors import (  # noqa: F401
    ConfigurationError,
    ConvergenceError,
    InvalidField,
    InvalidModuleType,
    InvalidParameter,
    PointMatcherError,
    TransformationError,
)
from .matchers import Matcher, Matches, MatcherRegistrar  # noqa: F401
from .minimizers import ErrorMinimizer, ErrorMinimizerRegistrar  # noqa: F401
from .outlierfilters import OutlierFilter, OutlierFilterRegistrar  # noqa: F401
from .checkers import (  # noqa: F401
    TransformationChecker,
    TransformationCheckerRegistrar,
)
from .transformations import (  # noqa: F401
    RigidTransformation,
    SimilarityTransformation,
    PureTranslation,
    TransformationRegistrar,
)
from .inspectors import Inspector, InspectorRegistrar  # noqa: F401
from .loggers import Logger, LoggerRegistrar, set_logger  # noqa: F401
from .filters import (  # noqa: F401
    DataPointsFilter,
    DataPointsFilterRegistrar,
    apply_filter_chain,
)
from .icp import ICP, ICPChainBase, ICPSequence  # noqa: F401
from . import io  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "PointCloud",
    "ICP",
    "ICPSequence",
    "ICPChainBase",
    "Matches",
    "io",
    "DataPointsFilterRegistrar",
    "MatcherRegistrar",
    "OutlierFilterRegistrar",
    "ErrorMinimizerRegistrar",
    "TransformationCheckerRegistrar",
    "TransformationRegistrar",
    "InspectorRegistrar",
    "LoggerRegistrar",
]
