"""YAML pipeline configuration.

Capability parity with ``ICPChainBase::loadFromYaml``
(reference: ICP.cpp:117-236): same section names and module syntax as the
reference's config files (``examples/data/default.yaml``), so reference
configs run unchanged. Unknown sections and unknown/unused module parameters
are hard errors; the transformation module is auto-selected from the error
minimizer (Similarity vs Rigid, reference: ICP.cpp:145-148)."""

from __future__ import annotations

import io
from typing import Any, Dict, List, Mapping, Tuple, Union

import yaml

from .checkers import TransformationCheckerRegistrar
from .errors import ConfigurationError, InvalidModuleType
from .filters.base import DataPointsFilterRegistrar
from .inspectors import InspectorRegistrar
from .loggers import LoggerRegistrar, set_logger
from .matchers import MatcherRegistrar
from .minimizers import ErrorMinimizerRegistrar
from .outlierfilters import OutlierFilterRegistrar
from .transformations import (
    RigidTransformation,
    SimilarityTransformation,
)

__all__ = [
    "configure_chain_from_yaml",
    "filters_from_yaml",
    "parse_module_spec",
    "create_from_spec",
    "VALID_SECTIONS",
]

VALID_SECTIONS = (
    "readingDataPointsFilters",
    "readingStepDataPointsFilters",
    "referenceDataPointsFilters",
    "matcher",
    "outlierFilters",
    "errorMinimizer",
    "transformationCheckers",
    "inspector",
    "logger",
)


def parse_module_spec(node: Any) -> Tuple[str, Dict[str, Any]]:
    """A module node is either a bare name or {name: {param: value}}
    (reference: Registrar.h getNameParamsFromYAML)."""
    if isinstance(node, str):
        return node, {}
    if isinstance(node, Mapping):
        if len(node) != 1:
            raise ConfigurationError(
                f"expected a single module name, got {sorted(node)}"
            )
        name, params = next(iter(node.items()))
        if params is None:
            params = {}
        if not isinstance(params, Mapping):
            raise ConfigurationError(
                f"parameters of module '{name}' must be a mapping, got "
                f"{type(params).__name__}"
            )
        return str(name), {str(k): v for k, v in params.items()}
    raise ConfigurationError(f"cannot parse module spec from {node!r}")


def create_from_spec(registrar, node):
    name, params = parse_module_spec(node)
    return registrar.create(name, params)


def _create_list(registrar, node) -> List:
    if node is None:
        return []
    if not isinstance(node, list):
        raise ConfigurationError(
            f"expected a list of modules for {registrar.interface_name}"
        )
    return [create_from_spec(registrar, item) for item in node]


def filters_from_yaml(source: Union[str, io.IOBase, list]) -> List:
    """Build a standalone DataPointsFilter chain from a bare YAML list
    (reference: DataPointsFilter.cpp:78-93; e.g.
    examples/data/default-convert.yaml)."""
    if isinstance(source, list):
        doc = source
    elif hasattr(source, "read"):
        doc = yaml.safe_load(source)
    else:
        text = source
        if "\n" not in text and (text.endswith(".yaml") or text.endswith(".yml")):
            with open(text) as f:
                text = f.read()
        doc = yaml.safe_load(text)
    if not isinstance(doc, list):
        raise ConfigurationError(
            "expected a YAML list of data-point filters"
        )
    return _create_list(DataPointsFilterRegistrar, doc)


def configure_chain_from_yaml(chain, source: Union[str, io.IOBase, dict]) -> None:
    """Populate an ICPChainBase from YAML text / stream / parsed dict."""
    if isinstance(source, dict):
        doc = source
    elif hasattr(source, "read"):
        doc = yaml.safe_load(source)
    else:
        # a path or raw YAML text
        text = source
        if "\n" not in text and (text.endswith(".yaml") or text.endswith(".yml")):
            with open(text) as f:
                text = f.read()
        doc = yaml.safe_load(text)
    if doc is None:
        doc = {}
    if not isinstance(doc, dict):
        raise ConfigurationError("top-level YAML must be a mapping of sections")

    for section in doc:
        if section not in VALID_SECTIONS:
            raise InvalidModuleType(
                f"unknown section '{section}'; valid sections: "
                f"{list(VALID_SECTIONS)}"
            )

    # Full reset first, mirroring the reference's cleanup() before loading
    # (ICP.cpp:117-128): a config defines the WHOLE chain; sections absent
    # from the YAML leave their slot empty, never a stale module.
    from .inspectors import NullInspector

    chain.matcher = None
    chain.outlier_filters = []
    chain.error_minimizer = None
    chain.checkers = []
    chain.inspector = NullInspector()
    chain.transformations = [RigidTransformation()]

    # logger first (reference: ICP.cpp:131-135)
    if "logger" in doc:
        set_logger(create_from_spec(LoggerRegistrar, doc["logger"]))

    chain.reading_filters = _create_list(
        DataPointsFilterRegistrar, doc.get("readingDataPointsFilters")
    )
    chain.reading_step_filters = _create_list(
        DataPointsFilterRegistrar, doc.get("readingStepDataPointsFilters")
    )
    chain.reference_filters = _create_list(
        DataPointsFilterRegistrar, doc.get("referenceDataPointsFilters")
    )
    if "matcher" in doc:
        chain.matcher = create_from_spec(MatcherRegistrar, doc["matcher"])
    if "outlierFilters" in doc:
        chain.outlier_filters = _create_list(
            OutlierFilterRegistrar, doc["outlierFilters"]
        )
    if "errorMinimizer" in doc:
        chain.error_minimizer = create_from_spec(
            ErrorMinimizerRegistrar, doc["errorMinimizer"]
        )
        # Auto-select the transformation (reference: ICP.cpp:145-148).
        name, _ = parse_module_spec(doc["errorMinimizer"])
        if "Similarity" in name:
            chain.transformations = [SimilarityTransformation()]
        else:
            chain.transformations = [RigidTransformation()]
    if "transformationCheckers" in doc:
        chain.checkers = _create_list(
            TransformationCheckerRegistrar, doc["transformationCheckers"]
        )
    if "inspector" in doc:
        chain.inspector = create_from_spec(InspectorRegistrar, doc["inspector"])
