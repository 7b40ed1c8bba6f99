"""Exception hierarchy of the TPU-native point-matcher framework.

Behavioral parity with the reference exception surface
(reference: pointmatcher/PointMatcher.h:83-100, 250-253):
- ``ConvergenceError``   — ICP cannot proceed (empty cloud after filtering, no
  inliers, NaN differential, out-of-bound transform).
- ``TransformationError`` — a transformation matrix fails its validity check
  (e.g. non-orthogonal rotation, reference: TransformationsImpl.cpp:62-63).
- ``InvalidParameter`` / ``InvalidModuleType`` / ``ConfigurationError`` /
  ``InvalidField`` — configuration-time errors.
"""

from __future__ import annotations


class PointMatcherError(RuntimeError):
    """Base class for all framework errors."""


class ConvergenceError(PointMatcherError):
    """ICP could not converge / cannot proceed (reference: PointMatcher.h:94)."""


class TransformationError(PointMatcherError):
    """Invalid transformation parameters (reference: PointMatcher.h:97)."""


class InvalidField(PointMatcherError):
    """A required descriptor/feature field is missing or malformed
    (reference: PointMatcher.h:250-253)."""


class InvalidParameter(PointMatcherError):
    """Bad module parameter: unknown name, out of bounds, or unused
    (reference: Parametrizable.h:83-96)."""


class InvalidModuleType(PointMatcherError):
    """Unknown module name requested from a registrar
    (reference: Registrar.h:176)."""


class ConfigurationError(PointMatcherError):
    """Malformed pipeline configuration (reference: PointMatcher.h:91)."""


class InvalidElement(PointMatcherError):
    """Registrar element not found (reference: Registrar.h:82-88)."""
