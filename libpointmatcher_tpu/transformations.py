"""Transformations: apply an SE(n)/Sim(n) matrix to a cloud, validate, repair.

Capability parity with the reference transformation layer
(reference: PointMatcher.h:404-434, TransformationsImpl.{h,cpp}):
applying a transform moves the points and **rotates only** the directional
descriptor channels (``normals``, ``observationDirections``, and the
eigen-vector channels — reference: TransformationsImpl.cpp:50-87)."""

from __future__ import annotations

import jax.numpy as jnp

from .cloud import PointCloud
from .errors import TransformationError
from .registry import Parametrizable, Registrar
from .utils import se3

__all__ = [
    "Transformation",
    "RigidTransformation",
    "SimilarityTransformation",
    "PureTranslation",
    "TransformationRegistrar",
]

TransformationRegistrar = Registrar("Transformation")

# Descriptor channels that rotate with the cloud (reference rotates
# normals/observationDirections, TransformationsImpl.cpp:73-80; we extend the
# same treatment to eigVectors which are stored row-major d×d per point).
_DIRECTIONAL = ("normals", "observationDirections")


def _rotate_descriptors(descriptors, R):
    d = R.shape[0]
    out = dict(descriptors)
    for name in _DIRECTIONAL:
        if name in out and out[name].shape[1] == d:
            out[name] = out[name] @ R.T
    if "eigVectors" in out and out["eigVectors"].shape[1] == d * d:
        # serialized row-major matrix whose *columns* are eigenvectors
        # (utils.h serializeEigVec); rotating the cloud maps V → R·V
        ev = out["eigVectors"].reshape(-1, d, d)
        out["eigVectors"] = jnp.einsum("ij,njk->nik", R, ev).reshape(-1, d * d)
    return out


class Transformation(Parametrizable):
    """Interface (reference: PointMatcher.h:404-421)."""

    def compute(self, cloud: PointCloud, T) -> PointCloud:
        raise NotImplementedError

    def check_parameters(self, T) -> bool:
        return True

    def correct_parameters(self, T):
        return T


@TransformationRegistrar.register
class RigidTransformation(Transformation):
    """SE(n) apply with orthogonality validation
    (reference: TransformationsImpl.cpp:50-151)."""

    def compute(self, cloud: PointCloud, T) -> PointCloud:
        d = cloud.dim
        R = T[:d, :d]
        pts = se3.apply(T, cloud.points)
        return PointCloud(
            pts, cloud.mask, _rotate_descriptors(cloud.descriptors, R), cloud.times
        )

    def check_parameters(self, T) -> bool:
        """|det R − 1| ≤ 1e-3 (reference: TransformationsImpl.cpp:91-105)."""
        d = T.shape[0] - 1
        det = jnp.linalg.det(T[:d, :d])
        return bool(jnp.abs(det - 1.0) <= 1e-3)

    def compute_checked(self, cloud: PointCloud, T) -> PointCloud:
        if not self.check_parameters(T):
            raise TransformationError(
                "RigidTransformation: T does not represent a valid rigid "
                "transformation (|det R - 1| > 1e-3); use correct_parameters()"
            )
        return self.compute(cloud, T)

    def correct_parameters(self, T):
        """Re-orthogonalize via polar decomposition
        (reference re-weaves with cross products, TransformationsImpl.cpp:109-151;
        SVD projection is the canonical equivalent)."""
        return se3.orthogonalize(T)


@TransformationRegistrar.register
class SimilarityTransformation(Transformation):
    """Sim(n) apply: scale·R + t; no validity constraint
    (reference: TransformationsImpl.cpp:158-210)."""

    def compute(self, cloud: PointCloud, T) -> PointCloud:
        d = cloud.dim
        sR = T[:d, :d]
        pts = cloud.points @ sR.T + T[:d, d]
        # rotate directions by the rotation part only
        scale = jnp.linalg.det(sR) ** (1.0 / d)
        R = sR / scale
        return PointCloud(
            pts, cloud.mask, _rotate_descriptors(cloud.descriptors, R), cloud.times
        )


@TransformationRegistrar.register
class PureTranslation(Transformation):
    """Applies only the translation component
    (reference: TransformationsImpl.cpp:216-269)."""

    def compute(self, cloud: PointCloud, T) -> PointCloud:
        d = cloud.dim
        return cloud.replace(points=cloud.points + T[:d, d])

    def check_parameters(self, T) -> bool:
        d = T.shape[0] - 1
        return bool(jnp.allclose(T[:d, :d], jnp.eye(d, dtype=T.dtype), atol=1e-6))

    def correct_parameters(self, T):
        d = T.shape[0] - 1
        return jnp.eye(d + 1, dtype=T.dtype).at[:d, d].set(T[:d, d])
