"""SE(2)/SE(3) helpers used throughout the jitted compute path.

All functions are shape-static and branch-free so they can live inside
``jax.jit`` / ``lax.while_loop``. Transformations are (d+1)x(d+1) homogeneous
matrices, matching the reference's ``TransformationParameters``
(reference: PointMatcher.h:182)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "identity",
    "rotation",
    "translation",
    "compose",
    "inverse",
    "apply",
    "rodrigues",
    "rot2d",
    "rotation_angle_between",
    "orthogonalize",
]


def identity(dim: int, dtype=jnp.float32):
    return jnp.eye(dim + 1, dtype=dtype)


def rotation(T):
    d = T.shape[-1] - 1
    return T[..., :d, :d]


def translation(T):
    d = T.shape[-1] - 1
    return T[..., :d, d]


def compose(A, B):
    return A @ B


def inverse(T):
    """Closed-form SE(n) inverse: [R t]⁻¹ = [Rᵀ -Rᵀt]."""
    d = T.shape[-1] - 1
    R = T[:d, :d]
    t = T[:d, d]
    out = jnp.eye(d + 1, dtype=T.dtype)
    out = out.at[:d, :d].set(R.T)
    out = out.at[:d, d].set(-R.T @ t)
    return out

def from_rt(R, t):
    d = R.shape[-1]
    T = jnp.eye(d + 1, dtype=R.dtype)
    T = T.at[:d, :d].set(R)
    T = T.at[:d, d].set(t)
    return T


def apply(T, points):
    """Apply homogeneous T to [N, d] points → [N, d]."""
    d = points.shape[-1]
    R = T[:d, :d]
    t = T[:d, d]
    return points @ R.T + t


def rodrigues(omega):
    """Axis-angle vector [3] → rotation matrix [3,3], Taylor-safe at 0.

    Equivalent to the reference's angle-axis reconstruction
    (reference: PointToPlane.cpp:263) but branch-free: where the reference
    patches a NaN rotation back to identity (PointToPlane.cpp:289-297), the
    sinc-style series makes θ→0 exact."""
    theta2 = jnp.sum(omega * omega)
    # +tiny keeps the sqrt differentiable at ω = 0 (the Gauss-Newton
    # linearization point in the pose-graph solver)
    theta = jnp.sqrt(theta2 + 1e-30)
    # sin(θ)/θ and (1-cos θ)/θ² with series fallback near zero
    small = theta < 1e-6
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    wx, wy, wz = omega[0], omega[1], omega[2]
    K = jnp.array(
        [[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]], dtype=omega.dtype
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * K + b * (K @ K)


def log_rotation(R):
    """Rotation matrix [3,3] → axis-angle vector [3], Taylor- and
    gradient-safe (differentiable at the identity — required by the
    pose-graph Gauss-Newton, which linearizes exactly there).

    Inverse of :func:`rodrigues` for angles in [0, π)."""
    w = jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]],
        dtype=R.dtype,
    )
    # ‖w‖ = 2 sin θ; the +tiny keeps the sqrt differentiable at θ = 0
    s = 0.5 * jnp.sqrt(jnp.sum(w * w) + 1e-30)
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arctan2(s, c)
    small = s < 1e-5
    safe_s = jnp.where(small, 1.0, s)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_s))
    return scale * w


def rot2d(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[c, -s], [s, c]])


def rotation_angle_between(Ra, Rb):
    """Geodesic angle between two rotations (2D or 3D).

    3D: angle of Ra·Rbᵀ via acos((tr−1)/2) — identical to the reference's
    quaternion ``angularDistance`` (TransformationCheckersImpl.cpp:144).
    2D: |Δθ| from the relative 2x2 rotation."""
    d = Ra.shape[-1]
    Rrel = Ra @ Rb.T
    if d == 2:
        return jnp.abs(jnp.arctan2(Rrel[1, 0], Rrel[0, 0]))
    cos_angle = (jnp.trace(Rrel) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(cos_angle, -1.0, 1.0))


def orthogonalize(T):
    """Project the rotation block onto SO(d) via SVD (polar decomposition).

    The recovery primitive for drifted rotations — capability parity with
    ``RigidTransformation::correctParameters``
    (reference: TransformationsImpl.cpp:109-151), done the numerically
    canonical way instead of cross-product re-weaving."""
    d = T.shape[-1] - 1
    R = T[:d, :d]
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones((d,), dtype=T.dtype).at[-1].set(det)
    Rn = (U * D[None, :]) @ Vt
    return T.at[:d, :d].set(Rn)


def normalize_angle(a):
    """Wrap to (-π, π] (reference: Functions.h:43-60)."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def pose_to_vec(T):
    """Homogeneous transform → minimal pose vector ([θ, t] in 2D,
    [ω, t] in 3D) with the decoupled rotation/translation convention."""
    d = T.shape[-1] - 1
    if d == 2:
        theta = jnp.arctan2(T[1, 0], T[0, 0])
        return jnp.concatenate([theta[None], T[:2, 2]])
    return jnp.concatenate([log_rotation(T[:3, :3]), T[:3, 3]])


def vec_to_pose(v, dim: int):
    """Inverse of :func:`pose_to_vec`."""
    if dim == 2:
        return from_rt(rot2d(v[0]).astype(v.dtype), v[1:3])
    return from_rt(rodrigues(v[:3]), v[3:6])
