"""Distributed pose-graph optimization by matrix-free Gauss-Newton.

The reference stops at pairwise registration; chaining scans
(align_sequence) accumulates drift with no global correction. This module is
the new-design piece called for at pod scale: given keyframe poses and
relative-pose constraints from scan-to-map registrations (each optionally
weighted by the Censi covariance the WithCov minimizers produce), jointly
optimize all poses.

TPU-idiomatic solver: Gauss-Newton where each normal-equation solve is
conjugate gradient with **matrix-free** JᵀWJ products via jvp/vjp — no
[6K, 6K] Hessian, no sparse factorization (pointer-chasing Cholesky does not
map to the MXU). Everything is one jit-compiled program; sharding the
constraint arrays across a mesh makes XLA insert the psum reductions that
assemble the gradient and curvature products — the distributed
Schur/collective formulation comes for free from the data layout.

Parametrization: poses as [K, 4, 4]; updates as per-pose twists
δ = (ω, u) ∈ R⁶ applied as T ← T·exp(δ) with the rotation/translation
decoupled retraction. Pose 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import se3

__all__ = ["PoseGraphEdges", "optimize_pose_graph", "relative_pose_residual"]


class PoseGraphEdges(NamedTuple):
    """Relative-pose constraints i → j."""

    i: jnp.ndarray  # [C] int32 source pose index
    j: jnp.ndarray  # [C] int32 target pose index
    T_meas: jnp.ndarray  # [C, 4, 4] measured T_i_j (j expressed in i)
    weight: jnp.ndarray  # [C] or [C, 6] per-residual-component weights


def _retract(poses, delta):
    """poses [K,4,4] ∘ exp(delta [K,6]) with decoupled rot/trans."""

    def one(T, d):
        R = T[:3, :3] @ se3.rodrigues(d[:3])
        t = T[:3, 3] + T[:3, :3] @ d[3:6]
        return se3.from_rt(R, t)

    return jax.vmap(one)(poses, delta)


def relative_pose_residual(poses, edges: PoseGraphEdges):
    """r_c = [log(R_err), t_err] ∈ R⁶ for every constraint.

    T_err = T_meas⁻¹ · T_i⁻¹ · T_j; zero iff the poses satisfy the
    measurement."""

    def one(i, j, T_meas):
        Ti = poses[i]
        Tj = poses[j]
        T_ij = se3.inverse(Ti) @ Tj
        T_err = se3.inverse(T_meas) @ T_ij
        return jnp.concatenate(
            [se3.log_rotation(T_err[:3, :3]), T_err[:3, 3]]
        )

    return jax.vmap(one)(edges.i, edges.j, edges.T_meas)  # [C, 6]


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def optimize_pose_graph(
    poses,
    edges: PoseGraphEdges,
    gn_iters: int = 10,
    cg_iters: int = 25,
    damping: float = 1e-6,
):
    """→ (optimized poses [K,4,4], final residual norm).

    Gauss-Newton with CG inner solves; all products are jvp/vjp through the
    residual, so the cost per CG step is two sweeps over the constraint
    array — shard the edge arrays over a mesh and these sweeps (and their
    reductions) partition across chips."""
    poses = jnp.asarray(poses, jnp.float32)
    k = poses.shape[0]
    w = edges.weight
    if w.ndim == 1:
        w = w[:, None]

    gauge = jnp.ones((k, 6), poses.dtype).at[0].set(0.0)  # fix pose 0

    def gn_step(poses, _):
        def res_of_delta(delta):
            return relative_pose_residual(_retract(poses, delta * gauge), edges)

        delta0 = jnp.zeros((k, 6), poses.dtype)
        r0 = res_of_delta(delta0)  # [C, 6]

        def jtw(vec_c):  # Jᵀ(W·vec): [C,6] → [K,6]
            _, vjp = jax.vjp(res_of_delta, delta0)
            return vjp(w * vec_c)[0]

        def jv(delta):  # J·delta: [K,6] → [C,6]
            return jax.jvp(res_of_delta, (delta0,), (delta,))[1]

        b = -jtw(r0)

        def A(x):  # (JᵀWJ + λI)·x
            return jtw(jv(x)) + damping * x

        # conjugate gradient (matrix-free normal equations)
        def cg_body(_, carry):
            x, r, p, rs = carry
            Ap = A(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
            return (x, r, p, rs_new)

        x0 = jnp.zeros_like(b)
        rs0 = jnp.vdot(b, b)
        x, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, b, b, rs0)
        )
        new_poses = _retract(poses, x * gauge)
        return new_poses, jnp.sqrt(jnp.sum((w * res_of_delta(delta0)) ** 2))

    poses, _ = jax.lax.scan(gn_step, poses, None, length=gn_iters)
    final_res = relative_pose_residual(poses, edges)
    return poses, jnp.linalg.norm(w * final_res)


def edges_from_numpy(i, j, T_meas, weight=None) -> PoseGraphEdges:
    i = jnp.asarray(np.asarray(i, np.int32))
    j = jnp.asarray(np.asarray(j, np.int32))
    T_meas = jnp.asarray(np.asarray(T_meas, np.float32))
    if weight is None:
        weight = jnp.ones((T_meas.shape[0],), jnp.float32)
    else:
        weight = jnp.asarray(np.asarray(weight, np.float32))
    return PoseGraphEdges(i, j, T_meas, weight)
