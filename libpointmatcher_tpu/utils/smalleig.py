"""Small symmetric eigendecompositions as fuseable vector ops.

XLA's generic ``eigh`` lowers to a heavyweight factorization kernel sized
for large matrices; calling it on the ICP loop's 6x6 normal matrix (or on
[N,3,3] neighborhood covariances) pays that kernel's fixed cost every time.
These cyclic-Jacobi implementations are branch-free elementwise jnp — they
fuse into the surrounding program, vmap/batch trivially, and for p <= 6
reach f32 machine precision within a few sweeps (Jacobi converges
quadratically once sweeps start; measured on representative p2plane
normal matrices incl. singular planar cases, 4 sweeps already hit f32
machine precision — the default keeps one sweep of margin; each sweep is
p(p-1)/2 sequential rotations, so sweeps are latency on the loop's
critical path).

Used by the minimizers' minimal-norm solve (reference behavior:
PointToPlane.cpp:108-161 Cholesky-else-QR) and the normal-estimation
filters' batched neighborhood eigens (reference: SurfaceNormal.cpp:82-290).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["eigh_jacobi", "eigh_sorted", "eigh3_sorted"]


def _jacobi_rotation(A, V, i, j):
    """One (i, j) Jacobi rotation, branch-free, batched over leading dims."""
    aij = A[..., i, j]
    aii = A[..., i, i]
    ajj = A[..., j, j]
    # tan(2θ) form: t = sign(τ)/(|τ|+sqrt(1+τ²)), τ=(ajj−aii)/(2aij).
    # aij == 0 → τ = ±inf/nan → force t = 0 (identity rotation). Tiny but
    # nonzero aij gives |τ| huge → τ² = inf → t = 0 as well (harmless).
    safe = jnp.where(aij == 0.0, 1.0, 2.0 * aij)
    tau = (ajj - aii) / safe
    # sign(tau) must treat tau == 0 as +1: equal diagonal entries with a
    # nonzero off-diagonal (tau == 0) need the full 45-degree rotation
    # (t = 1); jnp.sign(0) = 0 would degenerate to the identity while the
    # force-zero below silently corrupts the matrix.
    sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.logical_or(aij == 0.0, jnp.isnan(t)), 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    c_ = c[..., None]
    s_ = s[..., None]
    # rows
    Ai = c_ * A[..., i, :] - s_ * A[..., j, :]
    Aj = s_ * A[..., i, :] + c_ * A[..., j, :]
    A = A.at[..., i, :].set(Ai).at[..., j, :].set(Aj)
    # columns
    Ai = c_ * A[..., :, i] - s_ * A[..., :, j]
    Aj = s_ * A[..., :, i] + c_ * A[..., :, j]
    A = A.at[..., :, i].set(Ai).at[..., :, j].set(Aj)
    # exact zero of the eliminated entry (symmetric)
    zero = jnp.zeros_like(aij)
    A = A.at[..., i, j].set(zero).at[..., j, i].set(zero)
    # accumulate eigenvectors (columns of V)
    Vi = c_ * V[..., :, i] - s_ * V[..., :, j]
    Vj = s_ * V[..., :, i] + c_ * V[..., :, j]
    V = V.at[..., :, i].set(Vi).at[..., :, j].set(Vj)
    return A, V


def _round_robin_pairs(p):
    """Tournament schedule: p−1 rounds of p/2 DISJOINT index pairs
    covering every (i, j) exactly once (p even)."""
    others = list(range(1, p))
    rounds = []
    for _ in range(p - 1):
        arr = [0] + others
        rounds.append(tuple(
            (min(arr[k], arr[p - 1 - k]), max(arr[k], arr[p - 1 - k]))
            for k in range(p // 2)
        ))
        others = [others[-1]] + others[:-1]
    return rounds


def _jacobi_round(A, V, pairs):
    """One parallel-Jacobi round: all (disjoint) ``pairs`` rotated JOINTLY
    via a single p×p orthogonal G (A ← GᵀAG, V ← VG). Mathematically equal
    to applying the rotations sequentially — disjoint Givens commute and
    each pivot (aii, ajj, aij) is untouched by the others — but the
    sequential op chain is one matmul triple instead of per-rotation
    row/column updates (the 6×6 p2plane solve sits on the fused loop's
    critical path)."""
    import numpy as np

    p = A.shape[-1]
    cs = []
    for (i, j) in pairs:
        aij = A[..., i, j]
        aii = A[..., i, i]
        ajj = A[..., j, j]
        safe = jnp.where(aij == 0.0, 1.0, 2.0 * aij)
        tau = (ajj - aii) / safe
        sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(jnp.logical_or(aij == 0.0, jnp.isnan(t)), 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        cs.append((c, t * c))

    G = jnp.zeros_like(A)
    for (i, j), (c, s) in zip(pairs, cs):
        Dk = np.zeros((p, p), np.float32)
        Dk[i, i] = Dk[j, j] = 1.0
        Sk = np.zeros((p, p), np.float32)
        Sk[i, j] = 1.0
        Sk[j, i] = -1.0
        G = G + c[..., None, None] * Dk + s[..., None, None] * Sk
    A = jnp.swapaxes(G, -1, -2) @ A @ G
    # exact zeros of the eliminated entries + re-symmetrize the pivots
    zmask = np.ones((p, p), np.float32)
    for (i, j) in pairs:
        zmask[i, j] = zmask[j, i] = 0.0
    A = A * zmask
    V = V @ G
    return A, V


def eigh_jacobi(A, sweeps: int = 4):
    """Eigendecomposition of a small symmetric matrix (batched over leading
    dims): returns ``(w [..., p], V [..., p, p])`` with A ≈ V·diag(w)·Vᵀ.
    Eigenvalues are UNSORTED (use :func:`eigh3_sorted` for the ascending
    convention). Even p runs parallel-Jacobi rounds (p−1 joint rotations
    per sweep instead of p(p−1)/2 sequential ones — a ~3× shorter
    sequential chain for the 6×6 loop solve); odd p keeps the sequential
    cyclic order."""
    p = A.shape[-1]
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    V = jnp.broadcast_to(jnp.eye(p, dtype=A.dtype), A.shape)
    if p % 2 == 0 and p > 2:
        rounds = _round_robin_pairs(p)
        for _ in range(sweeps):
            for pairs in rounds:
                A, V = _jacobi_round(A, V, pairs)
    else:
        for _ in range(sweeps):
            for i in range(p - 1):
                for j in range(i + 1, p):
                    A, V = _jacobi_rotation(A, V, i, j)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def _order2(w, V, i, j):
    """Swap eigenpairs i, j wherever w[..., i] > w[..., j] (vector select)."""
    swap = w[..., i] > w[..., j]
    wi = jnp.where(swap, w[..., j], w[..., i])
    wj = jnp.where(swap, w[..., i], w[..., j])
    w = w.at[..., i].set(wi).at[..., j].set(wj)
    s_ = swap[..., None]
    Vi = jnp.where(s_, V[..., :, j], V[..., :, i])
    Vj = jnp.where(s_, V[..., :, i], V[..., :, j])
    V = V.at[..., :, i].set(Vi).at[..., :, j].set(Vj)
    return w, V


def eigh_sorted(A, sweeps: int = 5):
    """``jnp.linalg.eigh`` drop-in for small [..., p, p] symmetric matrices:
    ascending eigenvalues, matching eigenvector columns (bubble network —
    p(p−1)/2 vector selects)."""
    w, V = eigh_jacobi(A, sweeps=sweeps)
    p = A.shape[-1]
    for end in range(p - 1, 0, -1):
        for i in range(end):
            w, V = _order2(w, V, i, i + 1)
    return w, V


# backwards-compatible alias for the common 3x3 case
eigh3_sorted = eigh_sorted
