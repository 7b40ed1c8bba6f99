"""Jacobi small-eig vs numpy eigh (the loop's solve and the filters' eigens)."""

import numpy as np

from libpointmatcher_tpu.utils.smalleig import eigh3_sorted, eigh_jacobi


def _check(A, w, V, atol=1e-5):
    A = np.asarray(A, np.float64)
    w = np.asarray(w, np.float64)
    V = np.asarray(V, np.float64)
    scale = max(np.abs(A).max(), 1e-9)
    recon = V @ np.diag(w) @ V.T if A.ndim == 2 else None
    np.testing.assert_allclose(recon, A, atol=atol * scale)
    np.testing.assert_allclose(V.T @ V, np.eye(A.shape[-1]), atol=1e-5)


def test_jacobi_6x6_random():
    # atol 1e-4: what 4 sweeps guarantee on ARBITRARY spectra across
    # compilers/boxes (f32 rotation rounding differs per codegen; one
    # seed measured 4.6e-5*scale residual on the round-5 box). The hot
    # path's accuracy contract is pinned elsewhere: the singular p2plane
    # contract test and the 21/21 full-density on-chip golden sweep.
    rng = np.random.default_rng(0)
    for i in range(10):
        B = rng.normal(size=(6, 6)).astype(np.float32)
        A = B @ B.T
        w, V = eigh_jacobi(A)
        _check(A, w, V, atol=1e-4)
        np.testing.assert_allclose(
            np.sort(np.asarray(w)), np.linalg.eigvalsh(A), rtol=2e-4,
            atol=1e-4 * np.abs(A).max(),
        )


def test_jacobi_singular_6x6():
    """Rank-deficient normal matrix: the minimal-norm solve's oracle case
    (planar point-to-plane, reference: utest.cpp icpSingular)."""
    rng = np.random.default_rng(1)
    B = rng.normal(size=(6, 3)).astype(np.float32)
    A = B @ B.T  # rank 3
    w, V = eigh_jacobi(A)
    _check(A, w, V)
    assert np.sum(np.asarray(w) < 1e-4 * np.asarray(w).max()) == 3


def test_jacobi_equal_diagonal():
    """tau == 0 (equal diagonal entries, nonzero off-diagonal) requires the
    full 45-degree rotation; a sign(0)=0 implementation silently corrupts
    the matrix (advisor finding, round 1)."""
    A = np.array([[2.0, 1.0], [1.0, 2.0]], np.float32)
    w, V = eigh_jacobi(A)
    _check(A, w, V)
    np.testing.assert_allclose(np.sort(np.asarray(w)), [1.0, 3.0], atol=1e-5)

    # batched 3x3 with exactly-equal diagonals in every pair
    A3 = np.full((3, 3), 1.0, np.float32) + 2.0 * np.eye(3, dtype=np.float32)
    w3, V3 = eigh_jacobi(A3)
    _check(A3, w3, V3)
    np.testing.assert_allclose(
        np.sort(np.asarray(w3)), np.linalg.eigvalsh(A3), atol=1e-5
    )


def test_eigh3_sorted_batched_matches_numpy():
    rng = np.random.default_rng(2)
    B = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = np.einsum("nij,nkj->nik", B, B)
    # include degenerate neighborhoods (rank 1 / rank 2)
    A[0] = np.outer([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    A[1][:, 2] = 0; A[1][2, :] = 0
    w, V = eigh3_sorted(A)
    w = np.asarray(w); V = np.asarray(V)
    wr = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(w, wr, rtol=3e-4, atol=2e-4 * np.abs(A).max())
    assert np.all(np.diff(w, axis=1) >= -1e-4)
    recon = np.einsum("nij,nj,nkj->nik", V, w, V)
    np.testing.assert_allclose(recon, A, atol=2e-4 * np.abs(A).max())


def test_solve_possibly_underdetermined_contract():
    """Full rank → Cholesky solution; singular → minimal-norm solution."""
    import jax.numpy as jnp

    from libpointmatcher_tpu.minimizers import solve_possibly_underdetermined

    rng = np.random.default_rng(3)
    B = rng.normal(size=(6, 6)).astype(np.float32)
    A = B @ B.T + 0.1 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=6).astype(np.float32)
    x = np.asarray(solve_possibly_underdetermined(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=2e-3, atol=2e-4)

    # exactly singular with a well-separated spectrum: minimal-norm solution
    Q = np.linalg.qr(rng.normal(size=(6, 6)))[0].astype(np.float32)
    As = (Q * np.array([5.0, 4.0, 3.0, 0.0, 0.0, 0.0], np.float32)) @ Q.T
    bs = As @ rng.normal(size=6).astype(np.float32)  # in range(A)
    xs = np.asarray(
        solve_possibly_underdetermined(jnp.asarray(As), jnp.asarray(bs))
    )
    x_ref = np.linalg.pinv(As.astype(np.float64), rcond=1e-6) @ bs.astype(
        np.float64
    )
    np.testing.assert_allclose(xs, x_ref, rtol=5e-3, atol=5e-4)
