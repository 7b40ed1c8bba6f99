"""Pallas kernel tests (interpret mode on CPU; compiled equivalence is
exercised on real TPU by the benchmarks)."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

import libpointmatcher_tpu.ops.knn_pallas as kp
from libpointmatcher_tpu.ops.knn import knn_brute_force


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(kp.pl, "pallas_call", patched)


def _data(n=300, m=700, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 3)).astype(np.float32)
    r = rng.normal(size=(m, 3)).astype(np.float32)
    return q, np.ones(n, bool), r, np.ones(m, bool)


def test_exact_kernel_matches_scan_path():
    q, qm, r, rm = _data()
    qm[5:9] = False
    rm[::3] = False
    d1, i1 = kp.knn1_pallas(q, qm, r, rm)
    d2, i2 = knn_brute_force(q, qm, r, rm, k=1)
    assert np.array_equal(np.asarray(i1), np.asarray(i2)[:, 0])
    # the scan path's ‖q‖²+‖r‖²−2q·r form cancels a few ulps on small
    # distances; the kernel's difference form is the more accurate one
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2)[:, 0], rtol=1e-4, atol=1e-5
    )
    assert np.all(np.asarray(i1)[5:9] == -1)


def test_mxu_kernel_agrees():
    q, qm, r, rm = _data(seed=1)
    d1, i1 = kp.knn1_pallas_mxu(q, qm, r, rm)
    d2, i2 = kp.knn1_pallas(q, qm, r, rm)
    assert np.mean(np.asarray(i1) == np.asarray(i2)) > 0.999
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-5
    )


def test_kernel_all_reference_masked():
    q, qm, r, rm = _data(n=64, m=128)
    rm[:] = False
    d, i = kp.knn1_pallas(q, qm, r, rm)
    assert np.all(np.isinf(np.asarray(d)))
    assert np.all(np.asarray(i) == -1)


def test_kernel_nonaligned_sizes():
    q, qm, r, rm = _data(n=515, m=2051, seed=2)
    d1, i1 = kp.knn1_pallas(q, qm, r, rm, tile_q=256, tile_m=512)
    d2, i2 = knn_brute_force(q, qm, r, rm, k=1)
    assert np.array_equal(np.asarray(i1), np.asarray(i2)[:, 0])


@pytest.mark.parametrize("k", [2, 5, 10, 16, 24])
def test_knnk_kernel_matches_scan_path(k):
    q, qm, r, rm = _data(n=310, m=1100, seed=3)
    qm[5:9] = False
    rm[::5] = False
    d1, i1 = kp.knnk_pallas(q, qm, r, rm, k, tile_q=128, tile_m=512)
    d2, i2 = knn_brute_force(q, qm, r, rm, k=k)
    d1, i1, d2, i2 = map(np.asarray, (d1, i1, d2, i2))
    # same neighbor sets; order ties can differ on equal distances
    assert np.array_equal(np.sort(i1, axis=1), np.sort(i2, axis=1))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)
    # ascending per row (valid rows; masked rows are all-inf → nan diffs)
    valid_rows = np.isfinite(d1[:, 0])
    assert np.all(np.diff(d1[valid_rows], axis=1) >= 0)
    assert np.all(i1[5:9] == -1)


def test_knnk_fewer_refs_than_k():
    q, qm, r, rm = _data(n=70, m=4, seed=4)
    d1, i1 = kp.knnk_pallas(q, qm, r, rm, 8, tile_q=64, tile_m=128)
    d1, i1 = np.asarray(d1), np.asarray(i1)
    assert np.all(np.isfinite(d1[:, :4]))
    assert np.all(np.isinf(d1[:, 4:]))
    assert np.all(i1[:, 4:] == -1)


def test_tile_sweep_pallas_kernel_matches_xla(monkeypatch):
    """The pallas tile-sweep kernel (interpret mode) == the XLA fallback ==
    brute force within the radius."""
    import jax.numpy as jnp
    import libpointmatcher_tpu.ops.tilesweep as ts
    import libpointmatcher_tpu.ops.dispatch as dispatch

    orig = ts.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ts.pl, "pallas_call", patched)

    rng = np.random.default_rng(17)
    q = rng.uniform(-3, 3, size=(600, 3)).astype(np.float32)
    r = rng.uniform(-3, 3, size=(800, 3)).astype(np.float32)
    qm = np.ones(600, bool)
    qm[::13] = False
    rm = np.ones(800, bool)
    rm[::7] = False
    sub = ts.build_sub_blocks(r, rm, cell_size=0.5)
    ta = ts.assign_tiles(q, qm, sub, tile_q=128)
    cand_t, pen, cid = ts.gather_candidates(sub, ta.blocks)

    # XLA fallback path (use_pallas False on CPU), scatter-merge form
    # (per-virtual-tile query rows, the sharded path's layout)
    d_x, i_x = ts.tile_nn1_from_candidates(
        jnp.asarray(q), jnp.asarray(qm), ta.vtile_q_rows(), cand_t, pen,
        cid, 0.5
    )
    # fast parent-merge form must agree
    d_f, i_f = ts.tile_nn1_from_candidates(
        jnp.asarray(q), jnp.asarray(qm), ta.q_rows, cand_t, pen, cid, 0.5,
        parent=ta.parent, vrows=ta.vrows,
    )
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_x),
                               rtol=1e-6, atol=1e-7)
    # force the pallas path (interpret mode)
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    d_p, i_p = ts.tile_nn1_from_candidates(
        jnp.asarray(q), jnp.asarray(qm), ta.q_rows, cand_t, pen, cid, 0.5,
        parent=ta.parent, vrows=ta.vrows,
    )
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                               rtol=1e-6, atol=1e-7)
    # both agree with brute force within the radius
    d_b, i_b = knn_brute_force(q, qm, r, rm, k=1)
    d_b = np.asarray(d_b)[:, 0]
    i_b = np.asarray(i_b)[:, 0]
    cut = (d_b <= 0.25) & qm
    f = np.isfinite(np.asarray(d_x))
    assert np.array_equal(f, cut)
    np.testing.assert_allclose(np.asarray(d_x)[f], d_b[f],
                               rtol=1e-3, atol=1e-5)
