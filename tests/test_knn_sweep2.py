"""Survivor-list sweep (ops/knn_sweep2.py): interpret-mode exactness vs
brute force, survival safety (the true winner's chunk always survives),
transported-bound fusion, and degenerate shapes."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

import jax.numpy as jnp

import libpointmatcher_tpu.ops.knn_skip as ks
import libpointmatcher_tpu.ops.knn_sweep2 as k2
from libpointmatcher_tpu.ops.knn import knn_brute_force


@pytest.fixture
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(k2.pl, "pallas_call", patched)


def _cloudlike(n=900, m=1400, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    core = rng.normal(size=(n * 3 // 4, 3)) * 0.7
    peri = rng.uniform(-8, 8, size=(n - len(core), 3))
    q = (np.concatenate([core, peri]) * scale).astype(np.float32)
    rcore = rng.normal(size=(m * 3 // 4, 3)) * 0.7 + 0.05
    rperi = rng.uniform(-8, 8, size=(m - len(rcore), 3))
    r = (np.concatenate([rcore, rperi]) * scale).astype(np.float32)
    qm = rng.random(n) < 0.8
    rm = rng.random(m) < 0.95
    return q, qm, r, rm


def _sorted_tables(r, rm):
    rorder, _ = ks.morton_argsort(r, rm)
    rs = r[rorder]
    rsm = rm[rorder]
    return rorder, rs, rsm, k2.chunked_ref_table(rs, rsm), \
        k2.chunk_summaries(rs, rsm)


@pytest.mark.parametrize("seed,scale", [(0, 1.0), (3, 50.0), (7, 0.02)])
def test_v2_matches_brute_force(interpret_mode, seed, scale):
    q, qm, r, rm = _cloudlike(seed=seed, scale=scale)
    rorder, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    qorder, qinv = ks.morton_argsort(q, qm)
    qs = q[qorder]
    qsm = qm[qorder]

    # iteration 0: no transported bound
    ub_t = jnp.full((len(qs),), jnp.inf, jnp.float32)
    d0, i0, frac0 = k2.nn1_sorted_v2(
        jnp.asarray(qs), jnp.asarray(qsm), ub_t,
        jnp.asarray(rt3), jnp.asarray(ct))
    d0, i0 = np.asarray(d0), np.asarray(i0)

    db, ib = knn_brute_force(q, qm, r, rm, k=1)
    db = np.asarray(db)[:, 0]
    ib = np.asarray(ib)[:, 0]
    ids = np.where(i0 >= 0, rorder[np.clip(i0, 0, None)], -1)[qinv]
    d = d0[qinv]
    np.testing.assert_allclose(d[qm], db[qm], rtol=1e-5, atol=1e-6)
    assert np.array_equal(ids[qm], ib[qm])
    assert np.all(ids[~qm] == -1)
    # the centroid bound prunes something even at iteration 0
    assert float(frac0) < 0.9

    # warm iteration: transported bound from the winners themselves
    cand = rs[np.clip(i0, 0, len(rs) - 1)]
    step = 0.0  # same pose: bound = exact winner distance
    ub_t2 = np.where(
        i0 >= 0, np.sqrt(((qs - cand) ** 2).sum(1)) + step, np.inf
    ).astype(np.float32)
    d1, i1, frac1 = k2.nn1_sorted_v2(
        jnp.asarray(qs), jnp.asarray(qsm), jnp.asarray(ub_t2),
        jnp.asarray(rt3), jnp.asarray(ct))
    np.testing.assert_allclose(np.asarray(d1)[qsm], d0[qsm],
                               rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.asarray(i1)[qsm], i0[qsm])
    assert float(frac1) <= float(frac0) + 1e-6


def test_v2_survival_safety(interpret_mode):
    """Every valid query's true NN chunk must be flagged surviving."""
    q, qm, r, rm = _cloudlike(n=600, m=1000, seed=11)
    rorder, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    qorder, _ = ks.morton_argsort(q, qm)
    qs = q[qorder]
    qsm = qm[qorder]
    tile_q = 256
    step = 8 * tile_q  # stage A processes 8 tiles per grid step
    n_pad = -(-len(qs) // step) * step
    qp = np.zeros((n_pad, 8), np.float32)
    qp[:len(qs), :3] = qs
    qp[:, 3] = k2._FAR
    qp[:len(qs), 3] = np.where(qsm, 0.0, k2._FAR)
    qp[:, 4] = np.inf
    _, surv = k2.survivors_and_bounds(jnp.asarray(qp), jnp.asarray(ct),
                                      tile_q=tile_q)
    surv = np.asarray(surv)
    d2 = ((qs[:, None, :].astype(np.float64)
           - rs[None].astype(np.float64)) ** 2).sum(-1)
    d2[:, ~rsm] = np.inf
    nn = d2.argmin(1)
    for qi in np.flatnonzero(qsm):
        if not np.isfinite(d2[qi, nn[qi]]):
            continue
        assert surv[qi // tile_q, nn[qi] // 128] == 1, qi


def test_v2_stream_matches_resident(interpret_mode):
    """The HBM-streaming sweep (per-survivor DMA, double buffered) must
    reproduce the VMEM-resident sweep bit for bit."""
    q, qm, r, rm = _cloudlike(n=800, m=2000, seed=5)
    rorder, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    qorder, _ = ks.morton_argsort(q, qm)
    qs = jnp.asarray(q[qorder])
    qsm = jnp.asarray(qm[qorder])
    ub = jnp.full((len(q),), jnp.inf, jnp.float32)
    d_a, i_a, _ = k2.nn1_sorted_v2(qs, qsm, ub, jnp.asarray(rt3),
                                   jnp.asarray(ct))
    d_b, i_b, _ = k2.nn1_sorted_v2(qs, qsm, ub, jnp.asarray(rt3),
                                   jnp.asarray(ct), stream=True)
    qsm_np = np.asarray(qsm)
    assert np.array_equal(np.asarray(d_a)[qsm_np], np.asarray(d_b)[qsm_np])
    assert np.array_equal(np.asarray(i_a)[qsm_np], np.asarray(i_b)[qsm_np])


def test_v2_empty_and_tiny(interpret_mode):
    # all-invalid queries and a single-chunk map
    r = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    rm = np.ones(100, bool)
    _, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    q = np.zeros((10, 3), np.float32)
    qm = np.zeros(10, bool)
    d, ids, _ = k2.nn1_sorted_v2(
        jnp.asarray(q), jnp.asarray(qm),
        jnp.full((10,), jnp.inf, jnp.float32),
        jnp.asarray(rt3), jnp.asarray(ct))
    assert np.all(np.isinf(np.asarray(d)))
    assert np.all(np.asarray(ids) == -1)


@pytest.mark.parametrize("k,seed", [(2, 1), (4, 5)])
def test_knnk_matches_brute_force(interpret_mode, k, seed):
    """Top-k survivor sweep (k <= 4): exact vs brute force, both cold
    (+inf transported bound) and with a transported k-th-distance bound
    from a perturbed previous pose (round-5 widening, verdict #8)."""
    q, qm, r, rm = _cloudlike(seed=seed)
    rorder, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    qs = jnp.asarray(q)
    qsm = jnp.asarray(qm)
    ub = jnp.full((len(q),), jnp.inf, jnp.float32)
    dk, ik, frac = k2.nnk_sorted_v2(qs, qsm, ub, jnp.asarray(rt3),
                                    jnp.asarray(ct), k=k)
    d0, i0 = knn_brute_force(qs, qsm, jnp.asarray(rs), jnp.asarray(rsm),
                             k=k)
    dk, ik = np.asarray(dk), np.asarray(ik)
    d0, i0 = np.asarray(d0), np.asarray(i0)
    assert np.array_equal(np.isfinite(dk), np.isfinite(d0))
    f = np.isfinite(d0)
    np.testing.assert_allclose(dk[f], d0[f], rtol=1e-5, atol=1e-6)
    diff = (ik != i0) & f
    assert np.all(np.abs(dk[diff] - d0[diff]) < 1e-5)  # ties only

    # transported bound: move queries slightly, bound = prev k-th + step
    q2 = q + np.random.default_rng(9).normal(
        scale=0.05, size=q.shape).astype(np.float32)
    step = np.linalg.norm(q2 - q, axis=1)
    ub2 = jnp.asarray((np.sqrt(np.where(f[:, -1], dk[:, -1], np.inf))
                       + step) * (1 + 4e-7), jnp.float32)
    dk2, ik2, frac2 = k2.nnk_sorted_v2(jnp.asarray(q2), qsm, ub2,
                                       jnp.asarray(rt3),
                                       jnp.asarray(ct), k=k)
    d02, i02 = knn_brute_force(jnp.asarray(q2), qsm, jnp.asarray(rs),
                               jnp.asarray(rsm), k=k)
    dk2, d02 = np.asarray(dk2), np.asarray(d02)
    f2 = np.isfinite(d02)
    assert np.array_equal(np.isfinite(dk2), f2)
    np.testing.assert_allclose(dk2[f2], d02[f2], rtol=1e-5, atol=1e-6)
    assert float(frac2) <= float(frac) + 1e-6  # bound actually prunes


@pytest.mark.slow
def test_sharded_survivor_sweep_parity(interpret_mode):
    """Chunk-axis-sharded survivor sweep (round-5, verdict #8): per-shard
    bounds are looser (local chunks only) but every shard's sweep is
    exact, and the ICI min-merge must reproduce the single-device op —
    and the brute force — over an 8-device mesh."""
    import jax
    from libpointmatcher_tpu.parallel.sharding import (
        make_mesh, pad_sweep_tables_for_mesh, sharded_nn1_sorted_v2)

    q, qm, r, rm = _cloudlike(n=800, m=2100, seed=11)
    rorder, rs, rsm, rt3, ct = _sorted_tables(r, rm)
    mesh = make_mesh(8)
    rt3p, ctp = pad_sweep_tables_for_mesh(rt3, ct, 8)
    assert rt3p.shape[0] % (8 * 128) == 0
    qs = jnp.asarray(q)
    qsm = jnp.asarray(qm)
    ub = jnp.full((len(q),), jnp.inf, jnp.float32)
    d_s, i_s = sharded_nn1_sorted_v2(
        qs, qsm, ub, jnp.asarray(rt3p), jnp.asarray(ctp), mesh)
    d0, i0 = knn_brute_force(qs, qsm, jnp.asarray(rs), jnp.asarray(rsm),
                             k=1)
    d_s, i_s = np.asarray(d_s), np.asarray(i_s)
    d0, i0 = np.asarray(d0)[:, 0], np.asarray(i0)[:, 0]
    assert np.array_equal(np.isfinite(d_s), np.isfinite(d0))
    f = np.isfinite(d0)
    np.testing.assert_allclose(d_s[f], d0[f], rtol=1e-5, atol=1e-7)
    diff = (i_s != i0) & f
    assert np.all(np.abs(d_s[diff] - d0[diff]) < 1e-6)  # ties only

    # transported bound stays valid through the shard merge
    q2 = q + np.random.default_rng(3).normal(
        scale=0.03, size=q.shape).astype(np.float32)
    step = np.linalg.norm(q2 - q, axis=1)
    ub2 = jnp.asarray(
        (np.sqrt(np.where(f, d_s, np.inf)) + step) * (1 + 4e-7),
        jnp.float32)
    d_s2, i_s2 = sharded_nn1_sorted_v2(
        jnp.asarray(q2), qsm, ub2, jnp.asarray(rt3p), jnp.asarray(ctp),
        mesh)
    d02, _ = knn_brute_force(jnp.asarray(q2), qsm, jnp.asarray(rs),
                             jnp.asarray(rsm), k=1)
    f2 = np.isfinite(np.asarray(d02)[:, 0])
    np.testing.assert_allclose(np.asarray(d_s2)[f2],
                               np.asarray(d02)[:, 0][f2],
                               rtol=1e-5, atol=1e-7)
