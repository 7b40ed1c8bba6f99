"""Bbox-pruned exact 1-NN sweep (ops/knn_skip.py): interpret-mode kernel
equivalence, skip-mask exactness property, stateful matcher wiring, and
the serving aux path end to end (compiled equivalence is exercised on real
TPU by the benchmarks and tools/chip_exactness.py)."""

import numpy as np
import pytest
from jax.experimental import pallas as pl

import jax.numpy as jnp

import libpointmatcher_tpu.ops.knn_skip as ks
from libpointmatcher_tpu.ops.knn import knn_brute_force


@pytest.fixture
def interpret_mode(monkeypatch):
    import libpointmatcher_tpu.ops.knn_sweep2 as k2

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ks.pl, "pallas_call", patched)
    monkeypatch.setattr(k2.pl, "pallas_call", patched)


GROUP = 2  # super-chunk = GROUP * 128 map rows per skip decision


def _tables(r, rm):
    rorder, _ = ks.morton_argsort(r, rm)
    rs = r[rorder]
    rsm = rm[rorder]
    m, d = r.shape
    m_pad = -(-m // 128) * 128
    rt = np.zeros((8, m_pad), np.float32)
    rt[:d, :m] = rs.T
    rpen = np.full((1, m_pad), np.inf, np.float32)
    rpen[0, :m] = np.where(rsm, 0.0, np.inf)
    cbox = ks.chunk_bboxes(rs, rsm, chunk=128 * GROUP)
    return rorder, rs, rt, rpen, cbox


def _cloudlike(n=700, m=900, seed=0):
    rng = np.random.default_rng(seed)
    # clustered, like a scan: a dense core plus sparse periphery
    core = rng.normal(size=(n * 3 // 4, 3)) * 0.7
    peri = rng.uniform(-8, 8, size=(n - len(core), 3))
    q = np.concatenate([core, peri]).astype(np.float32)
    rcore = rng.normal(size=(m * 3 // 4, 3)) * 0.7 + 0.05
    rperi = rng.uniform(-8, 8, size=(m - len(rcore), 3))
    r = np.concatenate([rcore, rperi]).astype(np.float32)
    qm = rng.random(n) < 0.8
    rm = rng.random(m) < 0.95
    return q, qm, r, rm


def test_skip_mask_never_hides_true_nn():
    """Property: no skipped chunk may contain any valid query's true NN —
    for any upper bound that is a real candidate distance."""
    q, qm, r, rm = _cloudlike(seed=3)
    rorder, rs, rt, rpen, cbox = _tables(r, rm)
    qorder, _ = ks.morton_argsort(q, qm)
    qs = q[qorder]
    qsm = qm[qorder]
    rng = np.random.default_rng(7)
    valid_rows = np.flatnonzero(rm[rorder])
    prev = valid_rows[rng.integers(0, len(valid_rows), size=len(qs))]
    prev[rng.random(len(qs)) < 0.3] = -1  # some unknown
    ub2 = np.where(
        prev >= 0,
        ((qs - rs[np.clip(prev, 0, None)]) ** 2).sum(1),
        np.inf,
    ).astype(np.float32)
    skip = np.asarray(ks.build_skip_mask(
        jnp.asarray(qs), jnp.asarray(qsm), jnp.asarray(ub2),
        jnp.asarray(cbox), 128))
    # brute-force truth in sorted space
    rsm = rm[rorder]
    d2 = ((qs[:, None, :] - rs[None]) ** 2).sum(-1)
    d2[:, ~rsm] = np.inf
    nn = d2.argmin(1)
    for qi in np.flatnonzero(qsm):
        ti = qi // 128
        cj = nn[qi] // (128 * GROUP)
        assert skip[ti, cj] == 0, (qi, ti, cj)
    # and it does skip something on clustered data with real bounds
    assert skip.mean() > 0.1


def test_skip_kernel_matches_brute_force(interpret_mode):
    # enough map rows for several super-chunks per tile (the warm-bound
    # skip assertion below needs coarse-granularity decisions to fire)
    q, qm, r, rm = _cloudlike(n=1200, m=3000, seed=1)
    rorder, rs, rt, rpen, cbox = _tables(r, rm)
    qorder, qinv = ks.morton_argsort(q, qm)
    qs = q[qorder]
    qsm = qm[qorder]
    # iteration-0 shape: no bound → no skip beyond dead tiles
    ub2 = np.full(len(qs), np.inf, np.float32)
    skip = ks.build_skip_mask(jnp.asarray(qs), jnp.asarray(qsm),
                              jnp.asarray(ub2), jnp.asarray(cbox), 128)
    d_s, i_s = ks.nn1_sorted_skip(
        jnp.asarray(qs), jnp.asarray(qsm), jnp.asarray(rt),
        jnp.asarray(rpen), skip, tile_q=128, group=GROUP)
    d_s, i_s = np.asarray(d_s), np.asarray(i_s)
    db, ib = knn_brute_force(q, qm, r, rm, k=1)
    db = np.asarray(db)[:, 0]
    ib = np.asarray(ib)[:, 0]
    ids = np.where(i_s >= 0, rorder[np.clip(i_s, 0, None)], -1)[qinv]
    d = d_s[qinv]
    np.testing.assert_allclose(d[qm], db[qm], rtol=1e-5, atol=1e-6)
    assert np.array_equal(ids[qm], ib[qm])
    assert np.all(ids[~qm] == -1)
    # iteration-1 shape: previous winners as bounds → skips fire, exact
    prev = i_s  # sorted-space winners
    cand = rs[np.clip(prev, 0, len(rs) - 1)]
    ub2 = np.where(prev >= 0, ((qs - cand) ** 2).sum(1),
                   np.inf).astype(np.float32)
    skip2 = ks.build_skip_mask(jnp.asarray(qs), jnp.asarray(qsm),
                               jnp.asarray(ub2), jnp.asarray(cbox), 128)
    assert np.asarray(skip2).mean() > np.asarray(skip).mean()
    d_s2, i_s2 = ks.nn1_sorted_skip(
        jnp.asarray(qs), jnp.asarray(qsm), jnp.asarray(rt),
        jnp.asarray(rpen), skip2, tile_q=128, group=GROUP)
    np.testing.assert_allclose(np.asarray(d_s2)[qsm], d_s[qsm],
                               rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.asarray(i_s2)[qsm], i_s[qsm])


def test_bound_pass_covers_true_min(interpret_mode):
    """Safety invariant of the MXU bound pass: amin + margin >= the exact
    squared NN distance for every valid query (a violation would let the
    skip mask prune the winner's chunk). Also two-sided sanity: amin is
    within the margin of the truth, so the bound is actually tight."""
    for seed, scale in [(0, 1.0), (4, 60.0), (9, 0.01)]:
        q, qm, r, rm = _cloudlike(n=900, m=1100, seed=seed)
        q = (q * scale).astype(np.float32)
        r = (r * scale).astype(np.float32)
        rorder, rs, rt, rpen, cbox = _tables(r, rm)
        rsm = rm[rorder]
        m_pad = rt.shape[1]
        ra, _ = ks.augmented_ref_table(rs, rsm, m_pad)
        n_pad = -(-len(q) // 256) * 256
        qa, q2 = ks.augment_queries(jnp.asarray(q), n_pad)
        amin = np.asarray(ks.approx_min_sorted(qa, jnp.asarray(ra)))[:len(q)]
        margin = np.asarray(ks.bound_margin(q2, jnp.asarray(amin)))
        d2 = ((q[:, None, :].astype(np.float64)
               - rs[None].astype(np.float64)) ** 2).sum(-1)
        d2[:, ~rsm] = np.inf
        true_min = d2.min(1)
        ok = qm & np.isfinite(true_min)
        assert np.all(amin[ok] + margin[ok] >= true_min[ok]), (
            seed, scale,
            float((true_min[ok] - amin[ok] - margin[ok]).max()))
        assert np.all(amin[ok] <= true_min[ok] + margin[ok])


def test_stateful_matcher_exact_and_converging(interpret_mode, monkeypatch):
    """KDTreeMatcher's stateful skip path == its plain dense path, on both
    the cold (state=-1) and warm (carried winners) iterations."""
    import libpointmatcher_tpu.matchers as matchers
    from libpointmatcher_tpu.cloud import PointCloud

    def masked_cloud(pts, mask):
        c = PointCloud.from_numpy(pts)
        mm = np.zeros(c.num_points, bool)
        mm[:len(mask)] = mask
        return c.replace(mask=jnp.asarray(mm)), mm

    monkeypatch.setattr(matchers, "_use_pallas", lambda: True)
    monkeypatch.setenv("PMTPU_SERVE_SKIP", "1")
    q, qm0, r, rm0 = _cloudlike(n=600, m=700, seed=5)
    reading0, qm0f = masked_cloud(q, qm0)
    reference, _ = masked_cloud(r, rm0)
    mat = matchers.KDTreeMatcher()
    assert mat.serving_loop_aux(reference)
    # the loop runs in sorted space: prep permutes the reading once and
    # substitutes the sorted reference (parallel/batch.py does both)
    ref_sorted = mat.serving_reference(reference)
    assert ref_sorted is not reference
    qpts = np.asarray(reading0.points)
    per, shared = mat.prepare_loop_host(qpts, qm0f)
    reading = reading0.permute_rows(per["qorder"])
    qm = np.asarray(reading.mask)
    state = mat.loop_state_init(reading, shared)
    ref_plain = mat.find_closests_in(reading, ref_sorted)
    m1, state = mat.find_closests_in_stateful(
        reading, ref_sorted, shared, state)
    np.testing.assert_allclose(
        np.asarray(m1.dists)[qm], np.asarray(ref_plain.dists)[qm],
        rtol=1e-5, atol=1e-6)
    assert np.array_equal(
        np.asarray(m1.ids)[qm], np.asarray(ref_plain.ids)[qm])
    # warm iteration at a slightly moved pose: the triangle-inequality
    # bound transports the previous winner distance, stays exact
    moved = reading.replace(
        points=reading.points + jnp.float32([0.03, -0.02, 0.01]))
    m2, state = mat.find_closests_in_stateful(
        moved, ref_sorted, shared, state)
    ref2 = mat.find_closests_in(moved, ref_sorted)
    np.testing.assert_allclose(
        np.asarray(m2.dists)[qm], np.asarray(ref2.dists)[qm],
        rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(m2.ids)[qm], np.asarray(ref2.ids)[qm])
    # batched host prep agrees with the per-scan form
    per_b, _ = mat.prepare_loop_host_batch(
        qpts[None], qm0f[None])
    assert np.array_equal(np.asarray(per_b["qorder"])[0],
                          np.asarray(per["qorder"]))


def test_serving_aux_path_pose_parity(interpret_mode, monkeypatch):
    """register_batch_to_map through the skip path == the plain fused
    serving path, end to end on small clouds."""
    import libpointmatcher_tpu as pm
    import libpointmatcher_tpu.matchers as matchers
    from libpointmatcher_tpu.cloud import PointCloud
    from libpointmatcher_tpu.parallel import register_batch_to_map

    rng = np.random.default_rng(11)
    r = (rng.normal(size=(640, 3)) * np.float32([2, 2, 0.4])).astype(
        np.float32)
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32)
    q = (r[:512] @ R.T + np.float32([0.08, -0.05, 0.02])).astype(np.float32)

    def serve(force_skip):
        seq = pm.ICPSequence()
        seq.set_default()
        monkeypatch.setenv("PMTPU_SERVE_SKIP", "1")
        monkeypatch.setattr(
            matchers, "_use_pallas", lambda: bool(force_skip))
        seq.set_map(PointCloud.from_numpy(r), seed=0)
        scans = [PointCloud.from_numpy(q)] * 2
        T, info = register_batch_to_map(seq, scans, seed=0)
        return T, info

    T_plain, info_plain = serve(False)
    T_skip, info_skip = serve(True)
    np.testing.assert_allclose(T_skip, T_plain, rtol=1e-4, atol=1e-4)
