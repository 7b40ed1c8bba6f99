"""Matcher unit tests (parity target: utest/ui/Matcher.cpp)."""

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu import MatcherRegistrar as Reg


def clouds(n=200, m=300, seed=0):
    rng = np.random.default_rng(seed)
    a = pm.PointCloud.from_numpy(rng.normal(size=(n, 3)).astype(np.float32))
    b = pm.PointCloud.from_numpy(rng.normal(size=(m, 3)).astype(np.float32))
    return a, b


def test_null_matcher_empty():
    a, b = clouds()
    mtch = Reg.create("NullMatcher")
    mtch.init(b)
    m = mtch.find_closests(a)
    assert np.all(np.isinf(np.asarray(m.dists)))
    assert np.all(np.asarray(m.ids) == -1)


def test_kdtree_matcher_knn_and_maxdist():
    a, b = clouds()
    mtch = Reg.create("KDTreeMatcher", {"knn": "3", "maxDist": "0.5"})
    mtch.init(b)
    m = mtch.find_closests(a)
    d = np.asarray(m.dists)
    i = np.asarray(m.ids)
    assert d.shape[1] == 3
    finite = np.isfinite(d)
    assert np.all(d[finite] <= 0.5**2 + 1e-6)
    assert np.all(i[~finite] == -1)
    # ascending per row (rows with any finite entries)
    with np.errstate(invalid="ignore"):
        diffs = np.diff(np.where(finite, d, np.inf), axis=1)
    assert np.all(diffs[np.isfinite(diffs)] >= -1e-6)


def test_var_dist_matcher():
    a, b = clouds()
    radius = np.full(a.num_points, 0.3, np.float32)
    radius[:50] = 1e-6  # effectively unmatchable
    a = a.with_descriptor("myRadius", radius)
    mtch = Reg.create("KDTreeVarDistMatcher",
                      {"knn": "2", "maxDistField": "myRadius"})
    mtch.init(b)
    m = mtch.find_closests(a)
    d = np.asarray(m.dists)
    assert np.all(np.isinf(d[:50]))
    finite = np.isfinite(d[50:])
    assert np.all(d[50:][finite] <= 0.3**2 + 1e-6)


def test_var_dist_culled_path_exact(monkeypatch):
    """The cell-grid culled route (prepare_loop builds a grid at the
    quantized global max radius, closed over the matcher; per-point radii
    are the exact post-mask) must reproduce the dense sweep bit for bit
    (reference: MatchersImpl.cpp:132-150 — kd-tree efficiency with
    per-point radii)."""
    from libpointmatcher_tpu.matchers import KDTreeVarDistMatcher

    a, b = clouds(n=500, m=700, seed=21)
    rng = np.random.default_rng(3)
    radius = rng.uniform(0.05, 0.6, a.num_points).astype(np.float32)
    a = a.with_descriptor("myRadius", radius)
    mtch = Reg.create("KDTreeVarDistMatcher",
                      {"knn": "2", "maxDistField": "myRadius"})
    monkeypatch.setattr(KDTreeVarDistMatcher, "CULL_MIN_MAP", 10)
    mtch.init(b)
    aux = mtch.prepare_loop(a)
    assert aux is None  # the grid is matcher state, never traced aux
    assert mtch._vd_grid is not None
    token = mtch.cache_token
    m_cull = mtch.find_closests_in(a, b)
    # dense oracle: fresh matcher without the grid
    dense = Reg.create("KDTreeVarDistMatcher",
                       {"knn": "2", "maxDistField": "myRadius"})
    dense.init(b)
    m_dense = dense.find_closests_in(a, b)
    d_c, d_d = np.asarray(m_cull.dists), np.asarray(m_dense.dists)
    i_c, i_d = np.asarray(m_cull.ids), np.asarray(m_dense.ids)
    np.testing.assert_allclose(
        np.where(np.isfinite(d_c), d_c, 0.0),
        np.where(np.isfinite(d_d), d_d, 0.0), rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.isfinite(d_c), np.isfinite(d_d))
    assert np.array_equal(i_c, i_d)
    # repeat prep with the same radii reuses the cached grid — no token
    # bump, so the engine's compiled loop is reused (advisor round-4 low)
    mtch.prepare_loop(a)
    assert mtch.cache_token == token


def test_var_dist_culled_path_through_engine(monkeypatch):
    """ICP.compute() with the culled VarDist route engaged end to end
    (advisor round-4 high: the aux-pytree form crashed _run_fused on any
    reference >= CULL_MIN_MAP; the engine route must be exercised)."""
    from libpointmatcher_tpu.matchers import KDTreeVarDistMatcher

    monkeypatch.setattr(KDTreeVarDistMatcher, "CULL_MIN_MAP", 10)
    rng = np.random.default_rng(5)
    ref_pts = rng.uniform(-2, 2, size=(900, 3)).astype(np.float32)
    shift = np.array([0.12, -0.08, 0.05], np.float32)
    read_pts = ref_pts[::2] + shift
    a = pm.PointCloud.from_numpy(read_pts)
    a = a.with_descriptor(
        "maxSearchDist", np.full(a.num_points, 1.0, np.float32))
    b = pm.PointCloud.from_numpy(ref_pts)

    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    icp.reference_filters = []  # no normals → point-to-point minimizer
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
        "PointToPointErrorMinimizer")
    icp.matcher = Reg.create("KDTreeVarDistMatcher", {"knn": "1"})
    T = np.asarray(icp(a, b, seed=0))
    assert icp.matcher._vd_grid is not None  # culled route actually ran
    np.testing.assert_allclose(T[:3, 3], -shift, atol=5e-3)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=5e-3)
    # second registration with the same radii: cached grid, stable token,
    # and the engine jit cache is NOT grown by a recompile
    n_cache = len(icp._jit_cache)
    token = icp.matcher.cache_token
    icp(a, b, seed=1)
    assert icp.matcher.cache_token == token
    assert len(icp._jit_cache) == n_cache


def test_no_inliers_raises_through_engine():
    """A NullMatcher yields no usable pairs → ConvergenceError
    (reference: ErrorMinimizer.cpp:76-77)."""
    a, b = clouds()
    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []
    icp.reference_filters = []
    icp.matcher = Reg.create("NullMatcher")
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
        "PointToPointErrorMinimizer"
    )
    with pytest.raises(pm.ConvergenceError):
        icp(a, b)


def test_visit_count_statistics(data3d, ref3d):
    icp = pm.ICP()
    icp.set_default()
    icp(data3d, ref3d, seed=0)
    # PointCountTouched analogue: iterations × pair count
    assert icp.matcher.get_visit_count() == 0  # engine resets after reporting


def test_cell_grid_matches_brute_force():
    """CellGridMatcher must agree with KDTreeMatcher+maxDist exactly."""
    a, b = clouds(n=500, m=800, seed=3)
    kd = Reg.create("KDTreeMatcher", {"knn": "2", "maxDist": "0.4"})
    cg = Reg.create("CellGridMatcher", {"knn": "2", "maxDist": "0.4"})
    kd.init(b)
    cg.init(b)
    m1 = kd.find_closests(a)
    m2 = cg.find_closests(a)
    d1, i1 = np.asarray(m1.dists), np.asarray(m1.ids)
    d2, i2 = np.asarray(m2.dists), np.asarray(m2.ids)
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-4, atol=1e-6)
    # ids may differ only on exact distance ties
    diff = i1 != i2
    assert np.all(np.abs(d1[diff & f] - d2[diff & f]) < 1e-6)


def test_cell_grid_through_engine(data3d, ref3d):
    from tests.conftest import validate_3d

    icp = pm.ICP()
    icp.set_default()
    icp.matcher = Reg.create("CellGridMatcher", {"knn": "1", "maxDist": "2.0"})
    T = icp(data3d, ref3d, seed=0)
    validate_3d(T)


def test_block_grid_matches_brute_force():
    """block_nn1 through prepare_loop must agree exactly with
    KDTreeMatcher+maxDist (static queries, motionBound 0)."""
    a, b = clouds(n=500, m=800, seed=5)
    kd = Reg.create("KDTreeMatcher", {"knn": "1", "maxDist": "0.4"})
    bg = Reg.create("BlockGridMatcher",
                    {"maxDist": "0.4", "motionBound": "0.0"})
    kd.init(b)
    bg.init(b)
    m1 = kd.find_closests(a)
    aux = bg.prepare_loop(a)
    assert aux is not None
    m2 = bg.find_closests_in(a, b, aux=aux)
    d1, i1 = np.asarray(m1.dists)[:, 0], np.asarray(m1.ids)[:, 0]
    d2, i2 = np.asarray(m2.dists)[:, 0], np.asarray(m2.ids)[:, 0]
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-4, atol=1e-6)
    diff = (i1 != i2) & f
    assert np.all(np.abs(d1[diff] - d2[diff]) < 1e-6)  # ties only


def test_block_grid_masked_and_far_queries():
    """Masked-out and out-of-grid queries must come back (+inf, -1)."""
    rng = np.random.default_rng(7)
    qa = rng.normal(size=(100, 3)).astype(np.float32)
    qa[:30] += 100.0  # far outside the reference grid
    a = pm.PointCloud.from_numpy(qa)
    mask = np.asarray(a.mask).copy()
    mask[60:70] = False
    a = a.replace(mask=mask)
    _, b = clouds(seed=8)
    bg = Reg.create("BlockGridMatcher",
                    {"maxDist": "0.5", "motionBound": "0.0"})
    bg.init(b)
    aux = bg.prepare_loop(a)
    m = bg.find_closests_in(a, b, aux=aux)
    d = np.asarray(m.dists)[:, 0]
    i = np.asarray(m.ids)[:, 0]
    assert np.all(np.isinf(d[:30])) and np.all(i[:30] == -1)
    assert np.all(np.isinf(d[60:70])) and np.all(i[60:70] == -1)
    # near queries still matched (against valid reference rows)
    f = np.isfinite(d[30:60])
    assert f.sum() > 0
    assert np.all(i[30:60][f] >= 0)


def test_block_grid_moving_queries_within_bound():
    """Moving queries by less than motionBound after assignment must still
    give exact bounded-radius results (the fused-loop invariant)."""
    rng = np.random.default_rng(11)
    a, b = clouds(n=400, m=600, seed=9)
    bg = Reg.create("BlockGridMatcher",
                    {"maxDist": "0.4", "motionBound": "0.3"})
    bg.init(b)
    aux = bg.prepare_loop(a)  # assignment at the initial pose
    # move every point by up to motionBound
    shift = rng.normal(size=(a.num_points, 3))
    shift = 0.29 * shift / np.linalg.norm(shift, axis=1, keepdims=True)
    moved = pm.PointCloud.from_numpy(
        (np.asarray(a.points) + shift.astype(np.float32))
    ).replace(mask=a.mask)
    m2 = bg.find_closests_in(moved, b, aux=aux)  # STALE assignment
    kd = Reg.create("KDTreeMatcher", {"knn": "1", "maxDist": "0.4"})
    kd.init(b)
    m1 = kd.find_closests(moved)
    d1 = np.asarray(m1.dists)[:, 0]
    d2 = np.asarray(m2.dists)[:, 0]
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-4, atol=1e-6)


def test_block_grid_through_engine(data3d, ref3d):
    """Full fused registration with the block matcher (prepare_loop path)."""
    from tests.conftest import validate_3d

    icp = pm.ICP()
    icp.set_default()
    icp.matcher = Reg.create("BlockGridMatcher",
                             {"maxDist": "2.0", "motionBound": "2.0"})
    T = icp(data3d, ref3d, seed=0)
    validate_3d(T)


def test_block_grid_2d_exact():
    """d=2 uses a 9-cell neighborhood; must agree with brute force."""
    rng = np.random.default_rng(13)
    a = pm.PointCloud.from_numpy(
        rng.uniform(-3, 3, size=(300, 2)).astype(np.float32))
    b = pm.PointCloud.from_numpy(
        rng.uniform(-3, 3, size=(500, 2)).astype(np.float32))
    kd = Reg.create("KDTreeMatcher", {"knn": "1", "maxDist": "0.3"})
    bg = Reg.create("BlockGridMatcher",
                    {"maxDist": "0.3", "motionBound": "0.0"})
    kd.init(b)
    bg.init(b)
    m1 = kd.find_closests(a)
    m2 = bg.find_closests_in(a, b, aux=bg.prepare_loop(a))
    d1 = np.asarray(m1.dists)[:, 0]
    d2 = np.asarray(m2.dists)[:, 0]
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-3, atol=1e-5)


def test_block_grid_sequence_serving(data3d, ref3d):
    """ICPSequence + BlockGridMatcher: blocks built once at set_map, a fresh
    query assignment per __call__ — and repeat calls must reuse the engine
    jit cache (Cq bucketing keeps aux shapes stable)."""
    from tests.conftest import validate_3d

    seq = pm.ICPSequence()
    seq.set_default()
    seq.matcher = Reg.create("BlockGridMatcher",
                             {"maxDist": "2.0", "motionBound": "2.0"})
    seq.set_map(ref3d)
    T1 = seq(data3d, seed=0)
    validate_3d(T1)
    n_compiled = len(seq._jit_cache)
    T2 = seq(data3d, seed=1)
    validate_3d(T2)
    assert len(seq._jit_cache) == n_compiled  # no recompile on repeat


def test_touched_stat_differs_per_matcher(data3d, ref3d):
    """PointCountTouched must reflect actual matcher work (reference:
    MatchersImpl.cpp:86-101 counts real kd-tree visits): the dense sweep
    charges N·M per iteration; the block matcher's whole point is touching
    fewer pairs, and its stat must say so on the same registration."""
    from libpointmatcher_tpu.inspectors import PerformanceInspector

    def run(matcher):
        icp = pm.ICP()
        icp.set_default()
        icp.matcher = matcher
        icp.inspector = PerformanceInspector()
        icp(data3d, ref3d, seed=0)
        stats = icp.inspector.histograms
        return (
            stats["PointCountTouched"].values[-1],
            stats["IterationsCount"].values[-1],
            icp.prefiltered_reading_pts_count,
            icp.prefiltered_reference_pts_count,
        )

    dense_touch, dense_iters, n_r, n_f = run(Reg.create("KDTreeMatcher"))
    assert dense_touch == dense_iters * n_r * n_f

    block_touch, block_iters, n_r2, n_f2 = run(
        Reg.create("BlockGridMatcher",
                   {"maxDist": "2.0", "motionBound": "2.0"})
    )
    # culling must touch strictly less than the dense sweep on this cloud
    assert 0 < block_touch < block_iters * n_r2 * n_f2

    cell_touch, cell_iters, n_r3, n_f3 = run(
        Reg.create("CellGridMatcher", {"knn": "1", "maxDist": "2.0"})
    )
    assert 0 < cell_touch < cell_iters * n_r3 * n_f3


def test_block_grid_virtual_split_exact():
    """Forcing the virtual-tile split (tiny blockCap → every tile's union
    is chunked across several virtual tiles sharing its query rows) must
    stay exact: the scatter-min merge reassembles the true bounded-radius
    1-NN (see ops/tilesweep.py assign_tiles block_cap)."""
    a, b = clouds(n=700, m=900, seed=21)
    kd = Reg.create("KDTreeMatcher", {"knn": "1", "maxDist": "0.8"})
    bg = Reg.create("BlockGridMatcher",
                    {"maxDist": "0.8", "motionBound": "0.0",
                     "blockCap": "128", "tileQueries": "64"})
    kd.init(b)
    bg.init(b)
    # confirm the split actually triggered: candidate axis == blockCap,
    # several virtual tiles share a parent, and the merge depth is > 1
    aux = bg.prepare_loop(a)
    assert aux["cand_t"].shape[2] == 128
    par = np.asarray(aux["parent"])
    assert len(par) > len(np.unique(par))
    assert aux["vrows"].shape[0] > 1
    m1 = kd.find_closests(a)
    m2 = bg.find_closests_in(a, b, aux=aux)
    d1, i1 = np.asarray(m1.dists)[:, 0], np.asarray(m1.ids)[:, 0]
    d2, i2 = np.asarray(m2.dists)[:, 0], np.asarray(m2.ids)[:, 0]
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    # atol 1e-5: the dense matcher's f32 rounding differs from the tile
    # sweep's on the same winning candidate (both within 2e-6 of the f64
    # truth; verified row-by-row when this test was written)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-4, atol=1e-5)
    diff = (i1 != i2) & f
    assert np.all(np.abs(d1[diff] - d2[diff]) < 1e-5)  # ties only


def test_block_grid_virtual_split_through_engine(data3d, ref3d):
    """Full fused registration with split tiles enabled."""
    from tests.conftest import validate_3d

    icp = pm.ICP()
    icp.set_default()
    icp.matcher = Reg.create("BlockGridMatcher",
                             {"maxDist": "2.0", "motionBound": "2.0",
                              "blockCap": "256"})
    T = icp(data3d, ref3d, seed=0)
    validate_3d(T)


def test_kdtree_epsilon_approximate_contract():
    """epsilon > 0 opts into the approximate (MXU) kernel on TPU and the
    exact path elsewhere; either way results must satisfy libnabo's
    (1+epsilon) contract (reference: MatchersImpl.h:84, nabo ANN search).
    The official solution configs use epsilon 3.16."""
    a, b = clouds(n=400, m=600, seed=31)
    exact = Reg.create("KDTreeMatcher", {"knn": "1", "epsilon": "0"})
    approx = Reg.create("KDTreeMatcher", {"knn": "1", "epsilon": "3.16"})
    exact.init(b)
    approx.init(b)
    d0 = np.asarray(exact.find_closests(a).dists)[:, 0]
    d1 = np.asarray(approx.find_closests(a).dists)[:, 0]
    f = np.isfinite(d0)
    assert np.array_equal(f, np.isfinite(d1))
    # (1 + eps) bound on distances (squared: (1+eps)^2), with slack for
    # the matmul-form's f32 rounding near zero
    assert np.all(d1[f] <= (1.0 + 3.16) ** 2 * d0[f] + 1e-5)


def test_epsilon_floor_gates_mxu_kernel(monkeypatch):
    """epsilon below MXU_EPSILON_FLOOR must stay on the exact kernel: the
    MXU form's ~1e-6 tie mis-ranking would violate a (1+1e-8) contract.
    Gate tested directly by stubbing the kernels (the CPU fallback never
    reaches either)."""
    from libpointmatcher_tpu.ops import dispatch

    calls = []
    fake = lambda name: (lambda q, qm, r, rm: (calls.append(name),
                                               (q[:, 0], q[:, 0]))[1])
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(dispatch, "knn1_pallas", fake("vpu"))
    monkeypatch.setattr(dispatch, "knn1_pallas_mxu", fake("mxu"))
    monkeypatch.delenv("PMTPU_KNN_IMPL", raising=False)
    import jax.numpy as jnp

    q = jnp.zeros((4, 3)); r = jnp.zeros((4, 3))
    qm = jnp.ones(4, bool); rm = jnp.ones(4, bool)
    dispatch.knn_search(q, qm, r, rm, k=1, epsilon=0.0)
    dispatch.knn_search(q, qm, r, rm, k=1, epsilon=1e-8)   # below floor
    dispatch.knn_search(q, qm, r, rm, k=1, epsilon=1e-5)   # at floor
    dispatch.knn_search(q, qm, r, rm, k=1, epsilon=3.16)
    assert calls == ["vpu", "vpu", "mxu", "mxu"]


@pytest.mark.parametrize("knn,block_cap", [(4, 1024), (4, 128), (8, 1024), (24, 1024)])
def test_block_grid_knn_exact_vs_brute_force(knn, block_cap):
    """BlockGridMatcher(knn>1) must be exact vs the dense brute force
    within maxDist — the reference matcher contract has knn as a free
    parameter (MatchersImpl.h:69-120). block_cap=128 forces the
    virtual-tile split so the sorted k-list merge across virtual tiles is
    covered too."""
    a, b = clouds(n=600, m=800, seed=13)
    kd = Reg.create("KDTreeMatcher",
                    {"knn": str(knn), "maxDist": "0.8"})
    bg = Reg.create("BlockGridMatcher",
                    {"knn": str(knn), "maxDist": "0.8", "motionBound": "0.0",
                     "blockCap": str(block_cap), "tileQueries": "64"})
    kd.init(b)
    bg.init(b)
    aux = bg.prepare_loop(a)
    if block_cap == 128:
        assert aux["vrows"].shape[0] > 1  # split actually triggered
    m1 = kd.find_closests(a)
    m2 = bg.find_closests_in(a, b, aux=aux)
    d1, i1 = np.asarray(m1.dists), np.asarray(m1.ids)
    d2, i2 = np.asarray(m2.dists), np.asarray(m2.ids)
    assert d2.shape == (a.num_points, knn)
    assert np.array_equal(np.isfinite(d1), np.isfinite(d2))
    f = np.isfinite(d1)
    np.testing.assert_allclose(d2[f], d1[f], rtol=1e-4, atol=1e-5)
    # ascending per row
    with np.errstate(invalid="ignore"):
        diffs = np.diff(np.where(f, d2, np.inf), axis=1)
    assert np.all(diffs[np.isfinite(diffs)] >= -1e-6)
    # id disagreements only on (near-)exact distance ties
    diff = (i1 != i2) & f
    assert np.all(np.abs(d1[diff] - d2[diff]) < 1e-5)


def test_block_grid_motion_bound_guard(data3d, ref3d):
    """Violating the motionBound exactness invariant must be SURFACED, not
    silent (the reference's bounded search is never silently wrong within
    maxDist, MatchersImpl.cpp:86-101): a tiny motionBound with a large
    real correction sets the flag; an adequate bound leaves it clear."""
    import jax.numpy as jnp

    from libpointmatcher_tpu.utils import se3

    def run(motion_bound, t_init=None):
        icp = pm.ICP()
        icp.set_default()
        icp.matcher = Reg.create(
            "BlockGridMatcher",
            {"maxDist": "2.0", "motionBound": motion_bound})
        icp(data3d, ref3d, seed=0, T_init=t_init)
        return icp.motion_bound_exceeded

    # the fixture pair's correction rotates a ~127 m-wide scan: rim points
    # move ~16 m, so any small bound is genuinely violated
    assert run("0.001") is True
    # bound above the true worst-case displacement: flag stays clear
    # (cell edge grows to maxDist + 25, degenerating toward dense — the
    # documented trade for guaranteed exactness under a weak prior)
    assert run("25.0") is False


def test_block_grid_motion_bound_guard_serving(data3d, ref3d):
    """The batched serving path surfaces the motionBound invariant per
    scan (info['motion_bound_exceeded']), mirroring the one-shot engine's
    flag — production serving must not be silently wrong either."""
    from libpointmatcher_tpu.parallel import register_batch_to_map

    def run(motion_bound):
        seq = pm.ICPSequence()
        seq.set_default()
        seq.matcher = Reg.create(
            "BlockGridMatcher",
            {"maxDist": "2.0", "motionBound": motion_bound})
        seq.set_map(ref3d, seed=0)
        _, info = register_batch_to_map(seq, [data3d, data3d], seed=0)
        return info["motion_bound_exceeded"]

    assert run("0.001").all()
    assert not run("25.0").any()


def test_block_grid_knn_through_engine(data3d, ref3d):
    """Full fused registration with a knn=3 BlockGridMatcher (multi-match
    rows flow through outlier weighting and the minimizer)."""
    from tests.conftest import validate_3d

    icp = pm.ICP()
    icp.set_default()
    icp.matcher = Reg.create("BlockGridMatcher",
                             {"knn": "3", "maxDist": "2.0",
                              "motionBound": "2.0"})
    T = icp(data3d, ref3d, seed=0)
    validate_3d(T)


def test_assign_tiles_lane_safe_blockcap():
    """blockCap values that are not multiples of 128 (legal per the Param,
    min=128) must still yield a candidate axis B*GATHER_G*SB divisible by
    128 when the virtual-tile split triggers (advisor round-2 finding:
    blockCap=1000 gave M=1000 and crashed the pallas sweep on TPU).
    ``blocks`` holds 64-row GATHER UNITS since round 5."""
    from libpointmatcher_tpu.ops.tilesweep import (GATHER_G, SB,
                                                   assign_tiles,
                                                   build_sub_blocks)

    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 4.0, size=(20000, 3)).astype(np.float32)
    mask = np.ones(len(pts), bool)
    sub = build_sub_blocks(pts, mask, 1.0)
    unit = GATHER_G * SB
    for cap in (1000, 128, 130, 999, 2048):
        ta = assign_tiles(pts, mask, sub, tile_q=64, block_cap=cap)
        B = ta.blocks.shape[1]
        assert (B * unit) % 128 == 0, (cap, B)
        # the split must actually bound the axis near the cap (capu
        # rounds DOWN to an even unit count, so the axis never exceeds
        # the requested rows when the split triggers)
        assert B * unit <= max(cap, 2 * unit), (cap, B)


@pytest.mark.quick
def test_pad_tile_aux_np_knn_batch_exact():
    """Batched tile aux padding must stay exact for k>1 lists: two scans
    with DIFFERENT tile/vtile/merge-depth shapes are padded to common
    shapes (_pad_tile_aux_np) and served through the in-program gather +
    tile-order permutation, and every scan's k-list must equal its own
    unpadded single-scan result — in particular no duplicated neighbors
    from padded merge rows (the padded rows point at an all-pad vtile,
    NOT an edge-replicated real one)."""
    import jax
    import jax.numpy as jnp

    from libpointmatcher_tpu.matchers import tile_aux_to_device
    from libpointmatcher_tpu.ops.tilesweep import tile_knnk_from_candidates
    from libpointmatcher_tpu.parallel.batch import _pad_tile_aux_np

    rng = np.random.default_rng(3)
    ref = pm.PointCloud.from_numpy(
        rng.uniform(0, 10, (3000, 3)).astype(np.float32)
    )
    # scan A: tight cluster (few tiles); scan B: broad spread (many tiles,
    # virtual splits at the small blockCap)
    qa = rng.uniform(4, 5, (500, 3)).astype(np.float32)
    qb = rng.uniform(0, 10, (500, 3)).astype(np.float32)
    m = Reg.create("BlockGridMatcher", {
        "knn": "3", "maxDist": "1.2", "motionBound": "0.0",
        "tileQueries": "16", "blockCap": "128",
    })
    m.init(ref)

    pers, singles = [], []
    for q in (qa, qb):
        per, shared = m.prepare_loop_host(q, np.ones(len(q), bool))
        pers.append(per)
        aux = tile_aux_to_device(per, shared)
        d, i = tile_knnk_from_candidates(
            jnp.asarray(q), jnp.ones(len(q), bool), aux["q_rows"],
            aux["cand_t"], aux["pen"], aux["cid"], 1.2,
            parent=aux["parent"], vrows=aux["vrows"], k=3,
        )
        singles.append((np.asarray(d), np.asarray(i)))
    assert pers[0]["blocks"].shape != pers[1]["blocks"].shape \
        or pers[0]["vrows"].shape != pers[1]["vrows"].shape

    sentinel = int(shared["sub_units"].shape[0]) - 1
    stacked = _pad_tile_aux_np(pers, sentinel)

    def one(q, pa):
        aux = tile_aux_to_device(pa, shared)
        # tile-order permutation (the serving runners' prep step)
        qr = aux["q_rows"].reshape(-1)
        safe = jnp.maximum(qr, 0)
        pts = jnp.asarray(q)[safe]
        mask = jnp.where(qr >= 0, jnp.ones(len(q), bool)[safe], False)
        d, i = tile_knnk_from_candidates(
            pts, mask, None, aux["cand_t"], aux["pen"], aux["cid"], 1.2,
            parent=aux["parent"], vrows=aux["vrows"], k=3,
        )
        # un-permute for comparison: row j of the permuted result is raw
        # row qr[j]
        n = len(q)
        idx = jnp.where(qr >= 0, qr, n)
        back_d = jnp.full((n + 1, 3), jnp.inf).at[idx].set(d)[:n]
        back_i = jnp.full((n + 1, 3), -1).at[idx].set(i)[:n]
        return back_d, back_i

    qs = jnp.stack([jnp.asarray(qa), jnp.asarray(qb)])
    db, ib = jax.vmap(one)(qs, jax.tree_util.tree_map(jnp.asarray, stacked))
    for s in range(2):
        d0, i0 = singles[s]
        dk = np.asarray(db[s])
        ik = np.asarray(ib[s])
        np.testing.assert_array_equal(
            np.where(np.isfinite(d0), d0, -1.0),
            np.where(np.isfinite(dk), dk, -1.0),
        )
        np.testing.assert_array_equal(i0, ik)
