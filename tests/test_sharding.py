"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.ops.knn import knn_brute_force
from libpointmatcher_tpu.parallel import (
    make_mesh,
    replicate_cloud,
    shard_cloud,
    sharded_knn,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_knn_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(256, 3)).astype(np.float32)
    r = rng.normal(size=(1024, 3)).astype(np.float32)
    qm = np.ones(256, bool)
    rm = np.ones(1024, bool)
    rm[::7] = False
    d1, i1 = knn_brute_force(q, qm, r, rm, k=3)
    d2, i2 = sharded_knn(q, qm, r, rm, k=3, mesh=mesh)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-5, atol=1e-6)
    # distances through ids must agree (ids can differ on ties)
    gd1 = np.sum((q[:, None, :] - r[np.maximum(np.asarray(i1), 0)]) ** 2, axis=-1)
    gd2 = np.sum((q[:, None, :] - r[np.maximum(np.asarray(i2), 0)]) ** 2, axis=-1)
    np.testing.assert_allclose(gd2, gd1, rtol=1e-5, atol=1e-6)


def test_sharded_block_nn1_matches_single_device(mesh):
    """Query-block-sharded bounded 1-NN == the single-device block sweep."""
    from libpointmatcher_tpu.ops.cellblocks import (
        QueryBlocks, assign_query_blocks, block_nn1, build_ref_blocks,
    )
    from libpointmatcher_tpu.parallel import sharded_block_nn1

    rng = np.random.default_rng(3)
    q = rng.uniform(-4, 4, size=(700, 3)).astype(np.float32)
    r = rng.uniform(-4, 4, size=(900, 3)).astype(np.float32)
    rm = np.ones(900, bool)
    rm[::9] = False
    rb = build_ref_blocks(r, rm, cell_size=0.5)
    qb = assign_query_blocks(q, np.ones(700, bool), rb)
    assert qb.rows.shape[0] % 8 == 0  # Cq ladder divides the mesh

    d1, i1 = block_nn1(q, qb, rb.blocks, rb.block_ids, 0.5)
    d2, i2 = sharded_block_nn1(
        q, qb.rows, qb.nb_slots, rb.blocks, rb.block_ids, 0.5, mesh
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), rtol=1e-6, atol=1e-7
    )


def test_shard_cloud_layout(mesh):
    c = pm.PointCloud.from_numpy(
        np.random.default_rng(1).normal(size=(1000, 3)).astype(np.float32)
    )
    sc = shard_cloud(c, mesh)
    assert sc.num_points % 8 == 0
    assert sc.count_host() == 1000
    rc = replicate_cloud(c, mesh)
    assert rc.count_host() == 1000


def test_full_icp_on_sharded_reference(mesh, data3d, ref3d):
    """The production fused loop with the reference laid out across the mesh:
    XLA propagates the sharding through the distance sweep and inserts the
    collectives. Result must match the single-device run."""
    from tests.conftest import validate_3d

    icp = pm.ICP()
    icp.set_default()
    T_single = np.asarray(icp(data3d, ref3d, seed=42))

    icp2 = pm.ICP()
    icp2.set_default()
    data_s = replicate_cloud(data3d, mesh)
    ref_s = shard_cloud(ref3d, mesh)
    T_sharded = np.asarray(icp2(data_s, ref_s, seed=42))
    validate_3d(T_sharded)
    np.testing.assert_allclose(T_sharded, T_single, atol=2e-2)


def test_register_batch_matches_sequential(data3d, ref3d):
    """Vmapped pair-parallel registration must agree with per-pair runs."""
    from libpointmatcher_tpu.parallel import register_batch
    from tests.conftest import validate_3d
    import numpy as np

    rng = np.random.default_rng(0)
    # two different pairs: (data3d→ref3d) and a synthetic shifted pair
    src = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
    shift = np.float32([0.15, -0.1, 0.2])
    c_read = pm.PointCloud.from_numpy(src)
    c_ref = pm.PointCloud.from_numpy(src + shift)

    icp = pm.ICP()
    icp.set_default()
    T_batch, info = register_batch(
        icp, [data3d, c_read], [ref3d, c_ref], seed=42
    )
    assert T_batch.shape == (2, 4, 4)
    validate_3d(T_batch[0])
    np.testing.assert_allclose(T_batch[1][:3, 3], shift, atol=0.05)
    assert info["iterations"].shape == (2,)
    assert np.all(info["codes"] <= 1)


def test_pose_graph_closes_loop():
    """A noisy odometry chain with a loop-closure constraint must snap back
    to the ground-truth trajectory."""
    import numpy as np
    from libpointmatcher_tpu.parallel.posegraph import (
        edges_from_numpy,
        optimize_pose_graph,
        relative_pose_residual,
    )
    from libpointmatcher_tpu.utils import se3 as se3m
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    K = 8

    def rotz(a):
        return np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
            np.float32,
        )

    # ground truth: poses around a circle
    gt = []
    for k in range(K):
        a = 2 * np.pi * k / K
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = rotz(a)
        T[:3, 3] = [np.cos(a), np.sin(a), 0.0]
        gt.append(T)
    gt = np.stack(gt)

    # measurements: exact relative poses (odometry i→i+1 and loop closure)
    ii, jj, Ts = [], [], []
    for k in range(K - 1):
        ii.append(k); jj.append(k + 1)
        Ts.append(np.linalg.inv(gt[k]) @ gt[k + 1])
    ii.append(K - 1); jj.append(0)
    Ts.append(np.linalg.inv(gt[K - 1]) @ gt[0])
    edges = edges_from_numpy(ii, jj, np.stack(Ts))

    # initial guess: ground truth corrupted by noise (pose 0 fixed)
    init = gt.copy()
    for k in range(1, K):
        w = rng.normal(scale=0.1, size=3).astype(np.float32)
        init[k][:3, :3] = init[k][:3, :3] @ np.asarray(
            se3m.rodrigues(jnp.asarray(w))
        )
        init[k][:3, 3] += rng.normal(scale=0.15, size=3)

    init_res = float(np.linalg.norm(
        np.asarray(relative_pose_residual(jnp.asarray(init), edges))
    ))
    opt, final = optimize_pose_graph(init, edges, gn_iters=10, cg_iters=30)
    opt = np.asarray(opt)
    assert float(final) < 1e-3 < init_res
    # recovered trajectory matches ground truth (gauge-fixed at pose 0)
    np.testing.assert_allclose(opt, gt, atol=5e-3)


def test_register_batch_to_map(data3d, ref3d):
    """Batched scan-to-map serving against an ICPSequence map."""
    from libpointmatcher_tpu.parallel import register_batch_to_map
    from tests.conftest import validate_3d

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d)
    T_b, info = register_batch_to_map(seq, [data3d, data3d], seed=42)
    assert T_b.shape == (2, 4, 4)
    validate_3d(T_b[0])
    validate_3d(T_b[1])
    assert np.all(info["codes"] <= 1)

def test_register_batch_to_map_fused_matches_host(data3d, ref3d):
    """The single-program serving path (traceable filter chain fused into
    the device program) agrees with the per-scan host-prep path."""
    from libpointmatcher_tpu.parallel import register_batch_to_map
    from libpointmatcher_tpu.parallel.batch import _register_batch_to_map_host
    import numpy as np

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d)
    assert all(f.TRACEABLE for f in seq.reading_filters)

    T_init = np.eye(4, dtype=np.float32)
    T_init[:3, 3] = [0.01, -0.02, 0.03]
    T_f, info_f = register_batch_to_map(
        seq, [data3d, data3d], T_inits=[np.eye(4, dtype=np.float32), T_init], seed=7
    )
    T_h, info_h = _register_batch_to_map_host(
        seq, [data3d, data3d], [np.eye(4, dtype=np.float32), T_init], seed=7
    )
    # same keys, same chain; host path compacts/reorders points so float
    # reductions differ in the last ulps and iteration counts may slip by one
    np.testing.assert_allclose(T_f, T_h, atol=2e-3)
    assert np.all(np.abs(info_f["iterations"] - info_h["iterations"]) <= 2)


def test_register_batch_to_map_overflow_flag(data3d, ref3d):
    """Compaction truncation is never silent: a pinned cap smaller than the
    survivor count sets info['compact_overflow'] for the affected pairs;
    the auto cap (keep-rate scaled to the padded capacity) never overflows
    (advisor finding, round 1)."""
    from libpointmatcher_tpu.parallel import register_batch_to_map

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d)

    _, info_auto = register_batch_to_map(seq, [data3d, data3d], seed=11)
    assert not np.any(info_auto["compact_overflow"])

    _, info_tiny = register_batch_to_map(
        seq, [data3d, data3d], seed=11, compact_rows=32
    )
    assert np.all(info_tiny["compact_overflow"])


def test_register_batch_to_map_host_fallback(data3d, ref3d):
    """Host-stateful filters (FixStepSampling) must take the host path."""
    from libpointmatcher_tpu.filters.basic import (
        FixStepSamplingDataPointsFilter,
    )
    from libpointmatcher_tpu.parallel import register_batch_to_map
    from tests.conftest import validate_3d

    seq = pm.ICPSequence()
    seq.set_default()
    seq.reading_filters = [
        FixStepSamplingDataPointsFilter({"startStep": "2", "endStep": "2"})
    ]
    seq.set_map(ref3d)
    assert not all(
        getattr(f, "TRACEABLE", False) for f in seq.reading_filters
    )
    T_b, info = register_batch_to_map(seq, [data3d], seed=3)
    validate_3d(T_b[0])


def test_register_batch_to_map_block_matcher(data3d, ref3d):
    """Serving with the tile-sweep BlockGridMatcher: per-scan loop state
    (tile assignment) built on host, stacked and vmapped with the fused
    loop — must agree with dense-matcher serving on the same scans."""
    from libpointmatcher_tpu.parallel import register_batch_to_map
    from libpointmatcher_tpu.matchers import MatcherRegistrar
    from tests.conftest import validate_3d

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d)
    T_dense, _ = register_batch_to_map(seq, [data3d, data3d], seed=42)

    seq2 = pm.ICPSequence()
    seq2.set_default()
    seq2.matcher = MatcherRegistrar.create(
        "BlockGridMatcher", {"maxDist": "2.0", "motionBound": "2.0"}
    )
    seq2.set_map(ref3d)
    T_blk, info = register_batch_to_map(seq2, [data3d, data3d], seed=42)
    assert np.all(info["codes"] <= 1)
    for b in range(2):
        validate_3d(T_blk[b])
        # same pipeline modulo the maxDist cut on far pairs (rejected by
        # the trimmed filter in the dense run anyway): same pose
        np.testing.assert_allclose(T_blk[b], T_dense[b], atol=0.02)


def test_sharded_tile_nn1_matches_single_device(mesh):
    """Query-tile-sharded bounded 1-NN == the single-device tile sweep."""
    from libpointmatcher_tpu.ops.tilesweep import (
        assign_tiles, build_sub_blocks, tile_nn1,
    )
    from libpointmatcher_tpu.parallel import sharded_tile_nn1

    rng = np.random.default_rng(5)
    q = rng.uniform(-4, 4, size=(700, 3)).astype(np.float32)
    r = rng.uniform(-4, 4, size=(900, 3)).astype(np.float32)
    qm = np.ones(700, bool)
    qm[::11] = False
    rm = np.ones(900, bool)
    rm[::9] = False
    sub = build_sub_blocks(r, rm, cell_size=0.5)
    ta = assign_tiles(q, qm, sub, tile_q=64)
    vq = ta.vtile_q_rows()  # the per-virtual-tile layout the shard slices
    assert vq.shape[0] % 8 == 0  # tile ladder divides the mesh

    d1, i1 = tile_nn1(q, qm, vq, ta.blocks, sub.units, 0.5)
    d2, i2 = sharded_tile_nn1(
        q, qm, vq, ta.blocks, sub.units, 0.5, mesh
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d1), rtol=1e-6, atol=1e-7
    )
    # and both agree with brute force within the radius
    from libpointmatcher_tpu.ops.knn import knn_brute_force

    bd, bi = knn_brute_force(q, qm, r, rm, k=1)
    bd = np.asarray(bd)[:, 0]
    bi = np.asarray(bi)[:, 0]
    cut = bd <= 0.25
    f = np.isfinite(np.asarray(d1))
    assert np.array_equal(f, cut & qm)
    # the scan path's ‖q‖²+‖r‖²−2q·r form rounds ~1e-4-relative on small
    # distances; the tile sweep's difference form is the accurate one
    np.testing.assert_allclose(np.asarray(d1)[f], bd[f], rtol=1e-3, atol=1e-5)
