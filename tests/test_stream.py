"""Continuous-batching queue serving (parallel/stream.py).

The queue driver must reproduce the batched serving path bit for bit when
queue indices align (same seed folding), while paying only each scan's own
iteration count instead of the batch's slowest lane (reference serving
contract: ICP.cpp:455-612; the lockstep waste it removes is the round-4
verdict's top item)."""

import numpy as np
import pytest

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.parallel import (
    register_batch_to_map,
    register_queue_to_map,
)
from libpointmatcher_tpu.parallel.batch import PendingRegistration


@pytest.fixture(scope="module")
def seq_and_scans(ref3d, data3d):
    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d, seed=0)
    return seq, [data3d] * 10


@pytest.mark.slow
def test_queue_matches_batch_bitexact(seq_and_scans):
    seq, scans = seq_and_scans
    Tb, ib = register_batch_to_map(seq, scans, seed=0)
    Tq, iq = register_queue_to_map(seq, scans, seed=0, lanes=4)
    assert np.array_equal(ib["iterations"], iq["iterations"])
    assert np.array_equal(ib["codes"], iq["codes"])
    np.testing.assert_array_equal(Tb, Tq)
    np.testing.assert_array_equal(ib["residual"], iq["residual"])
    np.testing.assert_array_equal(
        ib["point_used_ratio"], iq["point_used_ratio"]
    )


@pytest.mark.slow
def test_queue_coarse_to_fine(seq_and_scans, data3d):
    """Two-pass coarse-to-fine (FixStepSampling's schedule as queue
    phases): fine-pass iteration count must drop and the final pose must
    agree with the fine-only pose within the golden criterion's scale."""
    seq, scans = seq_and_scans
    Tq, iq = register_queue_to_map(seq, scans, seed=0, lanes=4)
    Tc, ic = register_queue_to_map(
        seq, scans, seed=0, lanes=4, coarse=(4, 12)
    )
    assert ic["iterations"].mean() < iq["iterations"].mean()
    p = np.asarray(data3d.points)[np.asarray(data3d.mask)]
    scale = float(np.linalg.norm(p.max(0) - p.min(0)))
    for i in range(len(scans)):
        a = p @ Tq[i][:3, :3].T + Tq[i][:3, 3]
        b = p @ Tc[i][:3, :3].T + Tc[i][:3, 3]
        med = float(np.median(np.linalg.norm(a - b, axis=1)))
        assert med < 0.01 * scale  # well inside the 3% golden criterion


@pytest.mark.slow
def test_queue_respects_T_inits(seq_and_scans):
    seq, scans = seq_and_scans
    rng = np.random.default_rng(3)
    T_inits = []
    for _ in scans:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(scale=0.05, size=3)
        T_inits.append(T)
    Tb, _ = register_batch_to_map(seq, scans, T_inits=T_inits, seed=0)
    Tq, _ = register_queue_to_map(
        seq, scans, T_inits=T_inits, seed=0, lanes=4
    )
    np.testing.assert_array_equal(Tb, Tq)


@pytest.mark.slow
def test_queue_async_pending(seq_and_scans):
    seq, scans = seq_and_scans
    out = register_queue_to_map(seq, scans, seed=0, lanes=4, block=False)
    assert isinstance(out, PendingRegistration)
    Tq, iq = out.result()
    Tb, ib = register_batch_to_map(seq, scans, seed=0)
    np.testing.assert_array_equal(Tb, Tq)


@pytest.mark.slow
def test_queue_falls_back_when_ineligible(seq_and_scans):
    """AA acceleration and short queues route through the batch path (same
    results contract, so the fallback is transparent)."""
    seq, scans = seq_and_scans
    seq.acceleration = "anderson"
    try:
        T, info = register_queue_to_map(seq, scans[:4], seed=0, lanes=8)
    finally:
        seq.acceleration = None
    assert T.shape == (4, 4, 4)
    assert info["iterations"].shape == (4,)


@pytest.mark.slow
def test_queue_reuses_compiled_programs(seq_and_scans):
    seq, scans = seq_and_scans
    register_queue_to_map(seq, scans, seed=0, lanes=4)
    n = len(seq._jit_cache)
    register_queue_to_map(seq, scans, seed=1, lanes=4)
    assert len(seq._jit_cache) == n


@pytest.mark.slow
def test_warmup_precompiles_serving(ref3d, data3d):
    """seq.warmup(rows) must land the same compiled programs a real scan
    batch of that padded shape uses — the serving deployment then never
    pays a first-compile stall mid-stream (round-4 verdict #9)."""
    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(ref3d, seed=0)
    secs = seq.warmup(data3d.num_points, batch=4, queue_len=8, lanes=4)
    assert secs > 0
    n = len(seq._jit_cache)
    register_batch_to_map(seq, [data3d] * 4, seed=1)
    register_queue_to_map(seq, [data3d] * 8, seed=1, lanes=4)
    assert len(seq._jit_cache) == n  # no new compiles after warmup


@pytest.mark.slow
def test_queue_tile_matcher_matches_batch(ref3d, data3d):
    """The tile-aux queue mode (BlockGridMatcher: per-scan assignments
    pooled and swapped with the lanes) must reproduce the batched aux
    path bit for bit, including the per-scan motionBound audit."""
    from libpointmatcher_tpu.matchers import MatcherRegistrar

    seq = pm.ICPSequence()
    seq.set_default()
    seq.matcher = MatcherRegistrar.create(
        "BlockGridMatcher", {"maxDist": "2.0", "motionBound": "25.0"})
    seq.set_map(ref3d, seed=0)
    scans = [data3d] * 8
    Tb, ib = register_batch_to_map(seq, scans, seed=0)
    Tq, iq = register_queue_to_map(seq, scans, seed=0, lanes=4)
    assert np.array_equal(ib["iterations"], iq["iterations"])
    np.testing.assert_array_equal(Tb, Tq)
    assert "motion_bound_exceeded" in iq
    np.testing.assert_array_equal(
        ib["motion_bound_exceeded"], iq["motion_bound_exceeded"]
    )
    assert not iq["motion_bound_exceeded"].any()


@pytest.mark.slow
def test_queue_length_bucketing_shares_programs(seq_and_scans):
    """Queue lengths bucket onto the shape ladder: nearby lengths (and
    lengths below the lane count) reuse ONE compiled program, and the
    results still match the batch path per scan (round-5 review #4/#5)."""
    seq, scans = seq_and_scans
    register_queue_to_map(seq, scans[:9], seed=0, lanes=4)
    n = len(seq._jit_cache)
    T_q, iq = register_queue_to_map(seq, scans[:10], seed=0, lanes=4)
    assert len(seq._jit_cache) == n  # same bucket (12) → no new compile
    assert T_q.shape == (10, 4, 4)
    Tb, ib = register_batch_to_map(seq, scans[:10], seed=0)
    np.testing.assert_array_equal(Tb, T_q)
    # short queue (fewer scans than lanes) runs natively
    T_s, is_ = register_queue_to_map(seq, scans[:3], seed=0, lanes=4)
    Tb3, _ = register_batch_to_map(seq, scans[:3], seed=0)
    np.testing.assert_array_equal(Tb3, T_s)


def test_fixstep_schedule_table_matches_host_filter():
    """The fused schedule table must replay filter()'s own f64
    sequential-multiply arithmetic exactly — including non-dyadic
    stepMult (f32 power diverged: 25*1.4^2 → 48 vs 49) and
    endStep-beyond-startStep growth (round-5 review #3)."""
    from libpointmatcher_tpu.filters.basic import (
        FixStepSamplingDataPointsFilter,
    )

    for params in [
        {"startStep": "25", "endStep": "1", "stepMult": "1.4"},
        {"startStep": "25", "endStep": "3", "stepMult": "0.7"},
        {"startStep": "3", "endStep": "33", "stepMult": "1.3"},
        {"startStep": "10", "endStep": "10", "stepMult": "1.0"},
        {"startStep": "7", "endStep": "2", "stepMult": "0.33"},
    ]:
        f = FixStepSamplingDataPointsFilter(dict(params))
        table = f._schedule_table()
        g = FixStepSamplingDataPointsFilter(dict(params))
        g.init()
        for i in range(40):
            expect = max(int(g.step), 1)
            # replicate filter()'s advance without building clouds
            delta = g.startStep * g.stepMult - g.startStep
            g.step *= g.stepMult
            if delta < 0 and g.step < g.endStep:
                g.step = float(g.endStep)
            if delta > 0 and g.step > g.endStep:
                g.step = float(g.endStep)
            assert table[i] == expect, (params, i, table[i], expect)


def test_var_dist_stale_grid_invalidation(monkeypatch):
    """A bail-out prepare_loop (or the stepped driver) must never leave a
    previous registration's culled grid live: the compiled loop has the
    grid closed over, so the token must bump whenever the grid state
    changes to 'dense intended' (round-5 review #1)."""
    from libpointmatcher_tpu.matchers import KDTreeVarDistMatcher
    from libpointmatcher_tpu import MatcherRegistrar as Reg

    monkeypatch.setattr(KDTreeVarDistMatcher, "CULL_MIN_MAP", 10)
    rng = np.random.default_rng(2)
    ref = pm.PointCloud.from_numpy(
        rng.uniform(-2, 2, size=(600, 3)).astype(np.float32))
    reading = pm.PointCloud.from_numpy(
        rng.uniform(-2, 2, size=(200, 3)).astype(np.float32))
    reading = reading.with_descriptor(
        "maxSearchDist", np.full(reading.num_points, 0.8, np.float32))
    m = Reg.create("KDTreeVarDistMatcher", {"knn": "1"})
    m.init(ref)
    m.prepare_loop(reading)
    assert m._vd_grid is not None
    t1 = m.cache_token
    # reading without the radius descriptor → dense intended → token bump
    bare = pm.PointCloud.from_numpy(
        rng.uniform(-2, 2, size=(200, 3)).astype(np.float32))
    m.prepare_loop(bare)
    assert m._vd_grid is None and m.cache_token != t1
    # rebuild, then the stepped-driver hook must also clear + bump
    m.prepare_loop(reading)
    t2 = m.cache_token
    assert m._vd_grid is not None
    m.invalidate_loop_state()
    assert m._vd_grid is None and m.cache_token != t2
