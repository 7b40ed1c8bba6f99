"""On-chip micro-bench: bbox-pruned skip pipeline vs the dense 1-NN sweep
at the serving shape (car pair, batch 8, ~20 dependent iterations inside
one jit — the tunnel makes repeated identical calls untrustworthy, so each
step's queries depend on the previous step's result).

Old pipeline: vmapped knn1_pallas on compacted queries (today's serving).
New pipeline: per-iteration ub gather + skip-mask build + nn1_sorted_skip
on Morton-sorted uncompacted queries, prev winners carried (matcher state).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import libpointmatcher_tpu  # noqa: F401  (pins matmul precision)
    from libpointmatcher_tpu import io
    from libpointmatcher_tpu.ops import knn_skip as ks
    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas

    base = "/root/reference/examples/data"
    reading = io.load(f"{base}/car_cloud401.csv")
    reference = io.load(f"{base}/car_cloud400.csv")
    q_pts, _, _ = reading.to_numpy()
    r_pts, _, _ = reference.to_numpy()
    rng = np.random.default_rng(0)
    r = r_pts[rng.permutation(len(r_pts))[:12459]].astype(np.float32)
    n_rows = 25088
    q = np.zeros((n_rows, 3), np.float32)
    nq = min(len(q_pts), n_rows)
    q[:nq] = q_pts[:nq]
    qmask = np.zeros(n_rows, bool)
    qmask[:nq] = rng.random(nq) < 0.75

    B, K = 8, 20
    print(f"queries {qmask.sum()} valid / {n_rows} rows; map {len(r)}; "
          f"batch {B}, {K} chained iters")

    # ---- old pipeline: compacted queries (today's serving cap)
    cap = 20992
    qc = q[qmask][:cap]
    qcm = np.ones(len(qc), bool)
    qc_pad = np.zeros((cap, 3), np.float32)
    qc_pad[:len(qc)] = qc
    qcm_pad = np.zeros(cap, bool)
    qcm_pad[:len(qc)] = qcm
    qb = jnp.asarray(np.broadcast_to(qc_pad, (B, cap, 3)).copy())
    qbm = jnp.asarray(np.broadcast_to(qcm_pad, (B, cap)).copy())
    rj = jnp.asarray(r)
    rm = jnp.ones(len(r), bool)

    @jax.jit
    def run_old(qb):
        def body(carry, t):
            shift = 0.02 * carry[..., None, None]  # data dependence
            d, i = jax.vmap(lambda qq: knn1_pallas(
                qq, qbm[0], rj, rm))(qb + shift)
            return jnp.mean(d, where=jnp.isfinite(d)), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
        return out

    # ---- new pipeline
    rorder, _ = ks.morton_argsort(r, np.ones(len(r), bool))
    rs = r[rorder]
    m_pad = -(-len(r) // 128) * 128
    rt = np.zeros((8, m_pad), np.float32)
    rt[:3, :len(r)] = rs.T
    rpen = np.full((1, m_pad), np.inf, np.float32)
    rpen[0, :len(r)] = 0.0
    rs_pad = np.zeros((m_pad, 3), np.float32)
    rs_pad[:len(r)] = rs
    cbox = ks.chunk_bboxes(rs, np.ones(len(r), bool))
    qorder, qinv = ks.morton_argsort(q, qmask)

    rt_j = jnp.asarray(rt)
    rpen_j = jnp.asarray(rpen)
    rs_j = jnp.asarray(rs_pad)
    cbox_j = jnp.asarray(cbox)
    qorder_j = jnp.asarray(np.broadcast_to(qorder, (B, n_rows)).copy())
    qinv_j = jnp.asarray(np.broadcast_to(qinv, (B, n_rows)).copy())
    qfull = jnp.asarray(np.broadcast_to(q, (B, n_rows, 3)).copy())
    qfm = jnp.asarray(np.broadcast_to(qmask, (B, n_rows)).copy())
    TQ = 256

    @jax.jit
    def run_new(qfull):
        def one(qq, qm, qo, qi, prev, shift):
            qs = qq[qo] + shift
            qsm = qm[qo]
            cand = rs_j[jnp.clip(prev, 0, rs_j.shape[0] - 1)]
            ub2 = jnp.where(prev >= 0,
                            jnp.sum((qs - cand) ** 2, -1), jnp.inf)
            skip = ks.build_skip_mask(qs, qsm, ub2, cbox_j, TQ)
            d, i = ks.nn1_sorted_skip(qs, qsm, rt_j, rpen_j, skip,
                                      tile_q=TQ)
            # serving also unsorts + maps ids — include that cost
            d_o = d[qi]
            return d_o, i, skip

        def body(carry, t):
            acc, prev = carry
            shift = 0.02 * acc[..., None]
            d_o, i, skip = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, None))(
                qfull, qfm, qorder_j, qinv_j, prev, shift)
            acc = jnp.mean(d_o, where=jnp.isfinite(d_o))
            return (acc, i), skip.mean()

        prev0 = jnp.full((B, n_rows), -1, jnp.int32)
        (acc, _), fracs = jax.lax.scan(
            body, (jnp.zeros(()), prev0), jnp.arange(K))
        return acc, fracs

    for name, fn, arg in (("old", run_old, qb), ("new", run_new, qfull)):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg))
        print(f"{name}: compile+first {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg))
        dt = time.perf_counter() - t0
        print(f"{name}: {K} iters x batch {B}: {dt*1e3:.1f} ms "
              f"({dt/K*1e3:.2f} ms/iter)")
        if name == "new":
            print("   skip fraction per iter:",
                  np.round(np.asarray(out[1]), 3))


if __name__ == "__main__":
    main()
