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
    GROUP = 4
    cbox = ks.chunk_bboxes(rs, np.ones(len(r), bool), chunk=128 * GROUP)
    qorder, qinv = ks.morton_argsort(q, qmask)

    rt_j = jnp.asarray(rt)
    rpen_j = jnp.asarray(rpen)
    cbox_j = jnp.asarray(cbox)
    TQ = 256

    # sorted-space pipeline (the shipped form): queries permuted ONCE
    # outside the loop, triangle-inequality bound carried as (prev_pos,
    # prev_d2) — no gathers inside the iteration
    qsorted = jnp.asarray(
        np.broadcast_to(q[qorder], (B, n_rows, 3)).copy())
    qsm_j = jnp.asarray(np.broadcast_to(qmask[qorder], (B, n_rows)).copy())

    @jax.jit
    def run_new(qsorted):
        def one(qs, qsm, prev_pos, prev_d2, shift):
            qs = qs + shift
            step = jnp.sqrt(jnp.sum((qs - prev_pos) ** 2, -1))
            ub = jnp.sqrt(prev_d2) + step
            skip = ks.build_skip_mask(qs, qsm, ub * ub, cbox_j, TQ)
            d, i = ks.nn1_sorted_skip(qs, qsm, rt_j, rpen_j, skip,
                                      tile_q=TQ, group=GROUP)
            return d, (qs, d), skip

        def body(carry, t):
            acc, state = carry
            shift = 0.02 * acc[..., None]
            d, state, skip = jax.vmap(
                one, in_axes=(0, 0, 0, 0, None))(
                qsorted, qsm_j, state[0], state[1], shift)
            acc = jnp.mean(d, where=jnp.isfinite(d))
            return (acc, state), skip.mean()

        state0 = (qsorted, jnp.full((B, n_rows), jnp.inf, jnp.float32))
        (acc, _), fracs = jax.lax.scan(
            body, (jnp.zeros(()), state0), jnp.arange(K))
        return acc, fracs

    for name, fn, arg in (("old", run_old, qb), ("new", run_new, qsorted)):
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
