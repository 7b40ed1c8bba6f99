"""On-chip micro-benchmark of the survivor-list sweep (ops/knn_sweep2).

Times stage A (bounds+survivors), the argsort glue, stage B (sweep), and
the full nn1_sorted_v2 step at the 25k-car serving shape — single scan
and vmapped x8 — for both iteration-0 (no transported bound) and warm
(winner-distance bound) regimes. In-jit dependent chains (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpointmatcher_tpu import io  # noqa: E402
import libpointmatcher_tpu.ops.knn_skip as ks  # noqa: E402
import libpointmatcher_tpu.ops.knn_sweep2 as k2  # noqa: E402

BASE = "/root/reference/examples/data"
REPS = 20


def loop_time(step, x0, label, reps=REPS):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c, i), x)

    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    q_all, _, _ = reading.to_numpy()
    r_all, _, _ = reference.to_numpy()
    qm = np.ones(len(q_all), bool)
    rm = np.ones(len(r_all), bool)
    qorder, _ = ks.morton_argsort(q_all, qm)
    qs = q_all[qorder].astype(np.float32)
    rorder, _ = ks.morton_argsort(r_all, rm)
    rs = r_all[rorder].astype(np.float32)
    rt3 = jnp.asarray(k2.chunked_ref_table(rs, rm))
    ct = jnp.asarray(k2.chunk_summaries(rs, rm))
    n = len(qs)
    qs_j = jnp.asarray(qs)
    qm_j = jnp.asarray(qm)
    print(f"shape: n={n} nch={rt3.shape[0]} nch_pad={ct.shape[1]}")

    inf = jnp.full((n,), jnp.inf, jnp.float32)
    # exact winner distances as the warm transported bound
    d0, i0, frac0 = jax.block_until_ready(
        k2.nn1_sorted_v2(qs_j, qm_j, inf, rt3, ct))
    ubw = jnp.sqrt(d0)
    print(f"survivor fraction: iter0 {float(frac0):.3f}")
    _, _, fw = k2.nn1_sorted_v2(qs_j, qm_j, ubw, rt3, ct)
    print(f"survivor fraction: warm  {float(fw):.3f}", flush=True)

    def step_full(x, i, ub):
        d, ids, _ = k2.nn1_sorted_v2(x, qm_j, ub, rt3, ct)
        return x + d[:, None] * 1e-20

    loop_time(lambda x, i: step_full(x, i, inf), qs_j, "v2 full step, iter0")
    loop_time(lambda x, i: step_full(x, i, ubw), qs_j, "v2 full step, warm")

    for stq in [512, 2048]:
        def step_s(x, i, stq=stq):
            d, ids, _ = k2.nn1_sorted_v2(x, qm_j, ubw, rt3, ct,
                                         sweep_tile_q=stq)
            return x + d[:, None] * 1e-20

        loop_time(step_s, qs_j, f"v2 full step, warm, sweep_tq={stq}")

    # stages in isolation (warm bound)
    tile_q, sweep_tq = 256, 1024
    step_rows = 8 * tile_q
    n_pad = -(-n // step_rows) * step_rows
    qp = jnp.zeros((n_pad, 8), jnp.float32)
    qp = qp.at[:n, :3].set(qs_j).at[n:, 3].set(k2._FAR)
    qp = qp.at[:, 4].set(jnp.inf).at[:n, 4].set(ubw)
    qp = jax.block_until_ready(qp)

    def step_a(x, i):
        ub, surv = k2.survivors_and_bounds(x, ct)
        return x + ub[:, None] * 1e-20 + surv.sum() * 1e-20

    loop_time(step_a, qp, "stage A (bounds+survivors)")

    ub_, surv0 = jax.block_until_ready(k2.survivors_and_bounds(qp, ct))
    fold = sweep_tq // tile_q
    surv = jnp.max(surv0.reshape(surv0.shape[0] // fold, fold, -1), axis=1)
    surv = jax.block_until_ready(surv)

    def step_sort(x, i):
        lst = jnp.argsort(1 - (surv + x.astype(jnp.int32) * 0), axis=1,
                          stable=True)
        return x + lst.astype(jnp.float32) * 1e-20

    loop_time(step_sort, jnp.zeros_like(surv, jnp.float32),
              "argsort glue")

    from jax import lax as _lax

    lst = jnp.argsort(1 - surv, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(surv, axis=1, dtype=jnp.int32)
    col = _lax.broadcasted_iota(jnp.int32, lst.shape, 1)
    last = jnp.take_along_axis(lst, jnp.maximum(count - 1, 0)[:, None], 1)
    lst = jnp.where(col < count[:, None], lst, last)
    cnt = (-(-count // k2._B_UNROLL))[:, None]
    lst, cnt = jax.block_until_ready((lst, cnt))

    def step_b(x, i):
        d, ids = k2.nn1_survivor_sweep(x, rt3, lst, cnt, tile_q=sweep_tq)
        return x + d[:, None] * 1e-20

    loop_time(step_b, qp, "stage B (survivor sweep, warm)")

    # vmapped x8 full step
    qs_b = jnp.stack([qs_j] * 8)
    ub_b = jnp.stack([ubw] * 8)

    def stepv(x, i):
        d, ids, _ = jax.vmap(
            lambda a, u: k2.nn1_sorted_v2(a, qm_j, u, rt3, ct)
        )(x, ub_b)
        return x + d[..., None] * 1e-20

    loop_time(stepv, qs_b, "v2 full step vmapped x8, warm")

    def stepv0(x, i):
        d, ids, _ = jax.vmap(
            lambda a: k2.nn1_sorted_v2(a, qm_j, inf, rt3, ct)
        )(x)
        return x + d[..., None] * 1e-20

    loop_time(stepv0, qs_b, "v2 full step vmapped x8, iter0")

    # correctness spot-check on chip vs the dense kernel
    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas

    dd, di = knn1_pallas(qs_j, qm_j, jnp.asarray(rs), jnp.asarray(rm))
    agree = float(jnp.mean((di == i0)[qm_j].astype(jnp.float32)))
    derr = float(jnp.max(jnp.abs(jnp.where(qm_j, dd - d0, 0.0))))
    print(f"on-chip agreement vs dense: ids {agree:.6f} maxΔd² {derr:.2e}")


if __name__ == "__main__":
    main()
