"""On-chip: skip-kernel time as a function of FORCED skip rate.

The round-3 finding was 46% super-chunks skipped -> only 14% kernel win;
before investing in tighter bounds, this measures whether the predicated
kernel actually converts skip fraction into time. Synthetic skip masks at
0/25/50/75/90/96% are applied to the real serving shape (correctness is
irrelevant here — only the timing of the predicated sweep matters), plus
the dense kernel and the vmapped-x8 serving form of each.
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

BASE = "/root/reference/examples/data"
REPS = 20
TILE_Q = 256
GROUP = 4


def chain_time(fn, x0, label):
    """In-jit dependent chain (see bound_kernel_micro): one dispatch,
    REPS kernel executions."""
    import jax as _jax

    @_jax.jit
    def run(x):
        return _jax.lax.fori_loop(0, REPS, lambda i, c: fn(c), x)

    _jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    out = run(x0)
    _jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:40s} {dt:8.2f} ms", flush=True)
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
    q = q_all[qorder].astype(np.float32)
    rorder, _ = ks.morton_argsort(r_all, rm)
    rs = r_all[rorder].astype(np.float32)
    m_pad = -(-len(rs) // 128) * 128
    rt = np.zeros((8, m_pad), np.float32)
    rt[:3, :len(rs)] = rs.T
    rpen = np.full((1, m_pad), np.inf, np.float32)
    rpen[0, :len(rs)] = 0.0
    rt_j, rpen_j = jnp.asarray(rt), jnp.asarray(rpen)

    n = len(q)
    ni = -(-n // TILE_Q)
    nsg = -(-(m_pad // 128) // GROUP)
    q_j = jnp.asarray(q)
    qm_j = jnp.asarray(qm)
    print(f"shape: n={n} m_pad={m_pad} tiles={ni} superchunks={nsg}")

    rng = np.random.default_rng(0)
    for rate in [0.0, 0.25, 0.5, 0.75, 0.9, 0.96]:
        skip = (rng.random((ni, nsg)) < rate).astype(np.int32)
        skip_j = jnp.asarray(skip)

        def run(x, skip_j=skip_j):
            d, i = ks.nn1_sorted_skip(x, qm_j, rt_j, rpen_j, skip_j,
                                      tile_q=TILE_Q, group=GROUP)
            return x + d[:, None] * 1e-20

        chain_time(run, q_j, f"skip kernel, forced rate {rate:.2f}")

    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas

    rs_j = jnp.asarray(rs)
    rm_j = jnp.asarray(rm)

    def dense(x):
        d, _ = knn1_pallas(x, qm_j, rs_j, rm_j)
        return x + d[:, None] * 1e-20

    chain_time(dense, q_j, "dense kernel")

    # build_skip_mask cost alone (with a representative finite ub)
    cbox = jnp.asarray(ks.chunk_bboxes(rs, rm, chunk=128 * GROUP))
    ub2 = jnp.full((n,), jnp.float32(0.01))

    @jax.jit
    def mask_only(x):
        sk = ks.build_skip_mask(x, qm_j, ub2, cbox, TILE_Q)
        return x + sk.sum() * 1e-20

    chain_time(mask_only, q_j, "build_skip_mask alone")


if __name__ == "__main__":
    main()
