"""On-chip micro-benchmark of the MXU bound kernel (approx_min_sorted).

Times the kernel standalone and vmapped x8 at the serving shape, with a
dependent-call chain (CLAUDE.md: identical repeated calls through the
tunnel can return misleadingly fast). Compares precision modes and tile
sizes to find where the serve-path regression comes from.
"""

from __future__ import annotations

import functools
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


def chain_time(fn, x0, label):
    """Dependent-chain timing: each call's input depends on the previous
    call's output so the relay cannot collapse repeats."""
    out = jax.block_until_ready(fn(x0))  # compile
    t0 = time.perf_counter()
    x = x0
    for _ in range(REPS):
        out = fn(x)
        x = x0 + out * 1e-12
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    q_all, _, _ = reading.to_numpy()
    r_all, _, _ = reference.to_numpy()
    rm = np.ones(len(r_all), bool)
    rorder, _ = ks.morton_argsort(r_all, rm)
    rs = r_all[rorder].astype(np.float32)
    m_pad = -(-len(rs) // 128) * 128
    ra, _ = ks.augmented_ref_table(rs, rm, m_pad)
    ra_j = jnp.asarray(ra)

    n = len(q_all)
    n_pad = -(-n // 256) * 256
    qa, _ = ks.augment_queries(jnp.asarray(q_all.astype(np.float32)), n_pad)
    qa = jax.block_until_ready(qa)
    print(f"shape: n_pad={n_pad} m_pad={m_pad}")

    # single-scan kernel, default tiles
    chain_time(lambda x: ks.approx_min_sorted(x, ra_j)[:, None] * 0 + x,
               qa, "bound kernel single (tq=256, tm=2048)")

    for tq, tm in [(256, 512), (512, 2048), (1024, 4096), (256, 8192)]:
        np2 = -(-n // tq) * tq
        qa2, _ = ks.augment_queries(
            jnp.asarray(q_all.astype(np.float32)), np2)
        qa2 = jax.block_until_ready(qa2)
        f = functools.partial(ks.approx_min_sorted, tile_q=tq, tile_m=tm)
        chain_time(lambda x, f=f: f(x, ra_j)[:, None] * 0 + x, qa2,
                   f"bound kernel single (tq={tq}, tm={tm})")

    # vmapped x8 (the serving form)
    qa_b = jnp.stack([qa] * 8)
    vf = jax.jit(jax.vmap(lambda x: ks.approx_min_sorted(x, ra_j)))
    chain_time(lambda x: vf(x)[..., None] * 0 + x, qa_b,
               "bound kernel vmapped x8")

    # what does the exact dense kernel cost at this shape, for reference
    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas

    q_j = jnp.asarray(q_all.astype(np.float32))
    qm_j = jnp.ones((n,), bool)
    rs_j = jnp.asarray(rs)
    rm_j = jnp.asarray(rm)

    def dense(x):
        d, _ = knn1_pallas(x, qm_j, rs_j, rm_j)
        return x + d[:, None] * 1e-12

    chain_time(dense, q_j, "exact dense kernel single")


if __name__ == "__main__":
    main()
