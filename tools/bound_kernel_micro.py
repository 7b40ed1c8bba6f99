"""On-chip micro-benchmark of the MXU bound kernel (approx_min_sorted).

Timing uses a chain of dependent calls INSIDE ONE JIT (lax.fori_loop whose
carry feeds each step) — the only trustworthy pattern through the relay
(CLAUDE.md: repeated identical dispatches get memoized and read back
suspiciously fast; host-side perturbations below f32 resolution repeat
exactly). One dispatch, one readback, REPS kernel executions.
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


def loop_time(step, x0, label, reps=REPS):
    """step(x, i) -> x (same shape/dtype). One jit, reps dependent calls."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c, i), x)

    jax.block_until_ready(run(x0))  # compile
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

    for tq, tm in [(256, 256), (256, 512), (256, 1024), (256, 2048),
                   (512, 512)]:
        np2 = -(-n // tq) * tq
        qa2, _ = ks.augment_queries(
            jnp.asarray(q_all.astype(np.float32)), np2)
        qa2 = jax.block_until_ready(qa2)
        f = functools.partial(ks.approx_min_sorted, tile_q=tq, tile_m=tm)

        def step(x, i, f=f):
            amin = f(x, ra_j)
            return x + amin[:, None] * 1e-20

        loop_time(step, qa2, f"bound kernel (tq={tq}, tm={tm})")

    # vmapped x8 (the serving form), default tiles
    qa_b = jnp.stack([qa] * 8)

    def stepv(x, i):
        amin = jax.vmap(lambda a: ks.approx_min_sorted(a, ra_j))(x)
        return x + amin[..., None] * 1e-20

    loop_time(stepv, qa_b, "bound kernel vmapped x8")

    # on-device Morton order (serving prep replacement), vmapped x8
    q_raw = jnp.asarray(q_all.astype(np.float32))
    qm_raw = jnp.ones((n,), bool)
    q_b = jax.block_until_ready(jnp.stack([q_raw] * 8))

    def stepm(x, i):
        o = jax.vmap(lambda p: ks.morton_argsort_device(p, qm_raw))(x)
        return x + o[..., None].astype(jnp.float32) * 1e-20

    loop_time(stepm, q_b, "device morton argsort vmapped x8")

    # exact dense kernel, single scan
    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas

    rs_j = jnp.asarray(rs)
    rm_j = jnp.asarray(rm)

    def stepd(x, i):
        d, _ = knn1_pallas(x, qm_raw, rs_j, rm_j)
        return x + d[:, None] * 1e-20

    loop_time(stepd, q_raw, "exact dense kernel single")

    def stepd8(x, i):
        d, _ = jax.vmap(
            lambda xx: knn1_pallas(xx, qm_raw, rs_j, rm_j))(x)
        return x + d[..., None] * 1e-20

    loop_time(stepd8, q_b, "exact dense kernel vmapped x8")


if __name__ == "__main__":
    main()
