"""On-chip micro-benchmark of 1-NN kernel variants at the serving shape.

Timing per CLAUDE.md: a chain of dependent calls inside one jit (each call's
query depends on the previous result) so the relay can't replay a cached
answer; one host readback at the end.

Usage: python tools/knn_micro.py [N M]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = 20  # dependent-chain length inside one jit


def bench(fn, q, qm, r, rm, **kw):
    """Time REPS dependent calls of fn inside one jit."""

    def chain(q):
        def body(i, carry):
            q, acc = carry
            d, idx = fn(q, qm, r, rm, **kw)
            # dependence: shift queries by a value derived from the result
            bump = jnp.where(jnp.isfinite(d), d, 0.0).sum() * 1e-12
            return q + bump, acc + bump

        return jax.lax.fori_loop(0, REPS, body, (q, 0.0))[1]

    f = jax.jit(chain)
    out = f(q)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    out = f(q + 1e-6)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    return dt


def check(fn, q, qm, r, rm, ref_d, ref_i, name, **kw):
    d, idx = jax.device_get(fn(q, qm, r, rm, **kw))
    d0, i0 = ref_d, ref_i
    ok_d = np.allclose(d[qm], d0[qm], rtol=1e-4, atol=1e-6)
    agree = float((idx[qm] == i0[qm]).mean())
    print(f"  {name}: dists close={ok_d} id agreement={agree:.5f}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 12459
    print(f"backend={jax.default_backend()} N={n} M={m} reps={REPS}")

    rng = np.random.default_rng(0)
    # car-cloud-like scale: ~20m extent
    q = jnp.asarray(rng.uniform(-10, 10, (n, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(-10, 10, (m, 3)), jnp.float32)
    qm = np.ones(n, bool)
    qm[int(n * 0.93):] = False  # some padding, like the serve path
    rm = np.ones(m, bool)
    qmj = jnp.asarray(qm)
    rmj = jnp.asarray(rm)

    from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas, knn1_pallas_mxu
    from knn_variants import knn1_chunked, knn1_mxu, knn1_transposed

    ref_d, ref_i = jax.device_get(knn1_pallas(q, qmj, r, rmj))

    cases = [
        ("current vpu 512x2048", knn1_pallas, {}),
        ("current vpu 256x4096", knn1_pallas, {"tile_q": 256, "tile_m": 4096}),
        ("current vpu 1024x2048", knn1_pallas, {"tile_q": 1024, "tile_m": 2048}),
        ("current vpu 512x4096", knn1_pallas, {"tile_q": 512, "tile_m": 4096}),
        ("chunked  vpu 512x2048", knn1_chunked, {}),
        ("chunked  vpu 1024x2048", knn1_chunked, {"tile_q": 1024, "tile_m": 2048}),
        ("chunked  vpu 256x4096", knn1_chunked, {"tile_q": 256, "tile_m": 4096}),
        ("transposed  2048x512", knn1_transposed, {}),
        ("transposed  4096x512", knn1_transposed, {"tile_q": 4096, "tile_m": 512}),
        ("transposed  2048x1024", knn1_transposed,
         {"tile_q": 2048, "tile_m": 1024}),
        ("mxu highest 512x2048", knn1_mxu, {"precision": "highest"}),
        ("mxu default 512x2048", knn1_mxu, {"precision": "default"}),
        ("mxu highest old", knn1_pallas_mxu, {}),
    ]
    for name, fn, kw in cases:
        try:
            check(fn, q, qmj, r, rmj, ref_d, ref_i, name, **kw)
            dt = bench(fn, q, qmj, r, rmj, **kw)
            cells = n * m
            print(f"{name:24s} {dt * 1e3:7.3f} ms  "
                  f"({cells / dt / 1e12:.3f} Tcell/s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
