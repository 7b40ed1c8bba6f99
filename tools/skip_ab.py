"""On-chip A/B: dense fused serving vs the bbox-pruned skip serving path.

Same process, same ICPSequence map; toggles KDTreeMatcher.serving_loop_aux
to force the plain fused runner, then re-enables the skip path. Also times
the two kernels standalone (one sweep, no loop) at serving shapes.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PMTPU_SERVE_SKIP", "1")  # the path under test

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.matchers import KDTreeMatcher  # noqa: E402
from libpointmatcher_tpu.parallel import register_batch_to_map  # noqa: E402

BATCH = 8
BASE = "/root/reference/examples/data"


def bench_serve(seq, scans, label):
    t0 = time.perf_counter()
    T0, info = register_batch_to_map(seq, scans, seed=0)  # warmup/compile
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        T, info = register_batch_to_map(seq, scans, seed=i + 1)
    dt = (time.perf_counter() - t0) / reps
    iters = info["iterations"]
    print(f"{label:24s} {dt * 1e3:8.1f} ms/batch  {BATCH / dt:6.2f} reg/s  "
          f"iters={list(iters)}  (compile {compile_s:.0f}s)", flush=True)
    return T, dt


def main():
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    scans = [reading] * BATCH
    print(f"backend={jax.default_backend()} batch={BATCH}", flush=True)

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(reference, seed=0)

    # ---- plain fused dense path (skip disabled)
    orig = KDTreeMatcher.serving_loop_aux
    KDTreeMatcher.serving_loop_aux = lambda self, ref: False
    T_plain, dt_p = bench_serve(seq, scans, "dense fused (no skip)")

    # ---- skip path
    KDTreeMatcher.serving_loop_aux = orig
    T_skip, dt_s = bench_serve(seq, scans, "bbox-pruned skip")

    err = np.max(np.abs(np.asarray(T_plain) - np.asarray(T_skip)))
    print(f"pose agreement max |dT|: {err:.2e}")
    print(f"skip/plain: {dt_s / dt_p:.2f}x", flush=True)

    # ---- host prep cost of the skip path (batched morton)
    from libpointmatcher_tpu.parallel.batch import _host_rows
    pts, mask = _host_rows(reading)
    pts_b = np.broadcast_to(pts, (BATCH,) + pts.shape).copy()
    mask_b = np.broadcast_to(mask, (BATCH,) + mask.shape).copy()
    seq.matcher.prepare_loop_host_batch(pts_b, mask_b)  # warm
    t0 = time.perf_counter()
    seq.matcher.prepare_loop_host_batch(pts_b, mask_b)
    print(f"host prep (batched morton x{BATCH}): "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

    # ---- standalone kernel timing at serving shapes (single scan)
    from libpointmatcher_tpu.ops.knn_skip import (
        build_skip_mask, nn1_sorted_skip,
    )
    from libpointmatcher_tpu.ops.dispatch import knn_search

    ref_int = seq.get_prefiltered_internal_map()
    aux_ok = seq.matcher.serving_loop_aux(ref_int)
    print(f"serving_loop_aux: {aux_ok}  map rows={ref_int.num_points}")
    per, shared = seq.matcher.prepare_loop_host(pts, mask)
    qs = jnp.asarray(pts, jnp.float32)[per["qorder"]]
    qm = jnp.asarray(mask)[per["qorder"]]

    def time_it(fn, reps=10):
        jax.block_until_ready(fn())  # warm/compile OUTSIDE the timer
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    @jax.jit
    def skip_iter0(qs, qm):
        ub2 = jnp.full((qs.shape[0],), jnp.inf, jnp.float32)
        sk = build_skip_mask(qs, qm, ub2, shared["skip_cbox"], 256)
        return nn1_sorted_skip(qs, qm, shared["skip_rt"],
                               shared["skip_rpen"], sk, tile_q=256)

    @jax.jit
    def skip_warm(qs, qm, prev_pos, prev_d2):
        ub = jnp.sqrt(prev_d2) + jnp.sqrt(
            jnp.sum((qs - prev_pos) ** 2, -1))
        sk = build_skip_mask(qs, qm, ub * ub, shared["skip_cbox"], 256)
        return nn1_sorted_skip(qs, qm, shared["skip_rt"],
                               shared["skip_rpen"], sk, tile_q=256)

    @jax.jit
    def dense(qs, qm):
        return knn_search(qs, qm, ref_int.points, ref_int.mask, k=1)

    d0 = jax.block_until_ready(skip_iter0(qs, qm))[0]
    t_dense = time_it(lambda: dense(qs, qm))
    t_iter0 = time_it(lambda: skip_iter0(qs, qm))
    t_warm = time_it(lambda: skip_warm(qs, qm, qs, d0))
    sk = build_skip_mask(qs, qm, d0, shared["skip_cbox"], 256)
    frac = float(jnp.mean(sk.astype(jnp.float32)))
    print(f"single-scan sweep: dense {t_dense:.2f} ms  "
          f"skip-iter0 {t_iter0:.2f} ms  skip-warm {t_warm:.2f} ms  "
          f"(skip fraction warm: {frac:.2f})", flush=True)


if __name__ == "__main__":
    main()
