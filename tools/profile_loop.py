"""On-chip breakdown of the fused ICP loop's per-iteration cost.

Times the production serving shape (batch 8 scan-to-map, default chain)
with components swapped out one at a time, at a FIXED iteration budget so
runs are comparable. Timing follows CLAUDE.md: distinct seeds per repeat,
one host readback at the end.

Usage: python tools/profile_loop.py
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.checkers import CounterTransformationChecker  # noqa: E402
from libpointmatcher_tpu.parallel import register_batch_to_map  # noqa: E402

ITERS = int(__import__("os").environ.get("PMTPU_PROFILE_ITERS", "20"))
BATCH = 8
BASE = "/root/reference/examples/data"


def make_seq(variant: str) -> pm.ICPSequence:
    seq = pm.ICPSequence()
    seq.set_default()
    # fixed budget: counter only, no convergence-based early exit
    seq.checkers = [
        CounterTransformationChecker({"maxIterationCount": str(ITERS)})
    ]
    if variant == "null-outlier":
        from libpointmatcher_tpu.outlierfilters import NullOutlierFilter

        seq.outlier_filters = [NullOutlierFilter()]
    elif variant == "maxdist-outlier":
        from libpointmatcher_tpu.outlierfilters import MaxDistOutlierFilter

        seq.outlier_filters = [MaxDistOutlierFilter({"maxDist": "1.0"})]
    elif variant == "point2point":
        from libpointmatcher_tpu.minimizers import PointToPointErrorMinimizer

        seq.error_minimizer = PointToPointErrorMinimizer()
    elif variant == "identity-min":
        from libpointmatcher_tpu.minimizers import IdentityErrorMinimizer

        seq.error_minimizer = IdentityErrorMinimizer()
    elif variant == "no-checker-diff":
        pass  # counter-only is already the base here
    elif variant != "base":
        raise ValueError(variant)
    return seq


def run(variant: str, reading, reference) -> float:
    seq = make_seq(variant)
    seq.set_map(reference, seed=0)
    scans = [reading] * BATCH
    register_batch_to_map(seq, scans, seed=0)  # warmup/compile
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        register_batch_to_map(seq, scans, seed=i + 1)
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    print(f"backend={jax.default_backend()} iters={ITERS} batch={BATCH}")

    results = {}
    for variant in ["base", "identity-min", "point2point", "null-outlier",
                    "maxdist-outlier"]:
        dt = run(variant, reading, reference)
        per_iter = dt / ITERS / BATCH * 1e3
        results[variant] = dt
        print(f"{variant:18s} {dt * 1e3:8.1f} ms/batch "
              f"({per_iter:6.3f} ms/iter/pair)")

    # pure matcher loop: match-only while_loop at the same shapes
    seq = make_seq("base")
    seq.set_map(reference, seed=0)
    ref_map = seq.get_prefiltered_internal_map()
    print("map points (prefiltered):", seq.prefiltered_reference_pts_count)

    from libpointmatcher_tpu.filters.base import apply_filter_chain
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    r = apply_filter_chain(seq.reading_filters, reading, key)
    print("reading points (filtered):", r.count_host(), "of", r.num_points)

    matcher = seq.matcher

    def match_loop(rpts, rmask, ref):
        def body(i, carry):
            d_acc, shift = carry
            stepped = r.replace(points=rpts + shift * 1e-6)
            m = matcher.find_closests_in(stepped, ref)
            s = jnp.sum(jnp.where(jnp.isfinite(m.dists), m.dists, 0.0))
            return d_acc + s, s
        return jax.lax.fori_loop(0, ITERS, body, (0.0, 0.0))[0]

    f = jax.jit(jax.vmap(match_loop, in_axes=(0, 0, None)))
    rpts = jnp.stack([r.points] * BATCH)
    rmask = jnp.stack([r.mask] * BATCH)
    out = f(rpts, rmask, ref_map)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(rpts + i * 1e-7, rmask, ref_map)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{'match-only':18s} {dt * 1e3:8.1f} ms/batch "
          f"({dt / ITERS / BATCH * 1e3:6.3f} ms/iter/pair)")


if __name__ == "__main__":
    main()
