"""Per-component breakdown of the TILE-matcher serving loop (aux path).

Same methodology as tools/profile_loop.py (fixed iteration budget,
counter-only checker) but with BlockGridMatcher, so the 'everything else'
cost of the aux serve runner can be attributed.

Usage: python tools/tile_loop_profile.py [maxDist motionBound tileQ cap]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.checkers import CounterTransformationChecker  # noqa: E402
from libpointmatcher_tpu.matchers import MatcherRegistrar  # noqa: E402
from libpointmatcher_tpu.parallel import register_batch_to_map  # noqa: E402

ITERS = int(os.environ.get("PMTPU_PROFILE_ITERS", "20"))
BATCH = 8
BASE = "/root/reference/examples/data"


def make_seq(variant, max_dist, motion, tile_q, cap) -> pm.ICPSequence:
    seq = pm.ICPSequence()
    seq.set_default()
    seq.checkers = [
        CounterTransformationChecker({"maxIterationCount": str(ITERS)})
    ]
    if variant != "dense":
        seq.matcher = MatcherRegistrar.create(
            "BlockGridMatcher",
            {"maxDist": str(max_dist), "motionBound": str(motion),
             "tileQueries": str(tile_q), "blockCap": str(cap)},
        )
    if variant == "identity-min":
        from libpointmatcher_tpu.minimizers import IdentityErrorMinimizer

        seq.error_minimizer = IdentityErrorMinimizer()
    elif variant == "null-outlier":
        from libpointmatcher_tpu.outlierfilters import NullOutlierFilter

        seq.outlier_filters = [NullOutlierFilter()]
    return seq


def run(variant, reading, reference, args) -> float:
    seq = make_seq(variant, *args)
    seq.set_map(reference, seed=0)
    scans = [reading] * BATCH
    register_batch_to_map(seq, scans, seed=0)  # warmup/compile
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        register_batch_to_map(seq, scans, seed=i + 1)
    return (time.perf_counter() - t0) / reps


def main():
    args = (
        float(sys.argv[1]) if len(sys.argv) > 1 else 1.0,
        float(sys.argv[2]) if len(sys.argv) > 2 else 0.5,
        int(sys.argv[3]) if len(sys.argv) > 3 else 64,
        int(sys.argv[4]) if len(sys.argv) > 4 else 1024,
    )
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    print(f"backend={jax.default_backend()} iters={ITERS} batch={BATCH} "
          f"maxDist/motion/tileQ/cap={args}")
    for variant in ["dense", "base", "identity-min", "null-outlier"]:
        dt = run(variant, reading, reference, args)
        print(f"{variant:14s} {dt * 1e3:8.1f} ms/batch "
              f"({dt / ITERS * 1e3:6.2f} ms/iter/batch)")


if __name__ == "__main__":
    main()
