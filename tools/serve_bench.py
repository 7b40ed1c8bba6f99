"""On-chip serve-path A/B: dense KDTreeMatcher vs tile-sweep BlockGridMatcher.

Measures register_batch_to_map throughput at the production shape (batch 8,
car clouds, default chain otherwise) and checks the two matchers land on
the same poses (golden-style criterion).

Usage: python tools/serve_bench.py [maxDist motionBound tileQueries blockCap]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.matchers import MatcherRegistrar  # noqa: E402
from libpointmatcher_tpu.parallel import register_batch_to_map  # noqa: E402

BATCH = 8
BASE = "/root/reference/examples/data"


def bench(seq, scans, label):
    t0 = time.perf_counter()
    T0, info = register_batch_to_map(seq, scans, seed=0)  # warmup/compile
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        T, info = register_batch_to_map(seq, scans, seed=i + 1)
    dt = (time.perf_counter() - t0) / reps
    iters = info["iterations"]
    print(f"{label:28s} {dt * 1e3:8.1f} ms/batch  "
          f"{BATCH / dt:6.2f} reg/s  iters={list(iters)}  "
          f"(compile {compile_s:.0f}s)")
    return T, dt


def main():
    max_dist = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    motion = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    tile_q = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    block_cap = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    scans = [reading] * BATCH
    print(f"backend={jax.default_backend()} batch={BATCH} "
          f"maxDist={max_dist} motionBound={motion} "
          f"tileQueries={tile_q} blockCap={block_cap}")

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(reference, seed=0)
    T_dense, dt_d = bench(seq, scans, "dense KDTreeMatcher")

    seq2 = pm.ICPSequence()
    seq2.set_default()
    seq2.matcher = MatcherRegistrar.create(
        "BlockGridMatcher",
        {"maxDist": str(max_dist), "motionBound": str(motion),
         "tileQueries": str(tile_q), "blockCap": str(block_cap)},
    )
    seq2.set_map(reference, seed=0)
    T_blk, dt_b = bench(seq2, scans, "tile BlockGridMatcher")

    # pose agreement, golden criterion style
    pts, _, _ = reading.to_numpy()
    for b in range(BATCH):
        a = pts @ T_blk[b][:3, :3].T + T_blk[b][:3, 3]
        c = pts @ T_dense[b][:3, :3].T + T_dense[b][:3, 3]
        err = np.median(np.linalg.norm(a - c, axis=1)
                        / np.maximum(np.linalg.norm(c, axis=1), 1e-9))
        if b == 0:
            print(f"pose agreement median rel err (pair 0): {err:.5f}")
        assert err < 0.03, (b, err)
    print(f"speedup: {dt_d / dt_b:.2f}x  "
          f"({BATCH / dt_b:.2f} vs {BATCH / dt_d:.2f} reg/s)")


if __name__ == "__main__":
    main()
