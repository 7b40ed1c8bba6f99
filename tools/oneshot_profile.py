"""Phase-level timing of the one-shot ICP path on the current backend.

Phases: reference filter chain (host-stateful SamplingSurfaceNormal),
centering + matcher init, fused reading-prep+loop dispatch, final host
readback. Run twice per process: the second pass is the warm number.

Usage: python tools/oneshot_profile.py [runs]
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
from libpointmatcher_tpu.filters.base import apply_filter_chain  # noqa: E402
from libpointmatcher_tpu.icp import _center_cloud  # noqa: E402

BASE = "/root/reference/examples/data"


def one_shot_phased(icp, reading, reference, seed):
    key = jax.random.PRNGKey(seed)
    t = {}
    t0 = time.perf_counter()
    ref_f = apply_filter_chain(
        icp.reference_filters, reference, jax.random.fold_in(key, 1)
    )
    t["ref_chain"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ref_c, Trm = _center_cloud(ref_f)
    icp.matcher.init(ref_c)
    t["center+init"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    T = icp.compute_with_transformed_reference(
        reading, ref_c, Trm, pm.utils.se3.identity(3), key
    )
    np.asarray(jax.block_until_ready(T))
    t["prep+loop+readback"] = time.perf_counter() - t0
    return t


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    print(f"backend={jax.default_backend()}")

    icp = pm.ICP()
    icp.set_default()

    # warm both compile paths
    t0 = time.perf_counter()
    T = icp(reading, reference, seed=0)
    np.asarray(jax.block_until_ready(T))
    print(f"cold one-shot: {(time.perf_counter() - t0) * 1e3:.0f} ms")

    for i in range(runs):
        t0 = time.perf_counter()
        T = icp(reading, reference, seed=i + 1)
        np.asarray(jax.block_until_ready(T))
        total = time.perf_counter() - t0
        ph = one_shot_phased(icp, reading, reference, seed=i + 100)
        print(
            f"warm one-shot {total * 1e3:7.1f} ms | phased: "
            + "  ".join(f"{k}={v * 1e3:6.1f}ms" for k, v in ph.items())
            + f"  iters={icp.last_iteration_count}"
        )


if __name__ == "__main__":
    main()
