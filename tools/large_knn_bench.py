"""Large-cloud matcher benchmark: dense exact sweep vs tile sweep at 10^5-10^6.

Grounds two claims:
- the `epsilon` parity note (KDTreeMatcher accepts the reference's
  approximate-search knob but is exact): at what scale does exactness stop
  being free, and what the framework's actual large-cloud knob
  (BlockGridMatcher's bounded radius) buys there;
- the tile sweep's scaling (compute ~ candidates touched, not N*M).

Usage: python tools/large_knn_bench.py [N ...]
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

from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas  # noqa: E402
from libpointmatcher_tpu.ops.tilesweep import (  # noqa: E402
    assign_tiles, build_sub_blocks, gather_candidates,
    tile_nn1_from_candidates,
)

RADIUS = 0.5  # terrain-like scene, ~LiDAR map density


def make_scene(n, rng):
    """Terrain-like cloud: x-y extent grows with N at fixed density."""
    side = float(np.sqrt(n / 120.0))
    xy = rng.uniform(0, side, (n, 2))
    z = 0.4 * np.sin(xy[:, 0]) * np.cos(xy[:, 1] * 0.7) \
        + 0.05 * rng.standard_normal(n)
    return np.concatenate([xy, z[:, None]], 1).astype(np.float32)


def timeit(f, *args):
    out = f(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        # distinct inputs per rep: identical repeated calls can be replayed
        # by the relay (CLAUDE.md timing rule)
        out = f(args[0] + jnp.float32(1e-7 * (i + 1)), *args[1:])
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000, 1_000_000]
    print(f"backend={jax.default_backend()} radius={RADIUS}")
    for n in sizes:
        rng = np.random.default_rng(0)
        ref = make_scene(n, rng)
        q = ref + rng.uniform(-0.05, 0.05, ref.shape).astype(np.float32)
        qm = np.ones(n, bool)
        rm = np.ones(n, bool)
        qj, rj = jnp.asarray(q), jnp.asarray(ref)
        qmj, rmj = jnp.asarray(qm), jnp.asarray(rm)

        t_build0 = time.perf_counter()
        sub = build_sub_blocks(ref, rm, RADIUS)      # init-time (amortized)
        t_build = time.perf_counter() - t_build0
        t_assign0 = time.perf_counter()
        ta = assign_tiles(q, qm, sub)                # loop-start (amortized)
        cand_t, pen, cid = jax.block_until_ready(
            gather_candidates(sub, ta.blocks)        # loop-start (amortized)
        )
        t_assign = time.perf_counter() - t_assign0

        # candidate tables as jit ARGUMENTS — closed-over they would be
        # embedded in the program as constants (oversized compile payload)
        f_tile = jax.jit(
            lambda pts, rows, ct, pn, ci, par, vr: tile_nn1_from_candidates(
                pts, qmj, rows, ct, pn, ci, RADIUS, parent=par, vrows=vr)
        )
        dt_tile, (td, ti) = timeit(f_tile, qj, ta.q_rows, cand_t, pen, cid,
                                   ta.parent, ta.vrows)
        T, TQ = ta.vtile_q_rows().shape
        M = cand_t.shape[2]
        print(f"    tiles T={T} TQ={TQ} M={M} "
              f"padded sweep={T * TQ * M / 1e6:.0f}M cells")

        if n <= 400_000:
            f_dense = jax.jit(lambda pts: knn1_pallas(pts, qmj, rj, rmj))
            dt_dense, (dd, di) = timeit(f_dense, qj)
            # agreement within the radius
            td_h, dd_h, ti_h, di_h = jax.device_get((td, dd, ti, di))
            inrad = dd_h <= RADIUS ** 2
            agree = float((ti_h[inrad] == di_h[inrad]).mean())
        else:
            dt_dense, agree = float("nan"), float("nan")
        print(
            f"N={n:>9,}: dense={dt_dense * 1e3:9.1f} ms  "
            f"tile={dt_tile * 1e3:7.1f} ms  "
            f"speedup={dt_dense / dt_tile:6.1f}x  agree={agree:.5f}  "
            f"touched={ta.touched / 1e6:.1f}M of {n * n / 1e6:.0f}M  "
            f"(build {t_build * 1e3:.0f} ms, assign {t_assign * 1e3:.0f} ms)"
        )


if __name__ == "__main__":
    main()
