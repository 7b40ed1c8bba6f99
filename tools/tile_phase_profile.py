"""Phase breakdown of tile-matcher batch serving at the LARGE shapes.

Separates, per register_batch_to_map call at the terrain scene:
  host  — threaded assign_tiles numpy prep
  aux   — eager device aux chain (gather_candidates x b, _pad_tile_aux,
          stack) up to the runner call
  loop  — the fused serve runner (prep+loop program) + readback

Motivation: LARGE_r05 measures 48-58 ms/"batch-iter" at 1e5/4e5 while the
sweep's padded compute is ~0.14 ms/scan-iter and the grid is only 24
steps/scan — the naive total/iters division lumps a suspected large
per-BATCH overhead into the per-iteration number. This tool attributes it.

Usage: python tools/tile_phase_profile.py [N]
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
from libpointmatcher_tpu.cloud import PointCloud  # noqa: E402
from libpointmatcher_tpu.parallel import batch as pb  # noqa: E402
from libpointmatcher_tpu.parallel import register_batch_to_map  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from large_reg_bench import build_seq, make_map, make_scans  # noqa: E402

BATCH = 8


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rng = np.random.default_rng(7)
    map_pts, side = make_map(n, rng)
    scans, T_gts = make_scans(map_pts, side, rng)
    map_cloud = PointCloud.from_numpy(map_pts)

    seq = build_seq("BlockGridMatcher", {
        "maxDist": "0.5", "motionBound": "1.0",
        "tileQueries": "64", "blockCap": "1024",
    })
    seq.set_map(map_cloud, seed=0)
    register_batch_to_map(seq, scans, seed=0)  # compile everything

    # --- whole-call reference timing
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        T_out, info = register_batch_to_map(seq, scans, seed=i + 1)
    whole = (time.perf_counter() - t0) / reps
    iters = float(np.mean(info["iterations"]))

    # --- phase timing: re-enact _register_batch_to_map_aux with timers
    reference = seq.get_prefiltered_internal_map()
    b = len(scans)
    dim = scans[0].dim
    Trm = jax.numpy.asarray(seq._T_refIn_refMean)
    Trm_h = np.asarray(jax.device_get(Trm), np.float64)
    Trm_inv_h = np.linalg.inv(Trm_h)
    T_inits = [np.eye(dim + 1, dtype=np.float32)] * b

    batch_reading = pb._stack_clouds_padded(scans, prefer_numpy=True)
    T_inits_b = jax.numpy.stack(
        [jax.numpy.asarray(t, jax.numpy.float32) for t in T_inits]
    )
    rows = batch_reading.points.shape[-2]

    def prep_one(i_rd):
        i, rd = i_rd
        pts, mask = pb._host_rows(rd)
        T_rmd = Trm_inv_h @ np.asarray(T_inits[i], np.float64)
        moved = pts @ T_rmd[:dim, :dim].T + T_rmd[:dim, dim]
        return seq.matcher.prepare_loop_host(moved, mask)

    from concurrent.futures import ThreadPoolExecutor

    for rep in range(3):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=min(b, 8)) as ex:
            outs = list(ex.map(prep_one, enumerate(scans)))
        pers = [o[0] for o in outs]
        shared = outs[-1][1]
        t_host = time.perf_counter() - t0

        t0 = time.perf_counter()
        sentinel = int(shared["sub_units"].shape[0]) - 1
        per_aux = jax.device_put(pb._pad_tile_aux_np(pers, sentinel))
        jax.block_until_ready(per_aux)
        t_aux = time.perf_counter() - t0

        cache_key = None
        for k in seq._jit_cache:
            if k[0] == "serve_aux":
                cache_key = k
        runner = seq._jit_cache[cache_key]
        t0 = time.perf_counter()
        out = runner(batch_reading, T_inits_b, Trm, reference,
                     jax.numpy.int32(rep + 1), per_aux, shared)
        jax.block_until_ready(out)
        t_loop = time.perf_counter() - t0

        # loop re-run with identical aux (pure program exec + readback)
        t0 = time.perf_counter()
        out = runner(batch_reading, T_inits_b, Trm, reference,
                     jax.numpy.int32(rep + 1), per_aux, shared)
        jax.block_until_ready(out)
        t_loop2 = time.perf_counter() - t0

        print(f"rep{rep}: host={t_host * 1e3:7.1f} ms  "
              f"aux-eager={t_aux * 1e3:7.1f} ms  "
              f"runner={t_loop * 1e3:7.1f} ms  "
              f"runner(rerun)={t_loop2 * 1e3:7.1f} ms")

    print(f"whole call: {whole * 1e3:.1f} ms/batch at iters~{iters:.1f} "
          f"(N={n}, {BATCH} scans)")


if __name__ == "__main__":
    main()
