"""Chip A/B: continuous-batching queue serving vs the lockstep batch path.

Measures, at the headline car-cloud serving shape (25k-pt scans onto the
12.5k-row prepped map, default point-to-plane chain):

  - blocking batched serving (the round-4 headline path), batch 8
  - queue serving at lanes = 8 / 16 / 32 over a 40-scan queue
  - queue + coarse-to-fine at the best lane count, several (decim, iters)

Prints one JSON line per scenario. Run ONE process at a time (tunnel
wedges on concurrent clients — CLAUDE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu import io
    from libpointmatcher_tpu.parallel import (
        register_batch_to_map,
        register_queue_to_map,
    )

    base = "/root/reference/examples/data"
    reading = io.load(f"{base}/car_cloud401.csv")
    reference = io.load(f"{base}/car_cloud400.csv")

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(reference, seed=0)

    out = []

    def report(name, regs, secs, extra=None):
        row = {"scenario": name, "reg_per_s": round(regs / secs, 3),
               "ms_total": round(secs * 1e3, 1), "n_reg": regs}
        if extra:
            row.update(extra)
        out.append(row)
        print(json.dumps(row), flush=True)

    Q = 40
    scans = [reading] * Q

    # ---- blocking batch path, batch 8 (5 batches of 8 = 40 regs)
    register_batch_to_map(seq, scans[:8], seed=0)  # warm
    reps = 3
    times = []
    iters_b = None
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(Q // 8):
            _, info = register_batch_to_map(
                seq, scans[i * 8:(i + 1) * 8], seed=1000 * r + i + 1
            )
        times.append(time.perf_counter() - t0)
        iters_b = info["iterations"]
    report("batch8_blocking", Q, float(np.median(times)),
           {"mean_iters": float(np.mean(iters_b))})

    # ---- queue path at several lane counts
    lane_results = {}
    for lanes in (8, 16, 32):
        register_queue_to_map(seq, scans, seed=0, lanes=lanes)  # warm
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            _, info = register_queue_to_map(
                seq, scans, seed=2000 + 100 * r, lanes=lanes
            )
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        lane_results[lanes] = med
        report(f"queue_lanes{lanes}", Q, med,
               {"mean_iters": float(np.mean(info["iterations"]))})

    best_lanes = min(lane_results, key=lane_results.get)

    # ---- pose-parity reference for coarse-to-fine
    T_ref, _ = register_queue_to_map(seq, scans, seed=0, lanes=best_lanes)
    p = np.asarray(jax.device_get(reading.points))

    for coarse in [(4, 10, 2.0), (4, 14, 2.0), (2, 12, 2.0), (4, 10, 1.0)]:
        try:
            register_queue_to_map(seq, scans, seed=0, lanes=best_lanes,
                                  coarse=coarse)  # warm
            times = []
            for r in range(reps):
                t0 = time.perf_counter()
                T_c, info = register_queue_to_map(
                    seq, scans, seed=3000 + 100 * r, lanes=best_lanes,
                    coarse=coarse,
                )
                times.append(time.perf_counter() - t0)
            # parity at the SAME seed as the reference run
            T_c0, _ = register_queue_to_map(
                seq, scans, seed=0, lanes=best_lanes, coarse=coarse
            )
            diffs = []
            for i in range(Q):
                a = p @ T_ref[i][:3, :3].T + T_ref[i][:3, 3]
                b = p @ T_c0[i][:3, :3].T + T_c0[i][:3, 3]
                diffs.append(
                    float(np.median(np.linalg.norm(a - b, axis=1)))
                )
            report(
                f"queue_c2f_{coarse[0]}x_{coarse[1]}it_t{coarse[2]}",
                Q, float(np.median(times)),
                {"mean_fine_iters": float(np.mean(info["iterations"])),
                 "pose_diff_mm_median": round(
                     1e3 * float(np.median(diffs)), 3),
                 "pose_diff_mm_max": round(1e3 * float(np.max(diffs)), 3)},
            )
        except Exception as e:  # keep sweeping on a failed config
            print(json.dumps({"scenario": f"c2f_{coarse}",
                              "error": repr(e)}), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "queue_ab_out.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
