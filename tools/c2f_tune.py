"""Fine-tune the coarse-to-fine queue schedule on chip (follow-up to
tools/queue_ab.py): sweep (decim, coarse_iters, tol) around the round-5
winner at the headline car-serving shape. One process at a time."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu import io
    from libpointmatcher_tpu.parallel import register_queue_to_map

    base = "/root/reference/examples/data"
    reading = io.load(f"{base}/car_cloud401.csv")
    reference = io.load(f"{base}/car_cloud400.csv")
    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(reference, seed=0)
    Q, lanes, reps = 40, 8, 3
    scans = [reading] * Q

    register_queue_to_map(seq, scans, seed=0, lanes=lanes)  # warm
    T_ref, _ = register_queue_to_map(seq, scans, seed=0, lanes=lanes)
    p = np.asarray(jax.device_get(reading.points))

    import ast, os
    cfgs = ast.literal_eval(os.environ.get("PMTPU_C2F_CONFIGS",
        "[(4,10,1.0),(4,12,1.0),(4,14,1.0),(4,16,1.0),(6,12,1.0),(8,14,1.0)]"))
    for coarse in cfgs:
        register_queue_to_map(seq, scans, seed=0, lanes=lanes,
                              coarse=coarse)
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            T_c, info = register_queue_to_map(
                seq, scans, seed=5000 + r, lanes=lanes, coarse=coarse
            )
            times.append(time.perf_counter() - t0)
        T_c0, _ = register_queue_to_map(seq, scans, seed=0, lanes=lanes,
                                        coarse=coarse)
        diffs = [
            float(np.median(np.linalg.norm(
                (p @ T_ref[i][:3, :3].T + T_ref[i][:3, 3])
                - (p @ T_c0[i][:3, :3].T + T_c0[i][:3, 3]), axis=1)))
            for i in range(0, Q, 5)
        ]
        print(json.dumps({
            "coarse": list(coarse),
            "reg_per_s": round(Q / float(np.median(times)), 3),
            "fine_iters": round(float(np.mean(info["iterations"])), 2),
            "pose_mm_max": round(1e3 * max(diffs), 3),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
