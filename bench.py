"""Benchmark: registrations/s of the fused TPU ICP engine vs a CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the reference repo's own example pair (car_cloud400 → car_cloud401,
~25k points each) under the canonical default chain (random-sampled reading,
sampling-surface-normal reference, exact NN matching, trimmed-dist outliers,
point-to-plane minimizer, counter+differential stop — reference:
ICP.cpp:100-113).

Fairness contract (round-2 audit): the headline is the scan-to-map SERVING
scenario — the reference's own amortization (ICP.cpp:463-508: the map is
filtered and kd-tree-indexed once, many readings register against it) — so
the CPU baseline is amortized the SAME way: its kd-tree build and normal
estimation run once outside the timer, and the timed region is exactly the
per-registration work (reading subsample + per-iteration kd-tree query,
trim, point-to-plane solve) at the same iteration budget the TPU side
measured. Both sides therefore pay per-registration costs only. The
secondary one-shot numbers include ALL prep on BOTH sides. The baseline is
COMPILED single-thread C++ (native/pm_native.cpp: kd-tree build + 1-NN
queries + quantile trim + point-to-plane normal equations — the same
algorithm the timed region stands in for, reference MatchersImpl.cpp:78-101
+ PointToPlane.cpp:213-247; verified to reproduce the scipy/numpy
formulation's transform to 1e-15 and measured 1.34x faster than it). The
scipy/numpy stand-in is still measured and reported alongside. CPU
libpointmatcher itself is not buildable here (no Eigen/Boost in the image)
and publishes no numbers in-tree (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _load_clouds():
    from libpointmatcher_tpu import io

    base = "/root/reference/examples/data"
    reading = io.load(f"{base}/car_cloud401.csv")
    reference = io.load(f"{base}/car_cloud400.csv")
    return reading, reference


def cpu_prepare(ref_pts):
    """Map-side prep, done ONCE (the reference's ICPSequence::setMap):
    kd-tree build + knn=10 normal estimation."""
    from scipy.spatial import cKDTree

    ref = ref_pts.astype(np.float64)
    tree = cKDTree(ref)
    _, nbr = tree.query(ref, k=10)
    nb = ref[nbr]  # [M,10,3]
    centered = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("mki,mkj->mij", centered, centered)
    _, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    return tree, ref, normals


def cpu_register(tree, ref, normals, reading_pts, iterations, seed=0):
    """One registration at a fixed iteration budget: reading subsample +
    the per-iteration query/trim/point-to-plane work. Matches the default
    chain's per-registration path."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    keep = rng.random(len(reading_pts)) < 0.75
    src = reading_pts[keep].astype(np.float64)

    T = np.eye(4)
    for _ in range(iterations):
        cur = src @ T[:3, :3].T + T[:3, 3]
        d, idx = tree.query(cur, k=1)
        lim = np.quantile(d, 0.85)
        m = d <= lim
        p = cur[m]
        q = ref[idx[m]]
        n = normals[idx[m]]
        c = np.cross(p, n)
        F = np.concatenate([c, n], axis=1)
        A = F.T @ F
        b = -(F.T @ np.sum((p - q) * n, axis=1))
        x = np.linalg.lstsq(A, b, rcond=None)[0]
        dT = np.eye(4)
        dT[:3, :3] = Rotation.from_rotvec(x[:3]).as_matrix()
        dT[:3, 3] = x[3:]
        T = dT @ T
    return T


def main():
    import os

    import jax

    # persistent compilation cache: the fused/vmapped loop programs compile
    # once per (shape, config); later invocations (including this benchmark
    # re-run by the driver) load them in milliseconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.parallel import register_batch

    reading, reference = _load_clouds()
    backend = jax.default_backend()

    icp = pm.ICP()
    icp.set_default()

    # ---- one-shot latency (one pair end to end, ALL prep included)
    T = icp(reading, reference, seed=0)  # warmup/compile
    np.asarray(T)
    runs = 3
    t0 = time.perf_counter()
    iters_total = 0
    for i in range(runs):
        T = icp(reading, reference, seed=i)
        np.asarray(jax.block_until_ready(T))
        iters_total += icp.last_iteration_count
    single_time = (time.perf_counter() - t0) / runs
    mean_iters = iters_total / runs

    # ---- batched one-shot throughput (pair-parallel, prep included)
    batch = 4
    readings = [reading] * batch
    references = [reference] * batch
    register_batch(icp, readings, references, seed=0)  # warmup/compile
    t0 = time.perf_counter()
    bruns = 2
    for i in range(bruns):
        T_b, info = register_batch(icp, readings, references, seed=i + 1)
    batch_time = (time.perf_counter() - t0) / bruns
    throughput = batch / batch_time

    # ---- HEADLINE: scan-to-map serving throughput (the ICPSequence
    # production shape; map prepped once — reference: ICP.cpp:463-508).
    # Round 5: the production path is CONTINUOUS BATCHING
    # (parallel/stream.py): the whole scan queue is device-resident, one
    # program steps L lanes and swaps in the next queued scan the moment a
    # lane's checkers stop — no lockstep convergence waste (the vmapped
    # batch runs every lane to its slowest scan), no per-batch dispatch
    # syncs (this also supersedes the round-4 "pipelined" block=False
    # scenario, whose measurement was a single non-median sample).
    from libpointmatcher_tpu.parallel import (
        register_batch_to_map,
        register_queue_to_map,
    )

    seq = pm.ICPSequence()
    seq.set_default()
    seq.set_map(reference, seed=0)
    map_batch = 8
    scans = [reading] * map_batch
    register_batch_to_map(seq, scans, seed=0)  # warmup/compile
    # median of >=5 timed runs with min/max spread: 3-run means through
    # the noisy relay could not distinguish ~8% box noise from a real
    # regression (round-3 verdict)
    mruns = 5
    serve_iters = 0.0
    serve_samples = []
    for i in range(mruns):
        t0 = time.perf_counter()
        T_plain, minfo = register_batch_to_map(seq, scans, seed=i + 1)
        serve_samples.append(time.perf_counter() - t0)
        serve_iters += float(np.mean(minfo["iterations"]))
    serve_time = float(np.median(serve_samples))
    serve_throughput = map_batch / serve_time
    serve_spread = (map_batch / max(serve_samples),
                    map_batch / min(serve_samples))
    serve_iters /= mruns

    # continuous-batching queue: Q scans through L lanes, one program
    # lanes=8: the round-5 chip A/B (tools/queue_ab.py, queue_ab_out.json)
    # measured lanes 16/32 LOSING (20.2/15.5 vs 22.6 reg/s at 8) — the
    # vmapped matching kernel does not amortize past 8 lanes at this shape
    # Q=64 (round-5 A/B): the c2f fine pass converges in ~4.7 iterations,
    # so a Q=40 queue idles ~10% of lane-iterations in the drain tail;
    # Q=64 measured 50.75 vs 47.60 reg/s same-box (+6.6%). Longer still
    # amortizes further but compiles a bigger program for little gain.
    Q = int(os.environ.get("PMTPU_BENCH_QUEUE", "64"))
    lanes = int(os.environ.get("PMTPU_BENCH_LANES", "8"))
    scans_q = [reading] * Q
    register_queue_to_map(seq, scans_q, seed=0, lanes=lanes)  # warm
    queue_samples = []
    queue_iters = 0.0
    for i in range(mruns):
        t0 = time.perf_counter()
        T_q, qinfo = register_queue_to_map(
            seq, scans_q, seed=i + 1, lanes=lanes
        )
        queue_samples.append(time.perf_counter() - t0)
        queue_iters += float(np.mean(qinfo["iterations"]))
    queue_time = float(np.median(queue_samples))
    queue_throughput = Q / queue_time
    queue_iters /= mruns

    # coarse-to-fine queue (FixStepSampling's graduated-resolution
    # schedule as queue phases, reference: ICP.cpp:373-379 +
    # DataPointsFilters/FixStepSampling.cpp): headline-eligible only when
    # pose parity with the plain queue holds at golden-criterion scale
    # (4,16,1.0): best of the round-5 chip sweeps (tools/c2f_tune.py —
    # 37.1/39.3 reg/s in two runs vs 22.6 plain queue, fine iters ~4.7,
    # pose diff vs plain <= 0.6 mm max; deeper coarse budgets pay until
    # ~16 iterations, then contention noise dominates)
    c2f_env = os.environ.get("PMTPU_BENCH_C2F", "4,16,1.0")
    c2f_throughput, c2f_iters, c2f_parity = 0.0, float("nan"), float("nan")
    try:
        if c2f_env in ("", "0", "off"):
            raise RuntimeError("c2f disabled")
        coarse = tuple(
            float(x) if i == 2 else int(x)
            for i, x in enumerate(c2f_env.split(","))
        )
        register_queue_to_map(seq, scans_q, seed=0, lanes=lanes,
                              coarse=coarse)  # warm
        c2f_samples = []
        c2f_iters = 0.0
        for i in range(mruns):
            t0 = time.perf_counter()
            T_c, cinfo = register_queue_to_map(
                seq, scans_q, seed=i + 1, lanes=lanes, coarse=coarse
            )
            c2f_samples.append(time.perf_counter() - t0)
            c2f_iters += float(np.mean(cinfo["iterations"]))
        c2f_throughput = Q / float(np.median(c2f_samples))
        c2f_iters /= mruns
        # pose parity vs the plain queue at the same seed
        r_pts_c, _, _ = reading.to_numpy()
        diffs = []
        for i in range(0, Q, max(Q // 8, 1)):
            a = r_pts_c @ T_q[i][:3, :3].T + T_q[i][:3, 3]
            b = r_pts_c @ T_c[i][:3, :3].T + T_c[i][:3, 3]
            diffs.append(float(np.median(np.linalg.norm(a - b, axis=1))))
        c2f_parity = float(np.median(diffs))
        scale = float(np.linalg.norm(
            r_pts_c.max(axis=0) - r_pts_c.min(axis=0)
        ))
        if max(diffs) > 0.01 * scale:  # outside golden-criterion scale
            c2f_throughput = 0.0
    except Exception:
        pass

    # ---- AA-ICP serving (the framework's accelerated production config:
    # Anderson acceleration of the ICP fixed point, \cite{Pavlov2017AAICP},
    # opt-in via icp.acceleration; pose parity with the plain loop is
    # asserted below and covered by tests). Convergence is the engine's
    # own Differential checker either way — AA just reaches it in fewer
    # iterations.
    # SUNSET (round 5): AA-ICP stays a supported engine feature
    # (acceleration="anderson", tested), but is no longer a default bench
    # scenario — three rounds of measurement never saw it beat the plain
    # loop at this shape (its iteration savings are small-op-latency
    # bound), and the coarse-to-fine queue dominates it outright
    # (34.3 vs 21.6 reg/s, round-5 A/B). PMTPU_BENCH_AA=1 re-measures it.
    try:
        if not os.environ.get("PMTPU_BENCH_AA"):
            raise RuntimeError("AA scenario disabled (sunset, round 5)")
        seq.acceleration = "anderson"
        register_batch_to_map(seq, scans, seed=0)  # warmup/compile
        t0 = time.perf_counter()
        aa_iters = 0.0
        for i in range(mruns):
            T_aa, ainfo = register_batch_to_map(seq, scans, seed=i + 1)
            aa_iters += float(np.mean(ainfo["iterations"]))
        aa_time = (time.perf_counter() - t0) / mruns
        aa_throughput = map_batch / aa_time
        aa_iters /= mruns
        r_pts_parity, _, _ = reading.to_numpy()
        a = r_pts_parity @ T_aa[0][:3, :3].T + T_aa[0][:3, 3]
        b = r_pts_parity @ T_plain[0][:3, :3].T + T_plain[0][:3, 3]
        aa_parity = float(np.median(np.linalg.norm(a - b, axis=1)))
    except Exception:
        aa_throughput, aa_iters, aa_parity = 0.0, float("nan"), float("nan")
    finally:
        seq.acceleration = None

    # ---- CPU baselines, amortized the same way: map prep outside the
    # timer, per-registration work timed at the SAME iteration budget.
    # Primary: compiled single-thread C++ (native/pm_native.cpp). The
    # scipy/numpy stand-in is measured alongside for continuity.
    r_pts, _, _ = reading.to_numpy()
    f_pts, _, _ = reference.to_numpy()
    tree, ref, normals = cpu_prepare(f_pts)          # NOT timed (setMap)
    budget = max(int(round(serve_iters)), 1)
    cpu_register(tree, ref, normals, r_pts, 1, seed=99)  # warm numpy/scipy
    cruns = 3
    t0 = time.perf_counter()
    for i in range(cruns):
        cpu_register(tree, ref, normals, r_pts, budget, seed=i)
    cpu_time_py = (time.perf_counter() - t0) / cruns

    from libpointmatcher_tpu.io.native import cpu_baseline

    nb = cpu_baseline(f_pts)
    if nb is not None:
        nb.compute_normals(10)                       # NOT timed (setMap)
        rng = np.random.default_rng(0)
        srcs = [
            r_pts[rng.random(len(r_pts)) < 0.75].astype(np.float64)
            for _ in range(cruns)
        ]
        nb.register(srcs[0], 1)                      # warm
        t0 = time.perf_counter()
        for s in srcs:
            nb.register(s, budget)
        cpu_time = (time.perf_counter() - t0) / cruns
        # convergence-stopped: the baseline runs to ITS own Differential
        # stop (reference checker semantics, same default thresholds the
        # engine uses) — the honest denominator for comparing against the
        # AA-accelerated loop, which also stops at its own convergence
        t0 = time.perf_counter()
        conv_iters = 0
        for s in srcs:
            _, it = nb.register_conv(s, max_iterations=40)
            conv_iters += it
        cpu_conv_time = (time.perf_counter() - t0) / cruns
        cpu_conv_iters = conv_iters / cruns
    else:
        cpu_time = cpu_time_py
        cpu_conv_time = cpu_time_py
        cpu_conv_iters = budget

    # one-shot CPU (all prep inside, like the TPU one-shot number)
    t0 = time.perf_counter()
    if nb is not None:
        nb2 = cpu_baseline(f_pts)
        nb2.compute_normals(10)
        rng = np.random.default_rng(7)
        nb2.register(
            r_pts[rng.random(len(r_pts)) < 0.75].astype(np.float64),
            max(int(mean_iters), 1),
        )
    else:
        tree2, ref2, normals2 = cpu_prepare(f_pts)
        cpu_register(tree2, ref2, normals2, r_pts,
                     max(int(mean_iters), 1), seed=7)
    cpu_single = time.perf_counter() - t0

    # Headline: the fastest serving config — plain queue (continuous
    # batching), coarse-to-fine queue (parity-guarded), AA-ICP batch, or
    # the plain blocking batch. vs_baseline keeps the round-2 audited
    # budget-matched contract (identical per-iteration work at the same
    # iteration count, compiled C++); the convergence-stopped framing
    # (each side at its OWN Differential stop) is reported alongside.
    candidates = {
        "QUEUE": queue_throughput,
        "QUEUE-C2F": c2f_throughput,
        "AA": aa_throughput,
        "plain-batch": serve_throughput,
    }
    best_label = max(candidates, key=candidates.get)
    best_throughput = candidates[best_label]
    vs_baseline = cpu_time * best_throughput
    vs_conv = cpu_conv_time * best_throughput

    # regression guard: compare against the last committed round's driver
    # result and flag loudly when the serving headline dropped >10%
    regress_note = ""
    try:
        import glob
        import re

        prev_files = sorted(
            glob.glob(os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "BENCH_r*.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )
        if prev_files:
            with open(prev_files[-1]) as f:
                prev = json.load(f)
            prev_val = float(prev.get("parsed", prev).get("value", 0.0))
            if prev_val > 0 and best_throughput < 0.9 * prev_val:
                regress_note = (
                    f"; REGRESSION: headline {best_throughput:.2f}/s is "
                    f"{(1 - best_throughput / prev_val) * 100:.0f}% below "
                    f"{os.path.basename(prev_files[-1])} ({prev_val:.2f}/s)"
                )
            else:
                regress_note = (
                    f"; prev round {prev_val:.2f}/s "
                    f"({(best_throughput / prev_val - 1) * 100:+.0f}%)"
                )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"scan-to-map registrations/s/chip ({backend}, "
                f"car_cloud 25k pts, default point-to-plane chain, "
                f"headline = {best_label} serving: CONTINUOUS-BATCHING "
                f"queue Q={Q} lanes={lanes} {queue_throughput:.2f}/s "
                f"~{queue_iters:.0f} iters (median of {mruns}); "
                f"coarse-to-fine queue ({c2f_env}) {c2f_throughput:.2f}/s "
                f"~{c2f_iters:.0f} fine iters, pose parity "
                f"{c2f_parity * 1e3:.1f} mm median; lockstep batch "
                f"{map_batch} blocking {serve_throughput:.2f}/s "
                f"~{serve_iters:.0f} iters, spread [{serve_spread[0]:.2f}, "
                f"{serve_spread[1]:.2f}]/s{regress_note}; "
                f"CPU baseline amortized "
                f"identically, COMPILED C++ kd-tree+p2plane: "
                f"{cpu_time * 1e3:.0f} ms/reg at the same iteration budget; "
                f"convergence-stopped framing: CPU at its own Differential "
                f"stop {cpu_conv_time * 1e3:.0f} ms/reg "
                f"~{cpu_conv_iters:.0f} iters -> {vs_conv:.1f}x; "
                f"scipy/numpy stand-in {cpu_time_py * 1e3:.0f} ms; "
                + (
                    f"AA-ICP serving measured {aa_throughput:.2f}/s "
                    f"~{aa_iters:.0f} iters, pose parity vs plain "
                    f"{aa_parity * 1e3:.1f} mm median; "
                    if aa_throughput > 0 else
                    "AA-ICP sunset from bench scenarios (dominated by the "
                    "c2f queue; PMTPU_BENCH_AA=1 re-measures); "
                )
                + f"one-shot incl. all prep: "
                f"{single_time * 1e3:.0f} ms vs CPU {cpu_single * 1e3:.0f} ms "
                f"({cpu_single / single_time:.1f}x), batched x{batch}: "
                f"{throughput:.2f}/s",
                "value": round(best_throughput, 3),
                "unit": "registrations/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
