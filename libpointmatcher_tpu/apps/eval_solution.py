"""ETH 'Challenging datasets' evaluation protocol runner
(reference: evaluations/eval_solution.cpp).

The reference downloads the six sequences (apartment, ETH hauptgebaude,
plain, stairs, gazebo winter, wood summer) and runs a YAML solution over all
protocol pairs with one thread per core
(reference: eval_solution.cpp:125-131 — one EvaluationModule per coreId).
This environment has no network egress, so the datasets must already be on
disk (``--data-root``); the per-pair sweep — the reference's thread-per-core
loop — maps to pair-parallel batching on device: pairs are grouped by
padded-shape bucket and each group runs one vmapped fixed-point loop
(:func:`..parallel.batch.register_batch`), so an N-pair sweep issues
~N/batch device programs instead of N. ``--batch 1`` recovers the
sequential per-pair path (used by tests to cross-check the two drivers).

Protocol CSV format: the standard ``local_frame`` validation files with
``reading``/``reference`` cloud names and iTxy initial + gTxy ground-truth
transforms (parsed by :mod:`..io.filelist`)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.errors import ConvergenceError
from libpointmatcher_tpu.io.filelist import load_file_info_vector

SEQUENCES = [
    "apartment", "eth", "plain", "stairs", "gazebo", "wood",
]


def pose_errors(T_est: np.ndarray, T_gt: np.ndarray):
    """Translation [m] and rotation [rad] error of T_est vs ground truth."""
    d = T_est.shape[0] - 1
    dT = np.linalg.inv(T_gt) @ T_est
    trans_err = float(np.linalg.norm(dT[:d, d]))
    R = dT[:d, :d]
    if d == 3:
        ang = float(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
    else:
        ang = float(abs(np.arctan2(R[1, 0], R[0, 0])))
    return trans_err, ang


_CODE_MESSAGES = {
    2: "abs rotation/translation norm not a number",
    3: "transformation bound exceeded (BoundTransformationChecker)",
    4: "ErrorMinimizer: no point to minimize",
}


def _finish_row(i, info, T, wall, iterations, err, verbose=True):
    row = {
        "pair": i,
        "reading": os.path.basename(info.reading),
        "reference": os.path.basename(info.reference),
        "T": np.asarray(T).tolist(),
        "time_s": wall,
        "iterations": int(iterations),
        "error": err,
    }
    if info.ground_truth_transformation is not None:
        te, re_ = pose_errors(
            np.asarray(T), np.asarray(info.ground_truth_transformation)
        )
        row["trans_err"] = te
        row["rot_err"] = re_
    if verbose:
        print(
            f"[{i + 1}] {row['reading']}→{row['reference']} {wall:.3f}s"
            + (f" terr={row.get('trans_err', float('nan')):.4f}"
               f" rerr={row.get('rot_err', float('nan')):.4f}"
               if "trans_err" in row else "")
        )
    return row


def select_ladder(sizes):
    """Choose at most TWO (rows_reading, rows_reference) padded-shape
    ladder steps covering every pair, minimizing total padded cells (each
    distinct shape is a separate minutes-scale relay compile — round 3's
    per-pair buckets produced a 141x per-pair wall spread, EVAL_r03).
    ``sizes``: iterable of (reading_bucket, reference_bucket). Returns an
    ascending list of 1-2 (cap_r, cap_f) steps; the last covers all."""
    sized = sorted((br * bf, br, bf) for br, bf in sizes)
    if not sized:
        return []

    def cost(members):
        if not members:
            return 0, (0, 0)
        cr = max(s[1] for s in members)
        cf = max(s[2] for s in members)
        return cr * cf * len(members), (cr, cf)

    best = None
    stride = max(1, len(sized) // 16)
    for split in range(0, len(sized) + 1, stride):
        lo, hi = sized[:split], sized[split:]
        c1, cap1 = cost(lo)
        c2, cap2 = cost(hi)
        n_groups = int(bool(lo)) + int(bool(hi))
        key = (c1 + c2, n_groups)
        if best is None or key < best[0]:
            best = (key, [cap for cap, m in ((cap1, lo), (cap2, hi)) if m])
    return best[1]


def evaluate_protocol(protocol_csv: str, config_yaml: str, data_path: str = "",
                      limit: int = 0, seed: int = 0, batch: int = 8,
                      verbose: bool = True, ladder=None):
    infos = load_file_info_vector(protocol_csv, data_path=data_path)
    if limit:
        infos = infos[:limit]
    with open(config_yaml) as f:
        yaml_text = f.read()
    # ONE engine for the whole sweep: the fused loop compiles once per
    # shape bucket and is reused across pairs (per-run module state is
    # re-initialized inside compute; a fresh ICP per pair would discard the
    # jit cache and re-trace every pair)
    icp = pm.ICP()
    icp.load_from_yaml(yaml_text)

    cache = {}

    def cloud(path):
        c = cache.get(path)
        if c is None:
            c = cache[path] = pm.io.load(path)
        return c

    pairs = [(i, info) for i, info in enumerate(infos)
             if info.reference is not None]

    if batch <= 1:
        return _evaluate_sequential(icp, pairs, cloud, seed, verbose)

    from ..cloud import bucket_size
    from ..parallel import register_batch

    # AT MOST TWO padded-shape ladder steps (see select_ladder; a caller
    # sweeping several protocols passes a GLOBAL ladder so the entire
    # sweep shares its compiled programs). Every pair is floored to its
    # step, and partial tail chunks are padded to the full batch by
    # repeating pairs, so the sweep compiles at most two programs.
    sized = []
    for i, info in pairs:
        br = bucket_size(cloud(info.reading).num_points)
        bf = bucket_size(cloud(info.reference).num_points)
        sized.append((br, bf, i, info))
    if ladder is None:
        ladder = select_ladder([(br, bf) for br, bf, _, _ in sized])
    groups = []
    for cap_r, cap_f in ladder:
        members = [
            s for s in sized if s[0] <= cap_r and s[1] <= cap_f
        ]
        sized = [s for s in sized if not (s[0] <= cap_r and s[1] <= cap_f)]
        if members:
            groups.append((members, (cap_r, cap_f)))
    for s in sized:  # pairs above every ladder step: own bucket (rare —
        groups.append(([s], (s[0], s[1])))  # only with a stale ladder)

    results = []
    for members, (cap_r, cap_f) in groups:
        for off in range(0, len(members), batch):
            chunk = [(s[2], s[3]) for s in members[off: off + batch]]
            n_real = len(chunk)
            # keep the batch axis static: repeat pairs to fill the tail
            # (a smaller final batch would be a third compiled program)
            while len(chunk) < batch:
                chunk.append(chunk[-1])
            readings = [cloud(info.reading) for _, info in chunk]
            references = [cloud(info.reference) for _, info in chunk]
            T_inits = [
                np.asarray(info.initial_transformation, np.float32)
                if info.initial_transformation is not None
                else np.eye(readings[0].dim + 1, dtype=np.float32)
                for _, info in chunk
            ]
            t0 = time.perf_counter()
            T_b, binfo = register_batch(
                icp, readings, references, T_inits=T_inits,
                seed=seed + chunk[0][0],
                min_rows_reading=cap_r, min_rows_reference=cap_f,
            )
            wall = (time.perf_counter() - t0) / n_real
            for b, (i, info) in enumerate(chunk[:n_real]):
                code = int(binfo["codes"][b])
                err = _CODE_MESSAGES.get(code)
                T = T_b[b] if err is None else np.eye(readings[0].dim + 1)
                results.append(_finish_row(
                    i, info, T, wall, binfo["iterations"][b], err, verbose
                ))
    results.sort(key=lambda r: r["pair"])
    return results


def _evaluate_sequential(icp, pairs, cloud, seed, verbose):
    """Per-pair driver (--batch 1): one device program per registration."""
    results = []
    for i, info in pairs:
        reading = cloud(info.reading)
        reference = cloud(info.reference)
        T_init = (
            np.asarray(info.initial_transformation, np.float32)
            if info.initial_transformation is not None else None
        )
        t0 = time.perf_counter()
        try:
            T = np.asarray(icp(reading, reference, T_init=T_init,
                               seed=seed + i))
            err = None
        except ConvergenceError as e:
            T = np.eye(reading.dim + 1)
            err = str(e)
        wall = time.perf_counter() - t0
        results.append(_finish_row(
            i, info, T, wall, icp.last_iteration_count, err, verbose
        ))
    return results


def summarize(results):
    te = [r["trans_err"] for r in results if "trans_err" in r]
    re_ = [r["rot_err"] for r in results if "rot_err" in r]
    ts = [r["time_s"] for r in results]
    out = {
        "pairs": len(results),
        "failed": sum(1 for r in results if r["error"]),
        "mean_time_s": float(np.mean(ts)) if ts else None,
        "registrations_per_s": float(1.0 / np.mean(ts)) if ts else None,
    }
    if te:
        out.update(
            median_trans_err=float(np.median(te)),
            p95_trans_err=float(np.quantile(te, 0.95)),
            median_rot_err=float(np.median(re_)),
            p95_rot_err=float(np.quantile(re_, 0.95)),
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Run a YAML solution over an evaluation protocol."
    )
    p.add_argument("protocol", help="protocol CSV (reading/reference/iT/gT)")
    p.add_argument("config", help="solution YAML "
                   "(e.g. the reference's official_solutions/*.yaml)")
    p.add_argument("--data-root", default="", help="directory of the clouds")
    p.add_argument("--limit", type=int, default=0, help="max pairs (0 = all)")
    p.add_argument("--batch", type=int, default=8,
                   help="pairs per vmapped device program (1 = sequential)")
    p.add_argument("--output", default="eval_results.json")
    args = p.parse_args(argv)

    results = evaluate_protocol(
        args.protocol, args.config, args.data_root, args.limit,
        batch=args.batch,
    )
    summary = summarize(results)
    with open(args.output, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
