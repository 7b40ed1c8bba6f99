"""Run the reference's official solutions over the synthetic ETH protocol
and record the accuracy/throughput artifact (EVAL_r*.json).

This is the honest substitute for the ETH 'Challenging datasets' study
(reference: evaluations/eval_solution.cpp; no egress in this environment —
see tools/synth_eth.py). Both canonical solutions run UNMODIFIED:
Besl92_pt2point.yaml and Chen91_pt2plane.yaml.

Usage: python tools/run_eval_benchmark.py [--out EVAL_r02.json] [--scans 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import numpy as np  # noqa: E402

OFFICIAL = {
    "Besl92_pt2point":
        "/root/reference/evaluations/official_solutions/Besl92_pt2point.yaml",
    "Chen91_pt2plane":
        "/root/reference/evaluations/official_solutions/Chen91_pt2plane.yaml",
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(_REPO, "EVAL_r02.json"))
    p.add_argument("--scans", type=int, default=12)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--data", default="", help="reuse an existing dataset dir")
    a = p.parse_args(argv)

    from synth_eth import SEQUENCES, generate
    from libpointmatcher_tpu.apps.eval_solution import (
        evaluate_protocol, select_ladder, summarize,
    )

    if a.data:
        root = a.data
        protocols = [os.path.join(root, s, "protocol.csv") for s in SEQUENCES]
        protocols = [p_ for p_ in protocols if os.path.exists(p_)]
    else:
        root = tempfile.mkdtemp(prefix="synth_eth_")
        protocols = generate(root, n_scans=a.scans)

    # GLOBAL shape ladder across all sequences: one (or two) compiled
    # programs for the entire multi-sequence sweep instead of one per
    # per-sequence bucket (the round-3 compile cliff: 141x per-pair wall
    # spread across heterogeneous sequences)
    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.cloud import bucket_size
    from libpointmatcher_tpu.io.filelist import load_file_info_vector

    sizes = []
    for proto in protocols:
        for info in load_file_info_vector(proto):
            if info.reference is None:
                continue
            sizes.append((
                bucket_size(pm.io.load(info.reading).num_points),
                bucket_size(pm.io.load(info.reference).num_points),
            ))
    ladder = select_ladder(sizes)
    print(f"global shape ladder: {ladder} over {len(sizes)} pairs",
          flush=True)

    out = {
        "backend": jax.default_backend(),
        "dataset": "synthetic ETH-like (tools/synth_eth.py), "
                   f"{len(protocols)} sequences x {a.scans - 1} pairs",
        "solutions": {},
    }
    for name, yaml_path in OFFICIAL.items():
        seq_results = {}
        all_rows = []
        # untimed warm-up batch: loading the sweep's compiled program from
        # the persistent cache takes seconds and otherwise lands entirely
        # on the first sequence's first chunk (measured: apartment 2.6
        # s/pair warm vs 0.13 for every later sequence)
        evaluate_protocol(protocols[0], yaml_path, batch=a.batch,
                          limit=a.batch, verbose=False, ladder=ladder)
        t0 = time.perf_counter()
        for proto in protocols:
            seq = os.path.basename(os.path.dirname(proto))
            rows = evaluate_protocol(proto, yaml_path, batch=a.batch,
                                     verbose=False, ladder=ladder)
            seq_results[seq] = summarize(rows)
            all_rows.extend(rows)
        wall = time.perf_counter() - t0
        total = summarize(all_rows)
        total["wall_s"] = round(wall, 2)
        total["sweep_registrations_per_s"] = round(len(all_rows) / wall, 2)
        out["solutions"][name] = {
            "overall": total,
            "per_sequence": seq_results,
        }
        print(name, json.dumps(total))
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", a.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
