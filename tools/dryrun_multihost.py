"""Multi-HOST (multi-process) validation of the pair-parallel axis.

SURVEY §2.13 names DCN-level data parallelism across hosts; no multi-host
hardware is reachable here, so this simulates it faithfully: TWO OS
processes (jax.distributed + gloo CPU collectives), 4 virtual devices
each, one global 8-device mesh over the pair axis. Each process runs
``register_batch(mesh=global_mesh)`` on the same deterministic batch;
outputs come back replicated (cross-process all-gather) and are asserted
against the single-process result pose by pose.

Reference analogue: the per-core thread sweep of
/root/reference/evaluations/eval_solution.cpp:125-131 — here the workers
are processes with XLA collectives instead of threads with shared memory.

Usage: python tools/dryrun_multihost.py          # parent: spawns 2 procs
Writes MULTIHOST_r05.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROCS = 2
DEVS_PER_PROC = 4
PAIRS = 8
PORT = 29871


def make_pairs():
    """Deterministic synthetic pair batch: identical in every process."""
    import numpy as np

    from libpointmatcher_tpu.cloud import PointCloud
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(42)
    readings, references, T_true = [], [], []
    for _ in range(PAIRS):
        base = rng.uniform(-3, 3, size=(2048, 3)).astype(np.float32)
        # constrain all six DoF: crossed waves + a paraboloid bowl
        base[:, 2] = (
            0.4 * np.sin(1.7 * base[:, 0])
            + 0.4 * np.cos(1.7 * base[:, 1])
            + 0.08 * (base[:, 0] ** 2 + base[:, 1] ** 2)
        )
        base += rng.normal(scale=0.005, size=base.shape).astype(np.float32)
        ang = rng.normal(scale=0.05, size=3)
        R = Rotation.from_rotvec(ang).as_matrix().astype(np.float32)
        t = rng.normal(scale=0.1, size=3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        moved = (base @ R.T + t).astype(np.float32)
        references.append(PointCloud.from_numpy(base))
        readings.append(PointCloud.from_numpy(moved))
        T_true.append(np.linalg.inv(T))
    return readings, references, T_true


def child(pid: int, out_path: str):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROCS,
        process_id=pid,
    )
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, ROOT)
    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.parallel import register_batch

    assert len(jax.devices()) == N_PROCS * DEVS_PER_PROC
    assert jax.process_count() == N_PROCS

    readings, references, T_true = make_pairs()

    def make_icp():
        icp = pm.ICP()
        icp.set_default()
        return icp

    mesh = Mesh(np.asarray(jax.devices()), ("pairs",))
    t0 = time.time()
    T_multi, info = register_batch(
        make_icp(), readings, references, seed=0, mesh=mesh
    )
    dt_multi = time.time() - t0

    # single-process oracle on this process's local devices only
    T_single, _ = register_batch(make_icp(), readings, references, seed=0)

    dT = np.abs(np.asarray(T_multi) - np.asarray(T_single)).max()
    err_t = max(
        float(np.linalg.norm(T_multi[i][:3, 3] - T_true[i][:3, 3]))
        for i in range(PAIRS)
    )
    result = {
        "process": pid,
        "processes": N_PROCS,
        "devices_global": len(jax.devices()),
        "pairs": PAIRS,
        "multi_vs_single_maxdiff": float(dT),
        "trans_err_max_vs_truth": err_t,
        "iterations": [int(x) for x in info["iterations"]],
        "wall_s": dt_multi,
        "ok": bool(dT < 1e-5 and err_t < 0.05),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"proc {pid}: dT={dT:.2e} err_t={err_t:.4f} ok={result['ok']}",
          flush=True)
    sys.exit(0 if result["ok"] else 1)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    tmp = tempfile.mkdtemp()
    outs = [os.path.join(tmp, f"p{i}.json") for i in range(N_PROCS)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             outs[i]],
            env={**os.environ, "PYTHONPATH": ROOT},
        )
        for i in range(N_PROCS)
    ]
    rcs = [p.wait(timeout=1200) for p in procs]
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    ok = all(r["ok"] for r in results) and all(rc == 0 for rc in rcs)
    summary = {
        "benchmark": "multi-host (2-process) pair-parallel registration",
        "backend": "cpu (gloo collectives, 4 virtual devices/process)",
        "ok": ok,
        "results": results,
    }
    path = os.path.join(ROOT, "MULTIHOST_r05.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
