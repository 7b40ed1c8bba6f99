"""End-to-end system demo: trajectory generation → scan-to-map odometry →
pose-graph refinement → evaluation.

The ETH evaluation datasets are not available in this environment, so this
harness synthesizes a measurable stand-in from any seed cloud: a trajectory
of partially-overlapping scans with known ground-truth poses and sensor
noise. It then runs the full production stack — ICPSequence odometry with
priors, relative-pose constraint collection, distributed-Gauss-Newton
pose-graph refinement with a loop closure — and reports absolute trajectory
error before and after refinement.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def rotz(a):
    return np.array(
        [[np.cos(a), -np.sin(a), 0.0], [np.sin(a), np.cos(a), 0.0],
         [0.0, 0.0, 1.0]], np.float32,
    )


def make_trajectory(seed_cloud, n_scans, noise, rng):
    """Ground-truth poses on an arc + per-scan visibility crops + noise."""
    import libpointmatcher_tpu as pm

    pts, _, _ = seed_cloud.to_numpy()
    center = pts.mean(axis=0)
    gt = []
    scans = []
    for k in range(n_scans):
        a = 0.06 * k
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = rotz(a)
        T[:3, 3] = center + np.float32([0.15 * k, 0.05 * k, 0.0]) - rotz(a) @ center
        gt.append(T)
        # scan = world points visible from this pose (a moving half-space
        # crop for partial overlap), expressed in the sensor frame
        Tinv = np.linalg.inv(T)
        local = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        keep = local[:, 0] > np.quantile(local[:, 0], 0.25)
        scan = local[keep] + rng.normal(scale=noise, size=(keep.sum(), 3)).astype(np.float32)
        scans.append(pm.PointCloud.from_numpy(scan.astype(np.float32)))
    return gt, scans


def ate(poses, gt):
    return float(np.sqrt(np.mean([
        np.linalg.norm(np.asarray(p)[:3, 3] - g[:3, 3]) ** 2
        for p, g in zip(poses, gt)
    ])))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cloud", default="/root/reference/examples/data/car_cloud400.csv")
    p.add_argument("--scans", type=int, default=6)
    p.add_argument("--noise", type=float, default=0.005)
    p.add_argument("--decimate", type=int, default=4)
    p.add_argument("--odometry-noise", type=float, default=0.02,
                   help="perturbation injected into odometry estimates to "
                   "give the pose graph something to correct")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.parallel.posegraph import (
        edges_from_numpy, optimize_pose_graph,
    )

    rng = np.random.default_rng(args.seed)
    seed_cloud = pm.io.load(args.cloud)
    if args.decimate > 1:
        pts, descs, times = seed_cloud.to_numpy()
        seed_cloud = pm.PointCloud.from_numpy(pts[::args.decimate])
    gt, scans = make_trajectory(seed_cloud, args.scans, args.noise, rng)

    # ---- scan-to-map odometry with priors (the reference's align_sequence
    # pattern, ICPSequence amortizing map prep)
    seq = pm.ICPSequence()
    seq.set_default()
    seq.acceleration = "anderson"
    seq.set_map(scans[0], seed=args.seed)
    poses = [np.eye(4, dtype=np.float32) @ gt[0]]
    print(f"[0] map seeded ({scans[0].count_host()} pts)")
    for k in range(1, args.scans):
        prior = poses[-1]
        T = np.asarray(seq(scans[k], T_init=prior, seed=args.seed + k))
        poses.append(T)
        te = np.linalg.norm(T[:3, 3] - gt[k][:3, 3])
        print(f"[{k}] odometry terr={te:.4f} iters={seq.last_iteration_count}")

    # inject drift so refinement has work to do
    noisy = [poses[0]]
    for k in range(1, args.scans):
        P = poses[k].copy()
        P[:3, :3] = P[:3, :3] @ rotz(rng.normal(scale=args.odometry_noise))
        P[:3, 3] += rng.normal(scale=args.odometry_noise, size=3)
        noisy.append(P)

    ate_before = ate(noisy, gt)

    # ---- pose graph: consecutive odometry constraints + one loop closure
    # (first↔last registered directly)
    ii, jj, Ts = [], [], []
    for k in range(args.scans - 1):
        ii.append(k); jj.append(k + 1)
        Ts.append(np.linalg.inv(poses[k]) @ poses[k + 1])
    icp = pm.ICP()
    icp.set_default()
    T_loop = np.asarray(
        icp(scans[-1], scans[0],
            T_init=np.linalg.inv(gt[0]) @ noisy[-1], seed=args.seed)
    )
    ii.append(0); jj.append(args.scans - 1)
    Ts.append(T_loop)
    edges = edges_from_numpy(ii, jj, np.stack(Ts))
    refined, final_res = optimize_pose_graph(
        np.stack(noisy), edges, gn_iters=10, cg_iters=30
    )
    ate_after = ate(list(np.asarray(refined)), gt)

    out = {
        "scans": args.scans,
        "ate_odometry_noisy": round(ate_before, 5),
        "ate_refined": round(ate_after, 5),
        "posegraph_residual": round(float(final_res), 6),
    }
    print(json.dumps(out))
    return 0 if ate_after <= ate_before else 1


if __name__ == "__main__":
    sys.exit(main())
