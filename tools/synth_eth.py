"""Synthetic ETH-like evaluation sequences.

The reference's accuracy protocol runs its official solutions over the six
ETH "Challenging datasets" sequences (reference:
evaluations/eval_solution.cpp:93-112); this environment has no network
egress, so this module generates the honest substitute: multi-sequence
indoor/outdoor-like scenes (walls, floors, stairs, pillars, clutter),
a pose trajectory per sequence, range-noised scans in SENSOR frame, and a
protocol CSV per sequence with perturbed initial transforms (iT) and exact
ground truth (gT) in the reference's validation-file format
(reference: IO.cpp:179-351).

Usage: python tools/synth_eth.py OUTDIR [--scans 12] [--seqs all]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _plane(rng, origin, u, v, nu, nv, density):
    """Sample a quad patch: origin + a*u + b*v, a∈[0,nu], b∈[0,nv]."""
    n = max(int(nu * nv * density), 1)
    a = rng.uniform(0, nu, n)
    b = rng.uniform(0, nv, n)
    u = np.asarray(u, float)
    v = np.asarray(v, float)
    return np.asarray(origin, float) + a[:, None] * u + b[:, None] * v


def _box(rng, center, size, density):
    cx, cy, cz = center
    sx, sy, sz = size
    faces = []
    o = np.array([cx - sx / 2, cy - sy / 2, cz - sz / 2])
    faces.append(_plane(rng, o, [1, 0, 0], [0, 1, 0], sx, sy, density))
    faces.append(_plane(rng, o + [0, 0, sz], [1, 0, 0], [0, 1, 0], sx, sy, density))
    faces.append(_plane(rng, o, [1, 0, 0], [0, 0, 1], sx, sz, density))
    faces.append(_plane(rng, o + [0, sy, 0], [1, 0, 0], [0, 0, 1], sx, sz, density))
    faces.append(_plane(rng, o, [0, 1, 0], [0, 0, 1], sy, sz, density))
    faces.append(_plane(rng, o + [sx, 0, 0], [0, 1, 0], [0, 0, 1], sy, sz, density))
    return np.concatenate(faces)


def make_world(kind: str, rng) -> np.ndarray:
    d = 220.0  # points per m^2
    parts = []
    if kind in ("apartment", "office"):
        W, L, H = 12.0, 9.0, 2.6
        parts.append(_plane(rng, [0, 0, 0], [1, 0, 0], [0, 1, 0], W, L, d))
        parts.append(_plane(rng, [0, 0, H], [1, 0, 0], [0, 1, 0], W, L, d / 2))
        for o, u, nu in ([[0, 0, 0], [1, 0, 0], W], [[0, L, 0], [1, 0, 0], W],
                         [[0, 0, 0], [0, 1, 0], L], [[W, 0, 0], [0, 1, 0], L]):
            parts.append(_plane(rng, o, u, [0, 0, 1], nu, H, d))
        # inner wall with a doorway
        parts.append(_plane(rng, [W / 2, 0, 0], [0, 1, 0], [0, 0, 1],
                            L * 0.4, H, d))
        parts.append(_plane(rng, [W / 2, L * 0.6, 0], [0, 1, 0], [0, 0, 1],
                            L * 0.4, H, d))
        nbox = 8 if kind == "apartment" else 14
        for _ in range(nbox):
            c = [rng.uniform(1, W - 1), rng.uniform(1, L - 1),
                 rng.uniform(0.3, 0.9)]
            s = rng.uniform(0.4, 1.6, 3)
            parts.append(_box(rng, c, s, d))
    elif kind == "stairs":
        W = 3.0
        for i in range(14):
            z = i * 0.18
            y = i * 0.28
            parts.append(_plane(rng, [0, y, z], [1, 0, 0], [0, 1, 0],
                                W, 0.28, 3 * d))
            parts.append(_plane(rng, [0, y + 0.28, z], [1, 0, 0], [0, 0, 1],
                                W, 0.18, 3 * d))
        for x in (0.0, W):
            parts.append(_plane(rng, [x, 0, 0], [0, 1, 0], [0, 0, 1],
                                4.5, 3.4, d))
    elif kind in ("gazebo", "wood"):
        S = 18.0
        parts.append(_plane(rng, [-S / 2, -S / 2, 0], [1, 0, 0], [0, 1, 0],
                            S, S, d / 3))
        npil = 10 if kind == "gazebo" else 26
        for _ in range(npil):
            x, y = rng.uniform(-S / 2 + 1, S / 2 - 1, 2)
            r = rng.uniform(0.08, 0.35)
            h = rng.uniform(2.0, 5.0)
            m = int(2 * np.pi * r * h * d)
            th = rng.uniform(0, 2 * np.pi, m)
            z = rng.uniform(0, h, m)
            parts.append(np.stack(
                [x + r * np.cos(th), y + r * np.sin(th), z], 1))
    elif kind == "plain":
        S = 22.0
        # gently rolling terrain + a few rocks
        n = int(S * S * d / 3)
        xy = rng.uniform(-S / 2, S / 2, (n, 2))
        z = 0.4 * np.sin(xy[:, 0] * 0.5) * np.cos(xy[:, 1] * 0.4) \
            + 0.05 * rng.standard_normal(n)
        parts.append(np.concatenate([xy, z[:, None]], 1))
        for _ in range(6):
            c = [*rng.uniform(-S / 2 + 2, S / 2 - 2, 2), 0.3]
            parts.append(_box(rng, c, rng.uniform(0.3, 1.0, 3), d))
    else:  # "hauptgebaude": long corridor with columns
        W, L, H = 6.0, 30.0, 5.0
        parts.append(_plane(rng, [0, 0, 0], [1, 0, 0], [0, 1, 0], W, L, d / 2))
        for x in (0.0, W):
            parts.append(_plane(rng, [x, 0, 0], [0, 1, 0], [0, 0, 1], L, H, d / 2))
        for i in range(8):
            parts.append(_box(rng, [W / 2, 2.5 + i * 3.5, H / 2],
                              [0.5, 0.5, H], d))
    return np.concatenate(parts).astype(np.float64)


def _yaw(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1.0]])


def make_trajectory(kind: str, world, n_scans, rng):
    """Poses P_i (sensor→world, 4x4) walking through the scene."""
    lo, hi = world.min(0), world.max(0)
    c = (lo + hi) / 2
    poses = []
    ang = rng.uniform(0, 2 * np.pi)
    pos = c + [0, 0, 0]
    pos[2] = lo[2] + 1.3  # sensor height
    for i in range(n_scans):
        P = np.eye(4)
        P[:3, :3] = _yaw(ang)
        P[:3, 3] = pos
        poses.append(P)
        ang += rng.uniform(-0.25, 0.25)
        step = rng.uniform(0.15, 0.45)
        pos = pos + _yaw(ang)[:, 0] * step
        # stay inside the scene footprint
        pos[0] = np.clip(pos[0], lo[0] + 1, hi[0] - 1)
        pos[1] = np.clip(pos[1], lo[1] + 1, hi[1] - 1)
    return poses


def make_scan(world, P, rng, max_range=15.0, target=20000):
    """Range-limited, range-noised scan in SENSOR frame."""
    Pinv = np.linalg.inv(P)
    local = world @ Pinv[:3, :3].T + Pinv[:3, 3]
    r = np.linalg.norm(local, axis=1)
    vis = (r > 0.7) & (r < max_range)
    local = local[vis]
    r = r[vis]
    if len(local) > target:
        sel = rng.choice(len(local), target, replace=False)
        local, r = local[sel], r[sel]
    # range-proportional noise along the ray + isotropic jitter
    unit = local / r[:, None]
    noise = (rng.standard_normal(len(local)) * (0.005 + 0.002 * r))[:, None]
    local = local + unit * noise + 0.002 * rng.standard_normal(local.shape)
    return local.astype(np.float32)


def _perturb(rng, trans_sigma=0.08, rot_sigma=0.03):
    dT = np.eye(4)
    w = rng.standard_normal(3) * rot_sigma
    th = np.linalg.norm(w)
    if th > 1e-12:
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        dT[:3, :3] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    dT[:3, 3] = rng.standard_normal(3) * trans_sigma
    return dT


SEQUENCES = ["apartment", "hauptgebaude", "stairs", "gazebo", "wood", "plain"]


def generate(outdir: str, n_scans: int = 12, seqs=None, seed: int = 0):
    seqs = seqs or SEQUENCES
    os.makedirs(outdir, exist_ok=True)
    protocols = []
    for si, kind in enumerate(seqs):
        rng = np.random.default_rng(seed * 1000 + si)
        sdir = os.path.join(outdir, kind)
        os.makedirs(sdir, exist_ok=True)
        world = make_world(kind, rng)
        poses = make_trajectory(kind, world, n_scans, rng)
        names = []
        for i, P in enumerate(poses):
            scan = make_scan(world, P, rng)
            name = f"scan_{i:03d}.csv"
            names.append(name)
            with open(os.path.join(sdir, name), "w") as f:
                f.write("x,y,z\n")
                np.savetxt(f, scan, fmt="%.5f", delimiter=",")
        # protocol: consecutive pairs, reading i -> reference i-1
        hdr = (["reading", "reference"]
               + [f"iT{i}{j}" for i in range(4) for j in range(4)]
               + [f"gT{i}{j}" for i in range(4) for j in range(4)])
        rows = []
        for i in range(1, len(poses)):
            gT = np.linalg.inv(poses[i - 1]) @ poses[i]
            iT = _perturb(rng) @ gT
            rows.append([names[i], names[i - 1]]
                        + [f"{v:.9f}" for v in iT.reshape(-1)]
                        + [f"{v:.9f}" for v in gT.reshape(-1)])
        proto = os.path.join(sdir, "protocol.csv")
        with open(proto, "w") as f:
            f.write(", ".join(hdr) + "\n")
            for r in rows:
                f.write(", ".join(r) + "\n")
        protocols.append(proto)
        print(f"{kind}: {len(world)} world pts, {n_scans} scans, "
              f"{len(rows)} pairs -> {proto}")
    return protocols


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--scans", type=int, default=12)
    p.add_argument("--seqs", default="all")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    seqs = SEQUENCES if a.seqs == "all" else a.seqs.split(",")
    generate(a.outdir, a.scans, seqs, a.seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
