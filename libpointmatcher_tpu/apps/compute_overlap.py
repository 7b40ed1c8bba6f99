"""Pairwise overlap-ratio matrix between all clouds of a list
(reference: examples/compute_overlap.cpp:98-260). For each ordered pair the
clouds are moved to their ground-truth poses (when provided), matched with
the exact NN sweep, and the overlap is the fraction of source points whose
nearest neighbor lies within the combined sensor-noise bound."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.io.filelist import load_file_info_vector
from libpointmatcher_tpu.ops.knn import knn_brute_force


def overlap_ratio(src: pm.PointCloud, dst: pm.PointCloud,
                  default_noise: float = 0.1) -> float:
    d2, ids = knn_brute_force(src.points, src.mask, dst.points, dst.mask, k=1)
    d = np.sqrt(np.maximum(np.asarray(d2)[:, 0], 0.0))
    valid = np.isfinite(d)
    noise = np.full(len(d), default_noise)
    if src.has_descriptor("simpleSensorNoise"):
        noise = np.asarray(src.get_descriptor("simpleSensorNoise"))[:, 0]
    hits = np.logical_and(valid, d < noise)
    n = max(int(valid.sum()), 1)
    return float(hits.sum()) / n


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Compute the pairwise overlap matrix of a cloud list."
    )
    p.add_argument("file_list")
    p.add_argument("--noise", type=float, default=0.1,
                   help="acceptance distance when no simpleSensorNoise "
                   "descriptor is present")
    p.add_argument("--output", default="overlap.csv")
    args = p.parse_args(argv)

    infos = load_file_info_vector(args.file_list)
    rigid = pm.RigidTransformation()
    clouds = []
    for info in infos:
        c = pm.io.load(info.reading)
        if info.ground_truth_transformation is not None:
            c = rigid.compute(
                c, np.asarray(info.ground_truth_transformation, np.float32)
            )
        clouds.append(c)

    n = len(clouds)
    M = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            M[i, j] = (
                1.0 if i == j
                else overlap_ratio(clouds[i], clouds[j], args.noise)
            )
            print(f"overlap[{i}→{j}] = {M[i, j]:.3f}")
    np.savetxt(args.output, M, delimiter=",", fmt="%.6f")
    print(f"overlap matrix saved to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
