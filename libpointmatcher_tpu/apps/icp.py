"""Full ICP CLI (reference: examples/icp.cpp): YAML config, initial
transform, output basename, verbose module listing."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import libpointmatcher_tpu as pm


def parse_translation(text: str, dim: int) -> np.ndarray:
    vals = [float(t) for t in text.replace("[", "").replace("]", "").split(",")]
    if len(vals) != dim:
        raise ValueError(f"expected {dim} translation values, got {len(vals)}")
    T = np.eye(dim + 1, dtype=np.float32)
    T[:dim, dim] = vals
    return T


def parse_rotation(text: str, dim: int) -> np.ndarray:
    vals = [float(t) for t in text.replace("[", "").replace("]", "").split(",")]
    if len(vals) != dim * dim:
        raise ValueError(f"expected {dim * dim} rotation values, got {len(vals)}")
    T = np.eye(dim + 1, dtype=np.float32)
    T[:dim, :dim] = np.asarray(vals).reshape(dim, dim)
    return T


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Register a reading cloud onto a reference cloud."
    )
    p.add_argument("reference")
    p.add_argument("reading")
    p.add_argument("--config", help="YAML pipeline configuration file")
    p.add_argument("--output", default="test", help="output file basename")
    p.add_argument("--initTranslation", default=None,
                   help="e.g. [x,y,z] or x,y,z")
    p.add_argument("--initRotation", default=None,
                   help="row-major rotation matrix entries")
    p.add_argument("--isVerbose", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    ref = pm.io.load(args.reference)
    data = pm.io.load(args.reading)
    dim = ref.dim

    icp = pm.ICP()
    if args.config:
        with open(args.config) as f:
            icp.load_from_yaml(f.read())
    else:
        icp.set_default()

    T_init = np.eye(dim + 1, dtype=np.float32)
    if args.initTranslation:
        T_init = T_init @ parse_translation(args.initTranslation, dim)
    if args.initRotation:
        T_init = T_init @ parse_rotation(args.initRotation, dim)

    if args.isVerbose:
        from libpointmatcher_tpu.apps.list_modules import describe_chain

        print(describe_chain(icp))

    T = icp(data, ref, T_init=T_init, seed=args.seed)
    aligned = pm.RigidTransformation().compute(data, T)
    pm.io.save(aligned, f"{args.output}_data_out.vtk")
    pm.io.save(data, f"{args.output}_data_in.vtk")
    pm.io.save(ref, f"{args.output}_ref.vtk")
    print("match ratio:",
          float(icp.last_stats.weighted_point_used_ratio)
          if icp.last_stats else float("nan"))
    print("Final transformation:")
    print(np.asarray(T))
    return 0


if __name__ == "__main__":
    sys.exit(main())
