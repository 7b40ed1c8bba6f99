"""Minimal ICP: load two clouds, default chain, print T
(reference: examples/icp_simple.cpp)."""

from __future__ import annotations

import sys

import numpy as np

import libpointmatcher_tpu as pm


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(
            "Error in command line, usage: icp_simple "
            "reference.csv reading.csv",
            file=sys.stderr,
        )
        return 1
    ref = pm.io.load(argv[0])
    data = pm.io.load(argv[1])
    icp = pm.ICP()
    icp.set_default()
    T = icp(data, ref)
    aligned = pm.RigidTransformation().compute(data, T)
    pm.io.save(aligned, "test_data_out.vtk")
    pm.io.save(data, "test_data_in.vtk")
    pm.io.save(ref, "test_ref.vtk")
    print("Final transformation:")
    print(np.asarray(T))
    return 0


if __name__ == "__main__":
    sys.exit(main())
