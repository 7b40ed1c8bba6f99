"""Chain built programmatically via registrars, no YAML
(reference: examples/icp_customized.cpp)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

import libpointmatcher_tpu as pm


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("reference")
    p.add_argument("reading")
    args = p.parse_args(argv)

    ref = pm.io.load(args.reference)
    data = pm.io.load(args.reading)

    icp = pm.ICP()
    icp.reading_filters = [
        pm.DataPointsFilterRegistrar.create(
            "MinDistDataPointsFilter", {"minDist": "1.0"}
        ),
        pm.DataPointsFilterRegistrar.create(
            "RandomSamplingDataPointsFilter", {"prob": "0.05"}
        ),
    ]
    icp.reference_filters = [
        pm.DataPointsFilterRegistrar.create(
            "MinDistDataPointsFilter", {"minDist": "1.0"}
        ),
        pm.DataPointsFilterRegistrar.create(
            "RandomSamplingDataPointsFilter", {"prob": "0.05"}
        ),
    ]
    icp.matcher = pm.MatcherRegistrar.create(
        "KDTreeMatcher", {"knn": "1", "epsilon": "3.16"}
    )
    icp.outlier_filters = [
        pm.OutlierFilterRegistrar.create(
            "TrimmedDistOutlierFilter", {"ratio": "0.75"}
        )
    ]
    icp.error_minimizer = pm.ErrorMinimizerRegistrar.create(
        "PointToPointErrorMinimizer"
    )
    icp.checkers = [
        pm.TransformationCheckerRegistrar.create(
            "CounterTransformationChecker", {"maxIterationCount": "150"}
        ),
        pm.TransformationCheckerRegistrar.create(
            "DifferentialTransformationChecker",
            {"minDiffRotErr": "0.001", "minDiffTransErr": "0.01",
             "smoothLength": "4"},
        ),
    ]
    icp.inspector = pm.InspectorRegistrar.create("NullInspector")

    T = icp(data, ref)
    aligned = pm.RigidTransformation().compute(data, T)
    pm.io.save(aligned, "test_data_out.vtk")
    print("Final transformation:\n", np.asarray(T))
    return 0


if __name__ == "__main__":
    sys.exit(main())
