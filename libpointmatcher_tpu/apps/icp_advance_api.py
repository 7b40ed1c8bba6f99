"""Advanced-API demo: introspection of match ratio, manual matcher reuse,
residual computation (reference: examples/icp_advance_api.cpp:140-204)."""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

import libpointmatcher_tpu as pm
from libpointmatcher_tpu.filters.base import apply_filter_chain
from libpointmatcher_tpu.outlierfilters import (
    compute_outlier_weights,
    init_outlier_states,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("reference")
    p.add_argument("reading")
    p.add_argument("--config")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    ref = pm.io.load(args.reference)
    data = pm.io.load(args.reading)

    icp = pm.ICP()
    if args.config:
        with open(args.config) as f:
            icp.load_from_yaml(f.read())
    else:
        icp.set_default()

    T = icp(data, ref, seed=args.seed)
    print("Final transformation:\n", np.asarray(T))
    print("max iterations reached:", icp.get_max_num_iterations_reached())
    print("prefiltered reading points:", icp.get_prefiltered_reading_pts_count())
    print("prefiltered reference points:", icp.get_prefiltered_reference_pts_count())
    print("point used ratio:", float(icp.last_stats.point_used_ratio))
    print("weighted point used ratio (overlap est.):",
          float(icp.last_stats.weighted_point_used_ratio))

    # ---- manual matcher reuse: residual at the final pose
    key = jax.random.PRNGKey(args.seed)
    ref_f = apply_filter_chain(icp.reference_filters, ref,
                               jax.random.fold_in(key, 1))
    data_f = apply_filter_chain(icp.reading_filters, data,
                                jax.random.fold_in(key, 2))
    icp.matcher.init(ref_f)
    rigid = pm.RigidTransformation()
    moved = rigid.compute(data_f, jax.numpy.asarray(T))
    matches = icp.matcher.find_closests(moved)
    weights, _ = compute_outlier_weights(
        tuple(icp.outlier_filters), moved, ref_f, matches,
        init_outlier_states(icp.outlier_filters),
    )
    residual = icp.error_minimizer.residual_error(moved, ref_f, weights, matches)
    print("residual error at final pose:", float(residual))
    valid = np.isfinite(np.asarray(matches.dists))
    print("match ratio:", float(valid.mean()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
