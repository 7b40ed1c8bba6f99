"""Timing harness for data filters (reference: examples/filterProfiler.cpp)."""

from __future__ import annotations

import argparse
import sys
import time

import jax

import libpointmatcher_tpu as pm


def main(argv=None):
    p = argparse.ArgumentParser(description="Profile a data filter.")
    p.add_argument("cloud")
    p.add_argument("--filter", default="SurfaceNormalDataPointsFilter")
    p.add_argument("--param", action="append", default=[],
                   help="name=value, repeatable")
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args(argv)

    params = dict(kv.split("=", 1) for kv in args.param)
    cloud = pm.io.load(args.cloud)
    f = pm.DataPointsFilterRegistrar.create(args.filter, params)
    key = jax.random.PRNGKey(0)

    # warmup (compile)
    out = f.filter(cloud, key=key)
    out.count_host()
    times = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        out = f.filter(cloud, key=jax.random.fold_in(key, i))
        out.count_host()
        times.append(time.perf_counter() - t0)
    n_in = cloud.count_host()
    n_out = out.count_host()
    print(
        f"{args.filter}: {n_in} → {n_out} pts, "
        f"mean {1e3 * sum(times) / len(times):.2f} ms "
        f"(min {1e3 * min(times):.2f}, max {1e3 * max(times):.2f}) "
        f"over {args.runs} runs"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
