"""Scaling study: registrations/s as the pair batch is sharded over a mesh.

The BASELINE protocol asks for registrations/s at 1 chip / 1 host / N hosts.
With one physical chip available, this harness demonstrates the scaling
*mechanism* on a virtual device mesh (``--virtual-devices``, CPU) and runs
as-is on a real multi-chip slice: the batch axis of ``register_batch``'s
stacked pair arrays is laid out across the mesh, so each device runs the
fused loop on its share of pairs — the multi-host extension is the same
program over a DCN-spanning mesh.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--virtual-devices", type=int, default=0,
                   help="force N virtual CPU devices (0 = use real devices)")
    p.add_argument("--pairs-per-device", type=int, default=2)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args(argv)

    import os

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.parallel import make_mesh, register_batch

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, size=(args.points, 3)).astype(np.float32)
    shift = np.float32([0.1, -0.05, 0.08])
    reading = pm.PointCloud.from_numpy(src)
    reference = pm.PointCloud.from_numpy(src + shift)

    icp = pm.ICP()
    icp.set_default()
    icp.reading_filters = []

    results = {}
    for ndev in sorted({1, max(1, n_dev // 2), n_dev}):
        mesh = make_mesh(ndev, axis_name="pairs")
        b = args.pairs_per_device * ndev
        readings = [reading] * b
        references = [reference] * b
        # warmup + run
        register_batch(icp, readings, references, seed=0, mesh=mesh)
        t0 = time.perf_counter()
        for i in range(args.runs):
            register_batch(icp, readings, references, seed=i + 1, mesh=mesh)
        dt = (time.perf_counter() - t0) / args.runs
        results[f"{ndev}_devices"] = {
            "pairs": b,
            "registrations_per_s": round(b / dt, 3),
        }
        print(f"{ndev} devices: {b} pairs in {dt * 1e3:.1f} ms "
              f"→ {b / dt:.2f} reg/s", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
