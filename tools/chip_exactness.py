"""On-chip exactness validation of the Pallas matcher kernels.

The CPU test suite exercises the XLA fallbacks; the fused Pallas kernels
only run on real TPU backends (ops/dispatch.use_pallas). This tool is the
on-chip counterpart of tests/test_matchers.py's exactness contracts:

- BlockGridMatcher (tile sweep) knn=1 and knn=4 against the brute-force
  sweep with the same maxDist — bit-exact distances and ids required;
- the vmapped (batched-serving) form of the tile 1-NN against the
  single-scan form — bit-identical required (regression for the round-3
  scoped-vmem OOM: the batched form previously failed to compile at all);
- knn1_pallas / knnk_pallas against a float64 numpy oracle.

Exits non-zero on any violation. Usage: python tools/chip_exactness.py
"""

from __future__ import annotations

import os
import sys
import time

import jax

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpointmatcher_tpu.cloud import PointCloud  # noqa: E402
from libpointmatcher_tpu.matchers import MatcherRegistrar  # noqa: E402
from libpointmatcher_tpu.ops.knn import knn_brute_force  # noqa: E402
from libpointmatcher_tpu.ops.knn_pallas import (  # noqa: E402
    knn1_pallas, knnk_pallas)
from libpointmatcher_tpu.ops.tilesweep import (  # noqa: E402
    tile_nn1_from_candidates)

FAILED = []


def check(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    if not ok:
        FAILED.append(name)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    M, N = 30000, 20000
    ref = rng.uniform(0, 20, (M, 3)).astype(np.float32)
    q = rng.uniform(0, 20, (N, 3)).astype(np.float32)
    refc = PointCloud.from_numpy(ref)
    qc = PointCloud.from_numpy(q)

    # ---- dense Pallas kernels vs float64 oracle (sampled rows)
    sel = rng.choice(N, 512, replace=False)
    d64 = ((q[sel, None, :].astype(np.float64)
            - ref[None, :, :].astype(np.float64)) ** 2).sum(-1)
    oracle_i = np.argsort(d64, axis=1)[:, :4]
    oracle_d = np.sort(d64, axis=1)[:, :4]

    d1, i1 = jax.device_get(
        knn1_pallas(qc.points, qc.mask, refc.points, refc.mask)
    )
    nd = qc.num_points
    check("knn1_pallas ids == f64 oracle",
          bool((i1[:nd][sel] == oracle_i[:, 0]).all()))
    check("knn1_pallas dists ~ f64 oracle (<=2e-6 rel)",
          bool(np.max(np.abs(d1[:nd][sel] - oracle_d[:, 0])
                      / np.maximum(oracle_d[:, 0], 1e-9)) <= 2e-6))
    dk, ik = jax.device_get(
        knnk_pallas(qc.points, qc.mask, refc.points, refc.mask, 4)
    )
    check("knnk_pallas(k=4) ids == f64 oracle",
          bool((ik[:nd][sel] == oracle_i).all()))

    # ---- tile sweep vs brute force, exact bounded-radius contract
    for knn, md in ((1, 0.6), (4, 0.8)):
        m = MatcherRegistrar.create("BlockGridMatcher", {
            "knn": str(knn), "maxDist": str(md), "motionBound": "0.0",
            "tileQueries": "64", "blockCap": "1024"})
        m.init(refc)
        aux = m.prepare_loop(qc)
        mt = m.find_closests_in(qc, refc, aux=aux)
        d_t, i_t = jax.device_get((mt.dists, mt.ids))
        db, ib = knn_brute_force(qc.points, qc.mask, refc.points,
                                 refc.mask, k=knn)
        keep = db <= np.float32(md) ** 2
        db = jnp.where(keep, db, jnp.inf)
        ib = jnp.where(keep, ib, -1)
        db, ib = jax.device_get((db, ib))
        ok_d = np.array_equal(np.where(np.isfinite(d_t[:nd]), d_t[:nd], -1),
                              np.where(np.isfinite(db[:nd]), db[:nd], -1))
        ok_i = np.array_equal(i_t[:nd], ib[:nd])
        check(f"tile sweep knn={knn} maxDist={md} bit-exact vs brute",
              ok_d and ok_i)

    # ---- vmapped (batched serving) form == single-scan form
    m = MatcherRegistrar.create("BlockGridMatcher", {
        "knn": "1", "maxDist": "0.6", "motionBound": "0.0",
        "tileQueries": "256", "blockCap": "1024"})
    m.init(refc)
    from libpointmatcher_tpu.matchers import tile_aux_to_device
    per = tile_aux_to_device(*m.prepare_loop_host(np.asarray(q), np.ones(N, bool)))
    B = 8
    qb = jnp.stack([qc.points + 0.001 * b for b in range(B)])
    mb = jnp.stack([qc.mask] * B)

    def one(pts, mask):
        return tile_nn1_from_candidates(
            pts, mask, per["q_rows"], per["cand_t"], per["pen"], per["cid"],
            0.6, parent=per["parent"], vrows=per["vrows"])

    t0 = time.perf_counter()
    dv, iv = jax.block_until_ready(jax.jit(jax.vmap(one))(qb, mb))
    print(f"  vmapped x{B} compile+run: {time.perf_counter() - t0:.1f}s")
    d0, i0 = jax.device_get((dv[0], iv[0]))
    db, ib = jax.device_get(one(qc.points, qc.mask))
    check("vmapped tile sweep == single-scan (bit-identical)",
          np.array_equal(d0, db) and np.array_equal(i0, ib))

    if FAILED:
        print(f"{len(FAILED)} FAILED: {FAILED}")
        return 1
    print("all on-chip exactness checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
