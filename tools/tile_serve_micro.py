"""Isolate the per-iteration cost of the tile matcher at the REAL serving
shape (car pair, default chain, BlockGridMatcher assignment), vmapped x8.

Stages timed (dependent-chain timing, 10 reps inside one jit):
  sweep   — the Pallas kernel alone
  +gather — q = points[q_rows] assembly before the kernel
  +merge  — full tile_nn1_from_candidates (gather + sweep + scatter-min)
  dense   — knn1_pallas on the same clouds (the control the serve uses)

Usage: python tools/tile_serve_micro.py [maxDist motionBound tileQ blockCap]
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

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.filters.base import apply_filter_chain  # noqa: E402
from libpointmatcher_tpu.matchers import MatcherRegistrar  # noqa: E402
from libpointmatcher_tpu.ops import tilesweep as ts  # noqa: E402
from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas  # noqa: E402

BASE = "/root/reference/examples/data"
B = 8
REPS = 10


def chain_time(f, x):
    def run(x):
        def body(i, carry):
            x, acc = carry
            out = f(x)
            bump = jnp.asarray(out, jnp.float32).sum() * 1e-12
            return x + bump, acc + bump

        return jax.lax.fori_loop(0, REPS, body, (x, 0.0))[1]

    g = jax.jit(run)
    jax.block_until_ready(g(x))
    t0 = time.perf_counter()
    jax.block_until_ready(g(x + 1e-6))
    return (time.perf_counter() - t0) / REPS


def main():
    max_dist = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    motion = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    tile_q = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    block_cap = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    icp = pm.ICP()
    icp.set_default()
    key = jax.random.PRNGKey(0)
    ref_f = apply_filter_chain(icp.reference_filters, reference, key)
    read_f = apply_filter_chain(
        icp.reading_filters, reading, jax.random.fold_in(key, 1)
    )

    bg = MatcherRegistrar.create(
        "BlockGridMatcher",
        {"maxDist": str(max_dist), "motionBound": str(motion),
         "tileQueries": str(tile_q), "blockCap": str(block_cap)},
    )
    bg.init(ref_f)
    pts_h, mask_h = (np.asarray(x) for x in
                     jax.device_get((read_f.points, read_f.mask)))
    from libpointmatcher_tpu.matchers import tile_aux_to_device
    per = tile_aux_to_device(*bg.prepare_loop_host(pts_h, mask_h))
    q_rows, cand_t, pen, cid = (per["q_rows"], per["cand_t"], per["pen"],
                                per["cid"])
    T, TQ = q_rows.shape
    M = cand_t.shape[2]
    print(f"backend={jax.default_backend()} tiles={T} TQ={TQ} M={M} "
          f"padded={T * TQ * M / 1e6:.1f}M cells, x{B} pairs")

    pts = read_f.points
    mask = read_f.mask
    n = pts.shape[0]

    # stack x8 (identical content — timing only)
    def rep(x):
        return jnp.broadcast_to(x[None], (B,) + x.shape)

    pts_b, q_rows_b, cand_b, pen_b, cid_b = (
        rep(pts), rep(q_rows), rep(cand_t), rep(pen), rep(cid))

    d = 3
    parent, vrows = per["parent"], per["vrows"]

    # ---- full matcher call (gather + sweep + parent merge + scatter)
    def full(pts_b):
        def one(p):
            dd, ii = ts.tile_nn1_from_candidates(
                p, mask, q_rows, cand_t, pen, cid, max_dist,
                parent=parent, vrows=vrows,
            )
            return jnp.where(jnp.isfinite(dd), dd, 0.0).sum() + ii.sum() * 1e-20

        return jax.vmap(one)(pts_b).sum()

    dt = chain_time(full, pts_b)
    print(f"full matcher      {dt * 1e3:8.2f} ms/iter/batch")

    # ---- dense control
    rpts, rmask = ref_f.points, ref_f.mask

    def dense(pts_b):
        def one(p):
            dd, ii = knn1_pallas(p, mask, rpts, rmask)
            return jnp.where(jnp.isfinite(dd), dd, 0.0).sum()

        return jax.vmap(one)(pts_b).sum()

    dt = chain_time(dense, pts_b)
    print(f"dense control     {dt * 1e3:8.2f} ms/iter/batch "
          f"({n}x{rpts.shape[0]})")

    step_chain_bench(read_f, ref_f, per, max_dist)


def step_chain_bench(read_f, ref_f, per, max_dist, iters=20):
    """Reassemble the serve loop's per-iteration work in a fori chain and
    time cumulative variants to attribute the aux-loop overhead."""
    import libpointmatcher_tpu as pm
    from libpointmatcher_tpu.outlierfilters import (
        compute_outlier_weights, init_outlier_states,
        TrimmedDistOutlierFilter,
    )
    from libpointmatcher_tpu.minimizers import PointToPlaneErrorMinimizer
    from libpointmatcher_tpu.matchers import Matches

    outliers = (TrimmedDistOutlierFilter(),)
    minimizer = PointToPlaneErrorMinimizer()
    aux = {k: jnp.broadcast_to(v[None], (B,) + v.shape) for k, v in per.items()}
    reading_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), read_f
    )

    def variant(upto, matcher="tile"):
        def one_pair(reading, pa):
            def body(i, carry):
                T, acc = carry
                from libpointmatcher_tpu.icp import _apply_transform
                from libpointmatcher_tpu.transformations import (
                    RigidTransformation,
                )
                stepped = _apply_transform((RigidTransformation(),), reading, T)
                if matcher == "tile":
                    dd, ii = ts.tile_nn1_from_candidates(
                        stepped.points, stepped.mask, pa["q_rows"],
                        pa["cand_t"], pa["pen"], pa["cid"], max_dist,
                        parent=pa["parent"], vrows=pa["vrows"],
                    )
                else:
                    dd, ii = knn1_pallas(
                        stepped.points, stepped.mask, ref_f.points, ref_f.mask
                    )
                m = Matches(dd[:, None], ii[:, None])
                acc = acc + jnp.where(jnp.isfinite(dd), dd, 0.0).sum()
                if upto >= 1:
                    w, _ = compute_outlier_weights(
                        outliers, stepped, ref_f, m,
                        init_outlier_states(outliers))
                    acc = acc + w.sum() * 1e-9
                if upto == 2:
                    Td, stats = minimizer.compute(stepped, ref_f, w, m)
                    T = Td @ T
                    acc = acc + stats.residual * 1e-12
                elif upto == 3:
                    # dependency-preserving dummy: T update depends on the
                    # matches (keeps iterations sequential) but skips the
                    # minimizer math — isolates minimizer cost from the
                    # cost of sequentializing the matcher
                    bump = jnp.where(jnp.isfinite(dd), dd, 0.0).sum() * 1e-30
                    T = T + bump
                return T, acc

            import jax.numpy as jnp2
            T0 = jnp2.eye(4, dtype=jnp2.float32)
            return jax.lax.fori_loop(0, iters, body, (T0, 0.0))[1]

        f = jax.jit(lambda rb, ax: jax.vmap(one_pair)(rb, ax).sum())
        jax.block_until_ready(f(reading_b, aux))
        t0 = time.perf_counter()
        jax.block_until_ready(f(reading_b, aux))
        return (time.perf_counter() - t0) / iters

    for upto, matcher, label in (
        (3, "tile", "seq match (dummy min)"),
        (2, "tile", "seq match + p2plane"),
        (3, "dense", "seq DENSE (dummy min)"),
        (2, "dense", "seq DENSE + p2plane"),
    ):
        dt = variant(upto, matcher)
        print(f"chain {label:22s} {dt * 1e3:8.2f} ms/iter/batch")


if __name__ == "__main__":
    main()
