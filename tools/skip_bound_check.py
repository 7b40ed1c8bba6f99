"""On-chip validation of the MXU bound pass (ops/knn_skip.approx_min_sorted).

Safety invariant: amin_q + bound_margin >= exact squared NN distance for
every valid query — on REAL TPU arithmetic (HIGHEST-precision multi-pass
bf16 matmul), real clouds, several poses. A violation would let the skip
mask prune the true winner's chunk. Reports the worst observed signed
error (true - amin) against the margin, and the skip-rate improvement the
tight bound buys over the transported bound.

Usage: python tools/skip_bound_check.py
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

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpointmatcher_tpu import io  # noqa: E402
import libpointmatcher_tpu.ops.knn_skip as ks  # noqa: E402
from libpointmatcher_tpu.ops.knn import knn_brute_force  # noqa: E402

BASE = "/root/reference/examples/data"


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    reading = io.load(f"{BASE}/car_cloud401.csv")
    reference = io.load(f"{BASE}/car_cloud400.csv")
    q_all, _, _ = reading.to_numpy()
    r_all, _, _ = reference.to_numpy()
    qm = np.ones(len(q_all), bool)
    rm = np.ones(len(r_all), bool)

    rorder, _ = ks.morton_argsort(r_all, rm)
    rs = r_all[rorder].astype(np.float32)
    m_pad = -(-len(rs) // 128) * 128
    ra, r2max = ks.augmented_ref_table(rs, rm[rorder], m_pad)
    ra_j = jnp.asarray(ra)
    cbox = jnp.asarray(ks.chunk_bboxes(rs, rm[rorder], chunk=512))

    rt = np.zeros((8, m_pad), np.float32)
    rt[:3, :len(rs)] = rs.T

    worst_slack = -np.inf
    rng = np.random.default_rng(0)
    for trial in range(6):
        # perturbed poses, including the uncentered raw frame (large norms)
        if trial == 0:
            q = q_all.astype(np.float32)
        else:
            ang = rng.normal(size=3) * 0.1
            from scipy.spatial.transform import Rotation

            R = Rotation.from_rotvec(ang).as_matrix().astype(np.float32)
            t = rng.normal(size=3).astype(np.float32) * (0.5 * trial)
            q = (q_all @ R.T + t).astype(np.float32)
        # serving runs in Morton-sorted query space — skip rates are only
        # meaningful on coherent tiles
        qorder, _ = ks.morton_argsort(q, qm)
        q = q[qorder]
        n_pad = -(-len(q) // 256) * 256
        qa, q2 = ks.augment_queries(jnp.asarray(q), n_pad)
        t0 = time.perf_counter()
        amin = np.asarray(
            jax.block_until_ready(ks.approx_min_sorted(qa, ra_j))
        )[: len(q)]
        dt = time.perf_counter() - t0
        margin = np.asarray(ks.bound_margin(q2, jnp.asarray(amin)))
        db, _ = knn_brute_force(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(rs),
            jnp.asarray(rm[rorder]), k=1,
        )
        true_min = np.asarray(db)[:, 0]
        ratio = (true_min - amin) / margin  # must stay <= 1
        worst = float(ratio.max())
        worst_slack = max(worst_slack, worst)
        ok = worst <= 1.0
        # skip-rate comparison at iteration 0: transported bound is +inf
        ub_mxu = jnp.asarray(amin + margin)
        sk = ks.build_skip_mask(jnp.asarray(q), jnp.asarray(qm), ub_mxu,
                                cbox, 256)
        frac = float(jnp.mean(sk.astype(jnp.float32)))
        print(
            f"trial {trial}: median margin={np.median(margin):.3e} "
            f"worst (true-amin)/margin={worst:+.3f} ok={ok} "
            f"iter0 skip-rate with bound: {frac:.2f} ({dt * 1e3:.1f} ms)",
            flush=True,
        )
        assert ok, "BOUND VIOLATION — margin insufficient"
    print(f"worst ratio across trials: {worst_slack:+.3f} (must be < 1 "
          f"with >=8x headroom; headroom "
          f"{1 / max(worst_slack, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
