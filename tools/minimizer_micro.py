"""On-chip micro-breakdown of the serving loop's non-matching costs.

The fixed-budget ablation (round 4) put the minimizer at ~87 ms/batch of
the 320 ms serving batch (20 iters): this times its pieces — the matched
row gathers (ref points + normals at winner ids), the p2plane
cross/normal-equation build, the 6x6 Jacobi solve, and the trim's
bisection quantile — each vmapped x8 at the serving shape, in-jit chains.
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

REPS = 20
N = 20480   # serving reading rows (compacted)
M = 12544   # serving map rows


def loop_time(step, x0, label, reps=REPS):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c, i), x)

    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} N={N} M={M} batch=8", flush=True)
    rng = np.random.default_rng(0)
    ref_pts = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    normals = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    fused = jnp.concatenate(
        [ref_pts, normals, jnp.zeros((M, 2), jnp.float32)], axis=1)
    ids0 = jnp.asarray(rng.integers(0, M, size=(8, N)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(8, N, 3)).astype(np.float32))
    w = jnp.asarray((rng.random((8, N)) < 0.85).astype(np.float32))

    # 1. two separate row gathers (the make_pairs form)
    def g2(x, i):
        ids = (ids0 + i) % M
        a = jax.vmap(lambda s: ref_pts[s])(ids)
        b = jax.vmap(lambda s: normals[s])(ids)
        return x + (a + b) * 1e-20

    loop_time(g2, q, "2x row gather [8,20480] from [12544,3]")

    # 2. one fused gather of [M, 8]
    def g1(x, i):
        ids = (ids0 + i) % M
        ab = jax.vmap(lambda s: fused[s])(ids)
        return x + ab[..., :3] * 1e-20

    loop_time(g1, q, "1x fused row gather from [12544,8]")

    # 3. p2plane build + solve given gathered pairs
    from libpointmatcher_tpu.minimizers import solve_possibly_underdetermined

    p_pair = jax.vmap(lambda s: ref_pts[s])(ids0)
    n_pair = jax.vmap(lambda s: normals[s])(ids0)

    def p2pl(x, i):
        def one(qq, pp, nn, ww):
            c = jnp.cross(qq, nn)
            F = jnp.concatenate([c, nn], axis=1)          # [N, 6]
            Fw = F * ww[:, None]
            A = Fw.T @ F
            b = -(Fw.T @ jnp.sum((qq - pp) * nn, axis=1))
            return solve_possibly_underdetermined(A, b)
        xs = jax.vmap(one)(x, p_pair, n_pair, w)
        return x + xs[:, None, :3] * 1e-20

    loop_time(p2pl, q, "p2plane build + 6x6 Jacobi solve")

    # 4. the 6x6 Jacobi solve alone
    A0 = jnp.asarray(rng.normal(size=(8, 6, 6)).astype(np.float32))
    A0 = jnp.einsum("bij,bkj->bik", A0, A0) + 1e-3 * jnp.eye(6)
    b0 = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))

    def solve_only(x, i):
        xs = jax.vmap(solve_possibly_underdetermined)(A0 + x * 1e-20, b0)
        return x + xs[:, :, None] * 1e-20

    loop_time(solve_only, A0, "6x6 Jacobi pinv solve alone (x8)")

    # 5. trimmed-dist quantile (bisection rank-select)
    from libpointmatcher_tpu.utils.masked import masked_quantile

    d = jnp.asarray(rng.random((8, N)).astype(np.float32))
    mask = w > 0

    def trim(x, i):
        qv = jax.vmap(
            lambda dd, mm: masked_quantile(jnp.where(mm, dd, jnp.inf), 0.85)
        )(x, mask)
        return x + qv[:, None] * 1e-20

    loop_time(trim, d, "trimmed quantile (bisection) [8,20480]")


if __name__ == "__main__":
    main()
