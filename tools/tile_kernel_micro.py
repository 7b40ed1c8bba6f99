"""Isolate the tile-sweep kernel's overhead: same total work through the
dense kernel (control) vs _tile_sweep_pallas, plus ablations.

Usage: python tools/tile_kernel_micro.py
"""

from __future__ import annotations

import functools
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

from libpointmatcher_tpu.ops import tilesweep as ts  # noqa: E402
from libpointmatcher_tpu.ops.knn_pallas import knn1_pallas  # noqa: E402

T, TQ, M = 2048, 256, 4096  # the 400k-point assignment shape
REPS = 10


def chain_time(f, x):
    def run(x):
        def body(i, carry):
            x, acc = carry
            out = f(x)
            bump = jnp.asarray(out[0], jnp.float32).sum() * 1e-12
            return x + bump, acc + bump

        return jax.lax.fori_loop(0, REPS, body, (x, 0.0))[1]

    g = jax.jit(run)
    jax.block_until_ready(g(x))
    t0 = time.perf_counter()
    jax.block_until_ready(g(x + 1e-6))
    return (time.perf_counter() - t0) / REPS


def main():
    print(f"backend={jax.default_backend()} T={T} TQ={TQ} M={M} "
          f"cells={T * TQ * M / 1e6:.0f}M")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-5, 5, (T, TQ, ts._DPAD)), jnp.float32)
    q = q.at[:, :, 3:].set(0.0)
    cand = jnp.asarray(rng.uniform(-5, 5, (T, ts._DPAD, M)), jnp.float32)
    cand = cand.at[:, 3:, :].set(0.0)
    pen = jnp.zeros((T, 1, M), jnp.float32)

    # control: the dense kernel at the same (rows x candidates) work
    nq, m = T * TQ, M
    qd = jnp.asarray(rng.uniform(-5, 5, (nq, 3)), jnp.float32)
    rd = jnp.asarray(rng.uniform(-5, 5, (m, 3)), jnp.float32)
    qm = jnp.ones(nq, bool)
    rm = jnp.ones(m, bool)
    dt = chain_time(lambda x: knn1_pallas(x, qm, rd, rm), qd)
    print(f"dense control ({nq}x{m})      {dt * 1e3:8.2f} ms "
          f"({T * TQ * M / dt / 1e12:.3f} Tcell/s)")

    dt = chain_time(lambda x: ts._tile_sweep_pallas(x, cand, pen, dim=3), q)
    print(f"tile kernel full              {dt * 1e3:8.2f} ms "
          f"({T * TQ * M / dt / 1e12:.3f} Tcell/s)")

    # ablation: min only (no index tracking)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _min_only(q_ref, rt_ref, pen_ref, out_d_ref, acc_d, *, nj, tb):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_d[:, :, :] = jnp.full_like(acc_d, jnp.inf)

        tile_m = rt_ref.shape[2]
        nch = tile_m // 128
        for s in range(tb):
            best_d = acc_d[s, :, :]
            qcols = [q_ref[s, :, c][:, None] for c in range(3)]
            for ch in range(nch):
                sl = slice(ch * 128, (ch + 1) * 128)
                d2 = pen_ref[s, 0, sl][None, :]
                for c in range(3):
                    diff = qcols[c] - rt_ref[s, c, sl][None, :]
                    d2 = d2 + diff * diff
                best_d = jnp.minimum(best_d, d2)
            acc_d[s, :, :] = best_d

        @pl.when(j == nj - 1)
        def _():
            for s in range(tb):
                out_d_ref[s, 0, :] = jnp.min(acc_d[s, :, :], axis=1)

    def min_only(q):
        tb = 8
        tile_m = min(M, 2048)
        nj = M // tile_m
        return pl.pallas_call(
            functools.partial(_min_only, nj=nj, tb=tb),
            grid=(T // tb, nj),
            in_specs=[
                pl.BlockSpec((tb, TQ, ts._DPAD), lambda t, j: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, ts._DPAD, tile_m), lambda t, j: (t, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 1, tile_m), lambda t, j: (t, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, 1, TQ), lambda t, j: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 1, TQ), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tb, TQ, 128), jnp.float32)],
        )(q, cand, pen)

    dt = chain_time(lambda x: (min_only(x),), q)
    print(f"tile kernel min-only          {dt * 1e3:8.2f} ms "
          f"({T * TQ * M / dt / 1e12:.3f} Tcell/s)")

    # ablation: one grid step per tile-row, full M (nj=1, tb=1)
    def _one(q_ref, rt_ref, pen_ref, out_d_ref):
        qcols = [q_ref[0, :, c][:, None] for c in range(3)]
        best = None
        for ch in range(M // 128):
            sl = slice(ch * 128, (ch + 1) * 128)
            d2 = pen_ref[0, 0, sl][None, :]
            for c in range(3):
                diff = qcols[c] - rt_ref[0, c, sl][None, :]
                d2 = d2 + diff * diff
            best = d2 if best is None else jnp.minimum(best, d2)
        out_d_ref[0, 0, :] = jnp.min(best, axis=1)

    def one(q):
        return pl.pallas_call(
            _one,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, TQ, ts._DPAD), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ts._DPAD, M), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, M), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, TQ), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 1, TQ), jnp.float32),
        )(q, cand, pen)

    dt = chain_time(lambda x: (one(x),), q)
    print(f"tile kernel nj=1 tb=1 minonly {dt * 1e3:8.2f} ms "
          f"({T * TQ * M / dt / 1e12:.3f} Tcell/s)")


if __name__ == "__main__":
    main()
