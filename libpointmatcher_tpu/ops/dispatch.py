"""Backend dispatch for the exact k-NN sweep.

One entry point — :func:`knn_search` — picks the fastest exact
implementation for the current backend:

- real TPU, k == 1  → fused Pallas 1-NN (``knn1_pallas``; or the opt-in MXU
  variant via ``PMTPU_KNN_IMPL=mxu``),
- real TPU, k ≤ KNNK_MAX → fused Pallas k-NN (``knnk_pallas``),
- otherwise → the XLA tiled scan (``knn_brute_force``), which also serves
  CPU/GPU and arbitrary k.

All implementations are exact (reference: MatchersImpl.cpp:86-101 — the
kd-tree with ``epsilon: 0``); results agree to the invalid conventions
dist=+inf / id=-1 (PointMatcher.h:377-378).
"""

from __future__ import annotations

import functools
import os

from .knn import knn_brute_force
from .knn_pallas import KNNK_MAX, knn1_pallas, knn1_pallas_mxu, knnk_pallas

__all__ = ["knn_search", "use_pallas", "MXU_EPSILON_FLOOR"]

# Minimum epsilon for which the MXU matmul-form kernel provably satisfies
# the (1+epsilon) contract: 10x its measured ~1e-6 relative tie
# mis-ranking (tools/knn_micro.py).
MXU_EPSILON_FLOOR = 1e-5


@functools.lru_cache(maxsize=8)
def _use_pallas_for(platforms_cfg) -> bool:
    import jax

    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or "axon" in plat


def use_pallas() -> bool:
    """Fused Pallas kernels only on real TPU backends (the axon PJRT plugin
    reports itself as such); the XLA scan path serves CPU/GPU.

    Keyed on ``jax.config.jax_platforms`` so the repo's documented
    CPU-forcing pattern (``jax.config.update('jax_platforms', 'cpu')``)
    invalidates a decision cached before the flip."""
    import jax

    return _use_pallas_for(jax.config.jax_platforms)


def knn_search(query, query_mask, ref, ref_mask, k: int = 1,
               epsilon: float = 0.0):
    """kNN of ``query`` [N,d] into ``ref`` [M,d]; → (dists2, ids) both
    [N,k], squared distances ascending, (+inf, -1) invalid.

    ``epsilon`` carries libnabo's approximate-search contract (reference:
    MatchersImpl.cpp:86-101, nabo ANN ε: returned neighbors lie within
    (1+ε) of the optimum). ``epsilon == 0`` is the exact VPU
    difference-form sweep. ``epsilon >= MXU_EPSILON_FLOOR`` (1e-5) opts
    into the MXU matmul-form kernel (‖q‖²+‖r‖²−2q·r on the systolic array
    at HIGHEST precision): its only deviation is mis-ranking near-exact
    ties — measured relative distance error ~1e-6, id agreement 0.99995
    (tools/knn_micro.py) — so it satisfies the (1+ε) bound whenever
    ε ≥ the 1e-5 floor (10x the measured deviation), at ~2x the
    throughput of the exact kernel. ε in (0, 1e-5) stays on the exact
    kernel: for such tight tolerances the MXU form's tie mis-ranking
    could exceed the requested bound."""
    if use_pallas():
        if k == 1:
            impl = (
                knn1_pallas_mxu
                if epsilon >= MXU_EPSILON_FLOOR
                or os.environ.get("PMTPU_KNN_IMPL", "vpu") == "mxu"
                else knn1_pallas
            )
            d1, i1 = impl(query, query_mask, ref, ref_mask)
            return d1[:, None], i1[:, None]
        if k <= KNNK_MAX:
            return knnk_pallas(query, query_mask, ref, ref_mask, k)
    return knn_brute_force(query, query_mask, ref, ref_mask, k=k)
