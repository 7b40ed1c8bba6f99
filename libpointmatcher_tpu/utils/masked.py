"""Masked-array statistics matching the reference's semantics on ragged data.

The reference computes robust statistics over only the *finite* match
distances (reference: Matches.cpp:61-129). With fixed shapes we carry the
invalid entries as +inf and reproduce the same order statistics."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_quantile", "masked_median", "masked_mad", "masked_std"]


def _flatten_finite(values):
    flat = jnp.ravel(values)
    finite = jnp.isfinite(flat)
    return flat, finite


def _select_rank(flat, finite, idx):
    """Exact value of the idx-th (0-based) smallest finite element.

    TPU-first selection: instead of a full sort (XLA sorts are the single
    most expensive primitive we could put inside the ICP loop), bisect the
    value range with rank counts — 32 fused reduction passes — then recover
    the exact element as the smallest value above the final lower bound.
    Exactness: after bisection count(≤lo) < idx+1 ≤ count(≤hi), so the
    answer is the minimum element in (lo, ∞)."""
    target = idx + 1
    big = jnp.where(finite, flat, -jnp.inf)
    lo0 = jnp.min(jnp.where(finite, flat, jnp.inf))
    hi0 = jnp.max(big)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(jnp.logical_and(finite, flat <= mid))
        take_low = cnt >= target
        return (jnp.where(take_low, lo, mid), jnp.where(take_low, mid, hi))

    # nudge lo below the minimum so the minimum itself stays selectable
    lo, hi = jax.lax.fori_loop(
        0, 32, body, (lo0 - jnp.abs(lo0) * 1e-6 - 1e-30, hi0)
    )
    above = jnp.logical_and(finite, flat > lo)
    return jnp.min(jnp.where(above, flat, jnp.inf))


def masked_quantile(values, q):
    """Quantile over finite entries, reference indexing convention: the
    element at ascending index ``floor(n·q)`` (nth_element,
    Matches.cpp:85-86), with q==1 meaning the maximum."""
    flat, finite = _flatten_finite(values)
    n = jnp.sum(finite)
    idx = jnp.clip(jnp.floor(n * q).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    return _select_rank(flat, finite, idx)


def masked_median(values):
    """Reference's median = element at index n/2 (Matches.cpp:109-121)."""
    flat, finite = _flatten_finite(values)
    n = jnp.sum(finite)
    idx = jnp.clip(n // 2, 0, jnp.maximum(n - 1, 0))
    return _select_rank(flat, finite, idx)


def masked_mad(values):
    """Median absolute deviation, reference convention (Matches.cpp:91-122)."""
    flat, finite = _flatten_finite(values)
    med = masked_median(values)
    dev = jnp.where(finite, jnp.abs(flat - med), jnp.inf)
    return masked_median(dev)


def masked_std(values):
    """Sample standard deviation over finite entries (Matches.cpp:125-129).

    Note the reference computes this over *all* entries of the dists matrix
    (no infinity filtering there); with knn=1 and no maxDist the two agree.
    We filter infinities for numerical sanity."""
    flat, finite = _flatten_finite(values)
    n = jnp.maximum(jnp.sum(finite), 2)
    vals = jnp.where(finite, flat, 0.0)
    mean = jnp.sum(vals) / n
    var = jnp.sum(jnp.where(finite, (flat - mean) ** 2, 0.0)) / (n - 1)
    return jnp.sqrt(var)
