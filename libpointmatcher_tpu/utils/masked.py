"""Masked-array statistics matching the reference's semantics on ragged data.

The reference computes robust statistics over only the *finite* match
distances (reference: Matches.cpp:61-129). With fixed shapes we carry the
invalid entries as +inf and reproduce the same order statistics."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["masked_quantile", "masked_median", "masked_mad", "masked_std"]


def _flatten_finite(values):
    flat = jnp.ravel(values)
    finite = jnp.isfinite(flat)
    return flat, finite


def masked_quantile(values, q):
    """Quantile over finite entries, reference indexing convention.

    The reference takes ``values[floor(n*q)]`` of the ascending order
    (nth_element, Matches.cpp:85-86), with q==1 meaning the maximum. We sort
    with +inf pushed to the end and index identically."""
    flat, finite = _flatten_finite(values)
    n = jnp.sum(finite)
    s = jnp.sort(jnp.where(finite, flat, jnp.inf))
    idx = jnp.clip(jnp.floor(n * q).astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    return s[idx]


def masked_median(values):
    """Reference's median = element at index n/2 (Matches.cpp:109-121)."""
    flat, finite = _flatten_finite(values)
    n = jnp.sum(finite)
    s = jnp.sort(jnp.where(finite, flat, jnp.inf))
    idx = jnp.clip(n // 2, 0, jnp.maximum(n - 1, 0))
    return s[idx]


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
