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


def _sort_key_u32(x):
    """Order-preserving map f32 → uint32 (the classic radix-sort key):
    non-negatives get the sign bit set, negatives are bit-inverted."""
    ub = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = ub >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~ub, ub | jnp.uint32(0x80000000))


def _select_rank(flat, finite, idx):
    """Exact value of the idx-th (0-based) smallest finite element.

    TPU-first selection: instead of a full sort (XLA sorts are the single
    most expensive primitive we could put inside the ICP loop), RADIX
    rank-select over the order-preserving uint32 bit patterns — FOUR
    sequential byte stages, each one fused histogram reduction (256
    threshold lanes) + cumsum + first-hit pick. The round-2 bitwise
    bisection (32 sequential count passes) was pure reduction latency on
    the loop's critical path: 1.42 ms per serving batch-iteration on chip
    (tools/minimizer_micro.py); the byte stages do ~8x the arithmetic in
    1/8th the sequential depth. Unconditionally exact by the same
    invariant: after each stage, ``prefix`` holds the target element's
    high bits and ``below`` the number of finite keys strictly under
    ``prefix``'s range."""
    target = idx + 1
    keys = _sort_key_u32(flat)
    keys = jnp.where(finite, keys, jnp.uint32(0xFFFFFFFF))

    import os

    if os.environ.get("PMTPU_SELECT", "") == "bisect":
        # round-2/3 bitwise bisection, kept for A/B
        def body(_, carry):
            lo, hi = carry
            mid = lo + (hi - lo) // jnp.uint32(2)
            cnt = jnp.sum(jnp.logical_and(finite, keys <= mid))
            take_low = cnt >= target
            return (jnp.where(take_low, lo, mid + jnp.uint32(1)),
                    jnp.where(take_low, mid, hi))

        lo, hi = jax.lax.fori_loop(
            0, 32, body, (jnp.uint32(0), jnp.uint32(0xFFFFFFFE))
        )
        neg = hi < jnp.uint32(0x80000000)
        bits = jnp.where(neg, ~hi, hi & jnp.uint32(0x7FFFFFFF))
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    lanes = jnp.arange(256, dtype=jnp.uint32)
    prefix = jnp.uint32(0)
    below = jnp.int32(0)
    for shift in (24, 16, 8, 0):
        hi_mask = jnp.uint32(0xFFFFFFFF) << jnp.uint32(shift + 8) \
            if shift != 24 else jnp.uint32(0)
        active = jnp.logical_and(finite, (keys & hi_mask) == prefix)
        byte = (keys >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        hist = jnp.sum(
            jnp.logical_and(active[:, None],
                            byte[:, None] == lanes[None, :]),
            axis=0, dtype=jnp.int32,
        )
        cum = jnp.cumsum(hist)
        hit = (below + cum) >= target  # first True = the target's byte
        t = jnp.argmax(hit).astype(jnp.uint32)
        below = below + jnp.sum(
            jnp.where(lanes < t, hist, 0), dtype=jnp.int32
        )
        prefix = prefix | (t << jnp.uint32(shift))
    # invert the key map
    neg = prefix < jnp.uint32(0x80000000)
    bits = jnp.where(neg, ~prefix, prefix & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


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
