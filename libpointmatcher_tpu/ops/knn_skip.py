"""Bbox-pruned exact 1-NN sweep: skip provably-irrelevant map chunks.

The dense running-min kernel (:mod:`.knn_pallas`) is VPU-issue-bound at
~12 vector ops per (query, candidate) cell — further dense speedups must
come from touching fewer cells (ROADMAP: measured roofline). This module
prunes cells GEOMETRICALLY while staying exact (the reference's kd-tree
with ``epsilon: 0`` is exact, MatchersImpl.cpp:86-101 — and so is this):

- the map is Morton-sorted once per ``set_map`` so each 128-lane chunk is
  spatially tight; per-chunk bounding boxes are static per map;
- queries are Morton-sorted once per registration (rigid motion preserves
  the ordering's coherence; invalid rows sort last, so dead rows land in
  fully-dead tiles that skip everything);
- each iteration recomputes, in XLA, a per-query-tile upper bound U²_i on
  the true NN distance of every valid query in the tile, from an actual
  candidate: the distance to the PREVIOUS iteration's winner (carried in
  the fixed-point loop as matcher state; iteration 0 has no bound and
  sweeps everything). d²(q, ref[prev_id_q]) is a distance to a real map
  point, so ``NN(q) ≤ ub_q`` unconditionally — no motion bound needed;
- chunk c is skipped for tile i iff mindist²(bbox_i, bbox_c) > U²_i:
  for any q ∈ bbox_i and any r ∈ chunk c, d(q,r) ≥ mindist > U ≥ NN(q),
  so no skipped cell can hold any query's true nearest neighbor.

The kernel holds the whole (transposed) map table in VMEM (one grid axis
over query tiles; the map block index is constant, so it is fetched once)
and predicates each 128-lane chunk's compute with ``pl.when`` on an SMEM
skip flag. The running per-lane best lives in VMEM scratch, read-modified-
written inside each conditional region (~15% overhead on executed chunks,
~zero on skipped ones — measured against the unconditional kernel).

Measured on the serving pair (tools/skip_sim.py): 44-56% of (tile, chunk)
steps skip once the prev-winner bound is live, plus dead-row tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "SKIP_MAX_MPAD",
    "morton_argsort",
    "morton_argsort_batch",
    "chunk_bboxes",
    "build_skip_mask",
    "nn1_sorted_skip",
]

_DPAD = 8  # coordinate dim padded to the f32 sublane width

#: largest padded map row count served by the resident-map skip kernel
#: (the whole [8, m_pad] table sits in VMEM; beyond this the chunked
#: kernels in knn_pallas / the tile sweep take over)
SKIP_MAX_MPAD = 32768


# ------------------------------------------------------------- host helpers
def morton_argsort(pts, mask, bits: int = 10):
    """Host: stable order sorting valid rows by 3D Morton code, invalid
    rows last. Returns (order, inverse) int32 arrays of length N.
    Delegates to :func:`morton_argsort_batch` so per-scan and batched
    serving prep produce bit-identical orders."""
    import numpy as np

    pts = np.asarray(pts)
    mask = np.asarray(mask, bool)
    order = morton_argsort_batch(pts[None], mask[None], bits)[0]
    inverse = np.empty_like(order)
    inverse[order] = np.arange(len(order), dtype=np.int32)
    return order, inverse


_SPREAD10 = None  # 10-bit → every-3rd-bit spread LUT (built once)


def _spread_table():
    global _SPREAD10
    if _SPREAD10 is None:
        import numpy as np

        v = np.arange(1 << 10, dtype=np.uint32)
        out = np.zeros_like(v)
        for b in range(10):
            out |= ((v >> np.uint32(b)) & np.uint32(1)) << np.uint32(3 * b)
        _SPREAD10 = out
    return _SPREAD10


def morton_argsort_batch(pts_b, mask_b, bits: int = 10):
    """Host: :func:`morton_argsort` vectorized over a batch axis —
    ``pts_b [b, n, d]``, ``mask_b [b, n]`` → orders ``[b, n]`` int32
    (per-scan stable Morton order, invalid rows last). Bit interleave via
    a 1024-entry spread LUT on uint32 (30-bit codes): three gathers
    instead of 30 shift/or passes — the per-scan sequential form measured
    ~9 ms/scan at 25k points through the serving path's per-batch host
    prep, this one ~1 ms/scan."""
    import numpy as np

    assert bits == 10, "spread LUT is built for 10-bit axes"
    pts = np.asarray(pts_b, np.float32)
    mask = np.asarray(mask_b, bool)
    b, n, d = pts.shape
    masked = np.where(mask[..., None], pts, np.nan)
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        lo = np.nanmin(masked, axis=1, keepdims=True)      # [b, 1, d]
        span = np.nanmax(masked, axis=1, keepdims=True) - lo
    lo = np.where(np.isnan(lo), np.float32(0.0), lo)
    span = np.where(np.isnan(span), np.float32(1.0),
                    np.maximum(span, np.float32(1e-9)))
    q = np.clip((pts - lo) / span * (2**bits - 1), 0,
                2**bits - 1).astype(np.uint32)
    tab = _spread_table()
    code = np.zeros((b, n), np.uint32)
    for a in range(min(d, 3)):
        code |= tab[q[..., a]] << np.uint32(a)
    code = np.where(mask, code, np.uint32(0xFFFFFFFF))
    return np.argsort(code, axis=1, kind="stable").astype(np.int32)


def chunk_bboxes(pts_sorted, mask_sorted, chunk: int = 128):
    """Host: per-chunk [nch, 2, d] bounding boxes of a sorted point set;
    empty chunks get (lo=+inf, hi=-inf) so mindist against them is +inf
    (always skipped)."""
    import numpy as np

    pts = np.asarray(pts_sorted, np.float64)
    mask = np.asarray(mask_sorted, bool)
    n, d = pts.shape
    npad = -(-n // chunk) * chunk
    p = np.full((npad, d), np.nan)
    p[:n] = np.where(mask[:, None], pts, np.nan)
    p = p.reshape(-1, chunk, d)
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN chunks
        lo = np.nanmin(p, axis=1)
        hi = np.nanmax(p, axis=1)
    lo = np.where(np.isnan(lo), np.inf, lo)
    hi = np.where(np.isnan(hi), -np.inf, hi)
    return np.stack([lo, hi], axis=1).astype(np.float32)


# ------------------------------------------------------------ traced pieces
def build_skip_mask(qs, qm, ub2, cbox, tile_q: int):
    """Traced: per-(query-tile, map-chunk) skip flags, exact by the bound.

    qs [n,d] sorted queries at their CURRENT pose, qm [n] validity,
    ub2 [n] a valid upper bound on each query's squared NN distance
    (+inf when unknown), cbox [nch,2,d] static map-chunk bboxes.
    Returns int32 [ni, nch]; 1 = provably no true NN in that chunk.
    """
    n, d = qs.shape
    ni = -(-n // tile_q)
    npad = ni * tile_q
    pad = npad - n
    qsp = jnp.pad(qs, ((0, pad), (0, 0)))
    qmp = jnp.pad(qm, (0, pad))
    big = jnp.float32(jnp.inf)
    lo = jnp.min(
        jnp.where(qmp[:, None], qsp, big).reshape(ni, tile_q, d), axis=1)
    hi = jnp.max(
        jnp.where(qmp[:, None], qsp, -big).reshape(ni, tile_q, d), axis=1)
    U2 = jnp.max(
        jnp.where(qmp, jnp.pad(ub2, (0, pad)), -big).reshape(ni, tile_q),
        axis=1,
    )  # [ni]; fully-dead tiles get -inf → skip all
    clo = cbox[:, 0, :]
    chi = cbox[:, 1, :]
    gap = jnp.maximum(
        0.0,
        jnp.maximum(lo[:, None] - chi[None], clo[None] - hi[:, None]),
    )  # [ni, nch, d]
    mind2 = jnp.sum(gap * gap, axis=-1)
    return (mind2 > U2[:, None]).astype(jnp.int32)


def _nn1_skip_kernel(skip_ref, q_ref, rt_ref, rpen_ref, out_d_ref,
                     out_i_ref, acc_d, acc_i, *, dim, nch, group):
    """One grid step = one query tile against the whole resident map.

    Chunks are grouped into super-chunks of ``group`` 128-lane chunks;
    each super-chunk's compute is wrapped in ONE ``pl.when`` on its SMEM
    skip flag (the whole [ni, nsg] flag table is resident in SMEM —
    Mosaic requires SMEM blocks be full-array — and indexed by the grid
    step). Inside the conditional region the running per-lane best is
    read from VMEM scratch ONCE, updated in registers across the group's
    chunks, and written back ONCE — the first cut predicated every
    128-lane chunk individually and paid a scratch read-modify-write per
    chunk, which erased the pruning win (measured on chip: 4.76 ms warm
    at 63% chunks skipped vs 3.78 ms for the unconditional dense kernel).
    The cross-lane argmin runs once per tile at the end."""
    i = pl.program_id(0)
    acc_d[:, :] = jnp.full_like(acc_d, jnp.inf)
    acc_i[:, :] = jnp.zeros_like(acc_i)
    qcols = [q_ref[:, c][:, None] for c in range(dim)]
    nsg = -(-nch // group)
    for sg in range(nsg):
        @pl.when(skip_ref[i, sg] == 0)
        def _(sg=sg):
            best_d = acc_d[:, :]
            best_i = acc_i[:, :]
            for ch in range(sg * group, min((sg + 1) * group, nch)):
                sl = slice(ch * 128, (ch + 1) * 128)
                d2 = rpen_ref[0, sl][None, :]
                for c in range(dim):
                    diff = qcols[c] - rt_ref[c, sl][None, :]
                    d2 = d2 + diff * diff
                take = d2 < best_d
                best_d = jnp.where(take, d2, best_d)
                best_i = jnp.where(take, jnp.int32(ch * 128), best_i)
            acc_d[:, :] = best_d
            acc_i[:, :] = best_i
    bd = acc_d[:, :]
    td = jnp.min(bd, axis=1)
    lane = jnp.argmin(bd, axis=1).astype(jnp.int32)
    base = jnp.sum(
        jnp.where(
            lax.broadcasted_iota(jnp.int32, bd.shape, 1) == lane[:, None],
            acc_i[:, :], 0,
        ),
        axis=1,
    )
    out_d_ref[:, 0] = td
    out_i_ref[:, 0] = base + lane


@functools.partial(jax.jit, static_argnames=("tile_q", "group"))
def nn1_sorted_skip(qs, qm, rt, rpen, skip, tile_q: int = 256,
                    group: int = 4):
    """Exact 1-NN of sorted queries against a resident sorted map, with
    per-(tile, super-chunk) skip flags from :func:`build_skip_mask`
    (super-chunk = ``group`` consecutive 128-lane chunks; pass bboxes
    built with ``chunk_bboxes(..., chunk=128 * group)``).

    qs [n,d] f32 (Morton-sorted, current pose), qm [n] bool,
    rt [_DPAD, m_pad] f32 (sorted map, transposed, zero-padded),
    rpen [1, m_pad] f32 (+inf at pad rows),
    skip [ni, ceil(m_pad/(128*group))] int32.
    Returns (dists2 [n], ids [n]) — ids index the SORTED map, -1 invalid.
    """
    n, d = qs.shape
    m_pad = rt.shape[1]
    assert m_pad % 128 == 0 and m_pad <= SKIP_MAX_MPAD, m_pad
    nch = m_pad // 128
    nsg = -(-nch // group)
    ni = -(-n // tile_q)
    n_pad = ni * tile_q
    assert skip.shape == (ni, nsg), (skip.shape, ni, nsg)

    qp = jnp.zeros((n_pad, _DPAD), jnp.float32).at[:n, :d].set(qs)

    out_d, out_i = pl.pallas_call(
        functools.partial(_nn1_skip_kernel, dim=d, nch=nch, group=group),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((ni, nsg), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, _DPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_DPAD, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 128), jnp.float32),
            pltpu.VMEM((tile_q, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * n_pad * m_pad * d + 4 * n_pad * m_pad,
            bytes_accessed=4 * (n_pad + m_pad) * _DPAD,
            transcendentals=0,
        ),
    )(skip, qp, rt, rpen)

    best_d = out_d[:n, 0]
    best_i = out_i[:n, 0]
    finite = jnp.isfinite(best_d)
    best_d = jnp.where(qm, best_d, jnp.inf)
    best_i = jnp.where(jnp.logical_and(qm, finite), best_i, -1)
    return best_d, best_i
