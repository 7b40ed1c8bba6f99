"""Simulate the bbox-pruned dense sweep's skip fraction on the car pair.

For candidate (tile_q, tile_m) granularities: Morton-sort queries and map,
compute per-query-tile / per-map-chunk bboxes, the provable per-tile upper
bound ub2_i = min_j maxdist2(bbox_i, bbox_j), and count the (i, j) grid
steps with mindist2(bbox_i, bbox_j) > ub2_i — those are skippable without
changing the exact 1-NN result. Pure host-side what-if: no TPU needed.
"""

from __future__ import annotations

import sys

import numpy as np


def morton3(pts: np.ndarray, bits: int = 10) -> np.ndarray:
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    q = np.minimum(((pts - lo) / span * (2**bits - 1)).astype(np.uint64),
                   2**bits - 1)
    out = np.zeros(len(pts), np.uint64)
    for b in range(bits):
        for a in range(3):
            out |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                3 * b + a)
    return out


def tile_bboxes(pts, mask, tile):
    n = len(pts)
    npad = -(-n // tile) * tile
    p = np.full((npad, 3), np.nan)
    p[:n] = np.where(mask[:, None], pts, np.nan)
    p = p.reshape(-1, tile, 3)
    with np.errstate(invalid="ignore"):
        lo = np.nanmin(p, axis=1)
        hi = np.nanmax(p, axis=1)
    valid = np.isfinite(lo).all(axis=1)
    return lo, hi, valid


def skip_fraction_sampled(q, qmask, r, tq, tm, stride, label):
    """Tighter bound: ub_q = exact dist to a stride-sampled map subset;
    U_i = max over the tile's valid queries; skip iff mindist2 > U_i^2."""
    samples = r[::stride]
    qlo, qhi, qvalid = tile_bboxes(q, qmask, tq)
    rlo, rhi, rvalid = tile_bboxes(r, np.ones(len(r), bool), tm)
    gap = np.maximum(
        0.0, np.maximum(qlo[:, None] - rhi[None], rlo[None] - qhi[:, None]))
    mind2 = (gap**2).sum(-1)
    d2s = ((q[:, None, :] - samples[None]) ** 2).sum(-1)  # [n, S]
    ub_q = d2s.min(axis=1)
    ub_q = np.where(qmask, ub_q, -np.inf)
    npad = -(-len(q) // tq) * tq
    ubp = np.full(npad, -np.inf)
    ubp[:len(q)] = ub_q
    U2 = ubp.reshape(-1, tq).max(axis=1)  # [ni]
    skip = mind2 > U2[:, None]
    skip = np.where(qvalid[:, None], skip, True)
    ni, nj = skip.shape
    frac = skip.mean()
    extra = len(samples) / r.shape[0]
    print(f"  {label} S={len(samples)}: {ni}x{nj}, skip {frac*100:.1f}% "
          f"(+{extra*100:.1f}% pass1 -> net {1/(1-frac+extra):.2f}x)")
    return skip, qvalid


def skip_fraction(q, qmask, r, tq, tm, label):
    qlo, qhi, qvalid = tile_bboxes(q, qmask, tq)
    rlo, rhi, rvalid = tile_bboxes(r, np.ones(len(r), bool), tm)
    # mindist2[i,j], maxdist2[i,j]
    gap = np.maximum(
        0.0, np.maximum(qlo[:, None] - rhi[None], rlo[None] - qhi[:, None]))
    mind2 = (gap**2).sum(-1)
    span = np.maximum(rhi[None] - qlo[:, None], qhi[:, None] - rlo[None])
    maxd2 = (span**2).sum(-1)
    maxd2 = np.where(rvalid[None], maxd2, np.inf)
    ub2 = np.min(maxd2, axis=1)  # [ni]
    skip = mind2 > ub2[:, None]
    skip = np.where(qvalid[:, None], skip, True)  # dead tiles cost nothing
    ni, nj = skip.shape
    frac = skip.mean()
    # exactness spot check: true NN dist2 of each valid query must be
    # reachable through an unskipped chunk
    print(f"  {label}: tiles {ni}x{nj} = {ni*nj} steps, "
          f"skip {frac*100:.1f}% (compute reduced {1/(1-frac+1e-9):.2f}x)")
    return skip, qvalid


def verify_exact(q, qmask, r, qorder, rorder, tq, tm):
    qs = q[qorder]
    qm = qmask[qorder]
    rs = r[rorder]
    skip, _ = skip_fraction(qs, qm, rs, tq, tm, f"tq={tq:4d} tm={tm:4d}")
    # brute-force NN over unskipped chunks vs full — sampled queries
    rng = np.random.default_rng(0)
    sel = rng.choice(np.flatnonzero(qm), size=min(500, qm.sum()),
                     replace=False)
    bad = 0
    for qi in sel:
        ti = qi // tq
        d2 = ((rs - qs[qi]) ** 2).sum(1)
        true = d2.min()
        # mask skipped chunks
        d2m = d2.copy()
        for cj in range(skip.shape[1]):
            if skip[ti, cj]:
                d2m[cj * tm:(cj + 1) * tm] = np.inf
        if not np.isclose(d2m.min(), true):
            bad += 1
    assert bad == 0, f"{bad} queries lost their true NN"


def main():
    sys.path.insert(0, "/root/repo")
    base = "/root/reference/examples/data"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from libpointmatcher_tpu import io

    def pts_of(path):
        c = io.load(path)
        p, m, _ = c.to_numpy()
        return np.asarray(p, np.float64)

    q = pts_of(f"{base}/car_cloud401.csv")
    r = pts_of(f"{base}/car_cloud400.csv")
    rng = np.random.default_rng(0)
    # map side: SamplingSurfaceNormal keeps ~12.5k — emulate with subsample
    r = r[rng.permutation(len(r))[:12459]]
    qmask = rng.random(len(q)) < 0.75  # RandomSampling 0.75

    print(f"reading {len(q)} rows ({qmask.sum()} valid), map {len(r)}")
    qorder = np.argsort(np.where(qmask, morton3(q),
                                 np.uint64(0xFFFFFFFFFFFFFFFF)),
                        kind="stable")
    rorder = np.argsort(morton3(r), kind="stable")

    for tq in (256, 512, 1024):
        for tm in (256, 512, 1024):
            skip_fraction(q[qorder], qmask[qorder], r[rorder], tq, tm,
                          f"tq={tq:4d} tm={tm:4d}")
    print("sampled-ub bound:")
    for tq in (256, 512, 1024):
        for tm in (256, 512):
            for stride in (32, 64, 128):
                skip_fraction_sampled(
                    q[qorder], qmask[qorder], r[rorder], tq, tm, stride,
                    f"tq={tq:4d} tm={tm:4d}")
    print("prev-winner warm-start bound (pose delta per iter):")
    qs = q[qorder]
    qm = qmask[qorder]
    rs = r[rorder]
    # "previous iteration": true NN at a pose displaced by delta
    from scipy.spatial import cKDTree

    tree = cKDTree(rs)
    for delta in (0.5, 0.2, 0.05):
        # queries at prev pose = current pose shifted by delta (worst-case
        # rigid displacement); prev winners are the NN at that pose
        qprev = qs + np.array([delta, 0, 0]) / np.sqrt(1)
        _, prev_id = tree.query(qprev, k=1)
        ub_q = ((qs - rs[prev_id]) ** 2).sum(1)
        ub_q = np.where(qm, ub_q, -np.inf)
        for tq, tm in ((256, 256), (256, 512), (512, 512)):
            qlo, qhi, qvalid = tile_bboxes(qs, qm, tq)
            rlo, rhi, rvalid = tile_bboxes(rs, np.ones(len(rs), bool), tm)
            gap = np.maximum(0.0, np.maximum(
                qlo[:, None] - rhi[None], rlo[None] - qhi[:, None]))
            mind2 = (gap**2).sum(-1)
            npad = -(-len(qs) // tq) * tq
            ubp = np.full(npad, -np.inf)
            ubp[:len(qs)] = ub_q
            U2 = ubp.reshape(-1, tq).max(axis=1)
            skip = np.where(qvalid[:, None], mind2 > U2[:, None], True)
            print(f"  delta={delta:.2f} tq={tq} tm={tm}: "
                  f"skip {skip.mean()*100:.1f}% "
                  f"({1/(1-skip.mean()+1e-9):.1f}x)")
    print("exactness check (tq=512 tm=512):")
    verify_exact(q, qmask, r, qorder, rorder, 512, 512)
    print("  ok")
    # unsorted queries, sorted ref — how much does query sorting buy?
    print("no query sort:")
    skip_fraction(q, qmask, r[rorder], 512, 512, "tq= 512 tm= 512")
    # converged pose vs initial: bboxes identical to ~pose; skip is
    # geometry-driven, pose-invariant to first order.


if __name__ == "__main__":
    main()
