"""Decompose the tile-sweep padding gap on the car-cloud serving shape.

The round-2 finding (ROADMAP.md): at cell edge 1.5 m the tile sweep pads
to ~201M cells vs 18.5M touched on the car pair, so the dense sweep
(≈262M cells) stays the serving default. This tool separates the two
padding sources so the fix targets the right one:

  padded(current)  = T_pad · B_global · 8 · TQ     (global max union)
  padded(split)    = Σ_t ceil(u_t·8, CAP) · TQ     (virtual row-split)
  padded(ideal)    = Σ_t u_t · 8 · TQ              (union factor only)
  touched          = Σ query's own 3^d cell candidates

Run on CPU; host-side numpy only after the filter chains.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

import libpointmatcher_tpu as pm  # noqa: E402
from libpointmatcher_tpu import io  # noqa: E402
from libpointmatcher_tpu.filters.base import apply_filter_chain  # noqa: E402
from libpointmatcher_tpu.ops import tilesweep as ts  # noqa: E402


def main():
    base = "/root/reference/examples/data"
    reading = io.load(f"{base}/car_cloud401.csv")
    reference = io.load(f"{base}/car_cloud400.csv")

    icp = pm.ICP()
    icp.set_default()
    key = jax.random.PRNGKey(0)
    ref_f = apply_filter_chain(icp.reference_filters, reference, key)
    read_f = apply_filter_chain(icp.reading_filters, reading,
                                jax.random.fold_in(key, 1))
    rpts, rmask = np.asarray(ref_f.points), np.asarray(ref_f.mask)
    qpts, qmask = np.asarray(read_f.points), np.asarray(read_f.mask)
    print(f"map valid={rmask.sum()} rows={len(rmask)}  "
          f"reading valid={qmask.sum()} rows={len(qmask)}")
    dense = len(qmask) * ((rmask.sum() + 2047) // 2048) * 2048
    print(f"dense sweep cells/iter ≈ {dense/1e6:.1f}M")

    for edge in (1.0, 1.5, 2.0, 3.0):
        sub = ts.build_sub_blocks(rpts, rmask, edge)
        S = int(sub.pts.shape[0]) - 1
        for tq in (64, 128, 256):
            ta = ts.assign_tiles(qpts, qmask, sub, tile_q=tq)
            blocks = np.asarray(ta.blocks)
            T_pad, B = blocks.shape
            u = (blocks != S).sum(axis=1)  # union sub-blocks per tile
            cur = T_pad * B * 8 * tq
            ideal = int(u.sum()) * 8 * tq
            for cap in (1024, 2048):
                capb = cap // 8
                split = int((-(-u // capb) * capb).sum()) * 8 * tq
                print(
                    f"edge={edge:4.1f} TQ={tq:3d} T={T_pad:4d} Bmax={B:5d} "
                    f"touched={ta.touched/1e6:6.1f}M cur={cur/1e6:7.1f}M "
                    f"ideal={ideal/1e6:7.1f}M split(cap={cap})="
                    f"{split/1e6:7.1f}M"
                )


if __name__ == "__main__":
    main()
