"""Brute-force KNN op vs scipy cKDTree ground truth
(replaces the reference's libnabo; parity target: utest/ui/Matcher.cpp)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from libpointmatcher_tpu.ops.knn import knn_brute_force


def _random(n, d, seed):
    return np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)


@pytest.mark.parametrize("k", [1, 3, 8])
@pytest.mark.parametrize("d", [2, 3])
def test_knn_matches_ckdtree(k, d):
    q = _random(333, d, 0)
    r = _random(517, d, 1)
    qm = np.ones(333, bool)
    rm = np.ones(517, bool)
    dists, ids = knn_brute_force(q, qm, r, rm, k=k, tile_m=128)
    dists = np.asarray(dists)
    ids = np.asarray(ids)
    tree = cKDTree(r)
    ref_d, ref_i = tree.query(q, k=k)
    if k == 1:
        ref_d = ref_d[:, None]
        ref_i = ref_i[:, None]
    np.testing.assert_allclose(dists, ref_d.astype(np.float32) ** 2, rtol=2e-3, atol=1e-5)
    # ids may differ on exact ties; compare distances through the ids
    got_d = np.sum((q[:, None, :] - r[ids]) ** 2, axis=-1)
    np.testing.assert_allclose(got_d, ref_d**2, rtol=2e-3, atol=1e-5)


def test_knn_respects_masks():
    q = _random(64, 3, 0)
    r = _random(128, 3, 1)
    qm = np.ones(64, bool)
    qm[10:] = False
    rm = np.ones(128, bool)
    rm[:100] = False  # only rows 100..127 valid
    dists, ids = knn_brute_force(q, qm, r, rm, k=2)
    dists = np.asarray(dists)
    ids = np.asarray(ids)
    # invalid queries → inf / -1
    assert np.all(np.isinf(dists[10:]))
    assert np.all(ids[10:] == -1)
    # valid queries only match valid reference rows
    assert np.all(ids[:10] >= 100)


def test_knn_fewer_ref_than_k():
    q = _random(8, 3, 0)
    r = _random(4, 3, 1)
    dists, ids = knn_brute_force(
        q, np.ones(8, bool), r, np.ones(4, bool), k=6
    )
    dists = np.asarray(dists)
    ids = np.asarray(ids)
    assert np.all(np.isfinite(dists[:, :4]))
    assert np.all(np.isinf(dists[:, 4:]))
    assert np.all(ids[:, 4:] == -1)
