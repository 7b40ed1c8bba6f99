"""PointCloud data-model tests (parity targets: utest/ui/DataPoints.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libpointmatcher_tpu import PointCloud
from libpointmatcher_tpu.cloud import bucket_size
from libpointmatcher_tpu.errors import InvalidField


def make_cloud(n=10, d=3, seed=0):
    rng = np.random.default_rng(seed)
    return PointCloud.from_numpy(rng.normal(size=(n, d)).astype(np.float32))


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(256) == 256
    assert bucket_size(257) == 384
    assert bucket_size(400) == 512
    assert bucket_size(1000) == 1024
    assert bucket_size(18700) == 24576
    assert bucket_size(25000) == 32768


def test_construction_and_count():
    c = make_cloud(100)
    assert c.num_points == 256  # bucketed
    assert c.count_host() == 100
    assert c.dim == 3


def test_descriptors_roundtrip():
    c = make_cloud(10)
    c = c.with_descriptor("normals", np.ones((c.num_points, 3)))
    assert c.has_descriptor("normals")
    assert c.get_descriptor("normals").shape == (c.num_points, 3)
    c2 = c.without_descriptor("normals")
    assert not c2.has_descriptor("normals")
    with pytest.raises(InvalidField):
        c2.get_descriptor("normals")


def test_descriptor_1d_promoted():
    c = make_cloud(10)
    c = c.with_descriptor("densities", np.ones(c.num_points))
    assert c.get_descriptor("densities").shape == (c.num_points, 1)


def test_mask_and_compact():
    c = make_cloud(300)
    keep = np.zeros(c.num_points, bool)
    keep[:50] = True
    c2 = c.with_mask(jnp.asarray(keep))
    assert c2.count_host() == 50
    c3 = c2.compact()
    assert c3.num_points == 256
    assert c3.count_host() == 50
    # compacted points are the first 50 valid rows
    np.testing.assert_allclose(
        np.asarray(c3.points[:50]), np.asarray(c.points[:50])
    )


def test_concatenate_keeps_common_descriptors():
    a = make_cloud(10).with_descriptor("normals", np.ones((256, 3)))
    b = make_cloud(20, seed=1).with_descriptor("normals", np.zeros((256, 3)))
    b = b.with_descriptor("densities", np.ones((256, 1)))
    c = a.concatenate(b)
    assert c.count_host() == 30
    assert c.has_descriptor("normals")
    assert not c.has_descriptor("densities")


def test_concatenate_dim_mismatch():
    a = make_cloud(10, d=3)
    b = make_cloud(10, d=2)
    with pytest.raises(InvalidField):
        a.concatenate(b)


def test_create_similar_empty():
    c = make_cloud(10).with_descriptor("normals", np.ones((256, 3)))
    e = c.create_similar_empty()
    assert e.count_host() == 0
    assert e.has_descriptor("normals")


def test_pytree_roundtrip():
    import jax

    c = make_cloud(10).with_descriptor("normals", np.ones((256, 3)))
    leaves, treedef = jax.tree_util.tree_flatten(c)
    c2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert c2.descriptor_labels() == c.descriptor_labels()

    # works through jit
    @jax.jit
    def shift(cloud):
        return cloud.replace(points=cloud.points + 1.0)

    c3 = shift(c)
    np.testing.assert_allclose(
        np.asarray(c3.points), np.asarray(c.points) + 1.0, rtol=1e-6
    )


def test_rank_select_adversarial():
    """Bit-pattern bisection rank selection is exact on clustered,
    high-dynamic-range, and outlier-heavy data (regression for the
    value-space bisection which was only ulp-approximate)."""
    import jax.numpy as jnp
    from libpointmatcher_tpu.utils.masked import masked_quantile

    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(5, 1500))
        base = rng.choice([1e-7, 1e-3, 1.0])
        v = (base * (1 + rng.normal(scale=1e-6, size=n))).astype(np.float32)
        v[rng.random(n) < 0.1] = 100.0
        v[rng.random(n) < 0.1] = np.inf
        finite = np.sort(v[np.isfinite(v)])
        if len(finite) == 0:
            continue
        for q in (0.0, 0.5, 0.85, 1.0):
            idx = min(int(np.floor(len(finite) * q)), len(finite) - 1)
            assert float(masked_quantile(jnp.asarray(v), q)) == finite[idx]
    # signed + denormal coverage: the radix stages walk the
    # order-preserving uint32 key bytes, where the sign flip lives in the
    # top byte and denormals in the bottom ones
    for trial in range(6):
        n = int(rng.integers(3, 800))
        v = rng.normal(scale=rng.choice([1e-38, 1e-6, 1.0, 1e30]),
                       size=n).astype(np.float32)
        v[rng.random(n) < 0.15] = -np.float32(rng.random() * 5)
        v[rng.random(n) < 0.1] = np.inf
        finite = np.sort(v[np.isfinite(v)])
        if len(finite) == 0:
            continue
        for q in (0.0, 0.3, 0.5, 1.0):
            idx = min(int(np.floor(len(finite) * q)), len(finite) - 1)
            assert float(masked_quantile(jnp.asarray(v), q)) == finite[idx]


def test_compact_traced_matches_compact():
    """Jit-safe scatter compaction packs the same rows in the same order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import libpointmatcher_tpu as pm

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    mask = rng.random(100) < 0.6
    c = pm.PointCloud(pts, mask, {"normals": pts * 2.0})

    out = jax.jit(lambda cl: cl.compact_traced(80))(c)
    valid = pts[mask]
    got = np.asarray(out.points)[np.asarray(out.mask)]
    np.testing.assert_array_equal(got, valid)
    np.testing.assert_array_equal(
        np.asarray(out.descriptors["normals"])[np.asarray(out.mask)],
        valid * 2.0,
    )
    assert out.num_points == 80

    # overflow: cap below the survivor count keeps the first cap survivors
    out2 = c.compact_traced(10)
    np.testing.assert_array_equal(
        np.asarray(out2.points)[np.asarray(out2.mask)], valid[:10]
    )
