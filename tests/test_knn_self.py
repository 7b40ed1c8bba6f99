"""Exactness of the large-cloud self-kNN path (ops/knn_self.py)."""

import numpy as np
import pytest

import libpointmatcher_tpu as pm


def _dense(points, mask, k, max_dist=np.inf):
    from libpointmatcher_tpu.ops.knn import knn_brute_force
    import jax.numpy as jnp

    d, i = knn_brute_force(points, mask, points, mask, k=k)
    if max_dist != np.inf:
        keep = d <= jnp.float32(max_dist) ** 2
        d = jnp.where(keep, d, jnp.inf)
        i = jnp.where(keep, i, -1)
    return np.asarray(d), np.asarray(i)


@pytest.mark.parametrize("k,max_dist,seed", [
    (1, np.inf, 0), (5, np.inf, 1), (5, 0.4, 2), (16, np.inf, 3),
])
def test_knn_self_culled_exact(k, max_dist, seed):
    """knn_self_culled must agree with the dense sweep — including rows
    routed through the fallback (sparse outliers force it)."""
    from libpointmatcher_tpu.ops.knn_self import knn_self_culled

    rng = np.random.default_rng(seed)
    # dense core + far sparse outliers (guaranteed fallback rows: their
    # k-th neighbor is far beyond the density-derived edge)
    core = rng.normal(size=(3000, 3)).astype(np.float32)
    sparse = (rng.normal(size=(20, 3)) * 50).astype(np.float32)
    pts = np.concatenate([core, sparse])
    cloud = pm.PointCloud.from_numpy(pts)

    dk, ik = knn_self_culled(cloud.points, cloud.mask, k=k,
                             max_dist=max_dist)
    dk, ik = np.asarray(dk), np.asarray(ik)
    dd, di = _dense(cloud.points, cloud.mask, k, max_dist)

    assert dk.shape == dd.shape
    assert np.array_equal(np.isfinite(dk), np.isfinite(dd))
    f = np.isfinite(dd)
    np.testing.assert_allclose(dk[f], dd[f], rtol=1e-4, atol=1e-5)
    diff = (ik != di) & f
    # id disagreements only on (near-)exact ties
    assert np.all(np.abs(dk[diff] - dd[diff]) < 1e-5)


def test_surface_normal_culled_path_matches_dense(monkeypatch):
    """SurfaceNormal through the culled path must produce the same
    normals as the dense path (threshold forced to 0 so the small test
    cloud exercises the big-cloud route end to end)."""
    import jax.random as jr

    from libpointmatcher_tpu.filters import normals as nmod
    from libpointmatcher_tpu.filters.base import DataPointsFilterRegistrar as R

    rng = np.random.default_rng(9)
    # noisy plane: well-defined normals
    pts = rng.uniform(-2, 2, size=(4000, 3)).astype(np.float32)
    pts[:, 2] = 0.05 * pts[:, 0] + 0.01 * rng.normal(size=4000)
    cloud = pm.PointCloud.from_numpy(pts)

    f = R.create("SurfaceNormalDataPointsFilter",
                 {"knn": "8", "keepDensities": "1"})
    dense_out = f.filter(cloud, key=jr.PRNGKey(0))
    # the filter re-imports the threshold from the module at call time,
    # so patching the module attribute reroutes the very next call
    monkeypatch.setattr(
        "libpointmatcher_tpu.ops.knn_self.CULL_MIN_POINTS", 0
    )
    culled_out = f.filter(cloud, key=jr.PRNGKey(0))
    del nmod  # imported only to document where the dense path lives

    a = np.asarray(dense_out.get_descriptor("normals"))
    b = np.asarray(culled_out.get_descriptor("normals"))
    # normals defined up to sign
    dots = np.abs(np.sum(a * b, axis=1))
    norm = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    ok = norm > 1e-6
    assert np.all(dots[ok] / norm[ok] > 1 - 1e-4)
    da = np.asarray(dense_out.get_descriptor("densities"))
    db = np.asarray(culled_out.get_descriptor("densities"))
    np.testing.assert_allclose(db, da, rtol=1e-3)
