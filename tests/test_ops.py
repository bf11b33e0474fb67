"""Op-level golden tests vs brute-force numpy references — the pytest-run
equivalent of the reference's manual libs/pointops2/functions/test_*.py
scripts (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ao_tpu.ops import (
    knn,
    knn_query,
    grouping,
    grouping_with_rel_coord,
    grid_pool,
    unpool_map,
    interpolation,
    farthest_point_sampling,
    ball_query,
)


def brute_knn(q, k_, k, qm=None, km=None):
    """Reference numpy kNN with masking."""
    M, N = q.shape[0], k_.shape[0]
    d2 = ((q[:, None, :] - k_[None, :, :]) ** 2).sum(-1)
    if km is not None:
        d2[:, ~km] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return idx, dist


class TestKNN:
    def test_matches_bruteforce(self, rng):
        B, N, k = 2, 300, 8
        coord = rng.normal(size=(B, N, 3)).astype(np.float32)
        idx, dist, valid = knn_query(k, jnp.asarray(coord))
        assert idx.shape == (B, N, k)
        assert bool(valid.all())
        for b in range(B):
            ref_idx, ref_dist = brute_knn(coord[b], coord[b], k)
            np.testing.assert_allclose(
                np.asarray(dist[b]), ref_dist, rtol=1e-4, atol=1e-4
            )
            # Index sets must match (tie order may differ within equal dists).
            assert (np.asarray(idx[b]) == ref_idx).mean() > 0.99

    def test_masked_keys_never_selected(self, rng):
        B, N, k = 1, 128, 4
        coord = rng.normal(size=(B, N, 3)).astype(np.float32)
        key_mask = np.ones((B, N), bool)
        key_mask[:, 64:] = False
        idx, dist, valid = knn(
            jnp.asarray(coord), jnp.asarray(coord), k, key_mask=jnp.asarray(key_mask)
        )
        assert int(np.asarray(idx).max()) < 64
        assert bool(valid.all())

    def test_fewer_valid_than_k(self, rng):
        coord = rng.normal(size=(1, 64, 3)).astype(np.float32)
        key_mask = np.zeros((1, 64), bool)
        key_mask[:, :3] = True
        idx, dist, valid = knn(
            jnp.asarray(coord), jnp.asarray(coord), 8, key_mask=jnp.asarray(key_mask)
        )
        v = np.asarray(valid)[0]
        assert v[:, :3].all()
        assert not v[:, 3:].any()

    def test_query_and_keys_differ(self, rng):
        q = rng.normal(size=(1, 100, 3)).astype(np.float32)
        kk = rng.normal(size=(1, 200, 3)).astype(np.float32)
        idx, dist, valid = knn(jnp.asarray(q), jnp.asarray(kk), 5)
        ref_idx, ref_dist = brute_knn(q[0], kk[0], 5)
        np.testing.assert_allclose(np.asarray(dist[0]), ref_dist, rtol=1e-4, atol=1e-4)

    def test_self_is_first_neighbor(self, rng):
        coord = rng.normal(size=(1, 50, 3)).astype(np.float32)
        idx, dist, _ = knn_query(4, jnp.asarray(coord))
        np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(50))
        np.testing.assert_allclose(np.asarray(dist[0, :, 0]), 0.0, atol=1e-5)

    def test_sorted_by_distance(self, rng):
        coord = rng.normal(size=(1, 200, 3)).astype(np.float32)
        _, dist, _ = knn_query(8, jnp.asarray(coord))
        d = np.asarray(dist[0])
        assert (np.diff(d, axis=1) >= -1e-6).all()


class TestGrouping:
    def test_gather(self, rng):
        B, N, M, k, C = 2, 40, 30, 4, 6
        feat = rng.normal(size=(B, N, C)).astype(np.float32)
        idx = rng.integers(0, N, size=(B, M, k)).astype(np.int32)
        out = grouping(jnp.asarray(feat), jnp.asarray(idx))
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(out[b]), feat[b][idx[b]])

    def test_invalid_zeroed(self, rng):
        feat = rng.normal(size=(1, 10, 3)).astype(np.float32)
        idx = np.zeros((1, 5, 2), np.int32)
        valid = np.zeros((1, 5, 2), bool)
        out = grouping(jnp.asarray(feat), jnp.asarray(idx), jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_rel_coord(self, rng):
        coord = rng.normal(size=(1, 20, 3)).astype(np.float32)
        idx = rng.integers(0, 20, size=(1, 20, 3)).astype(np.int32)
        rel = grouping_with_rel_coord(
            jnp.asarray(coord), jnp.asarray(coord), jnp.asarray(idx)
        )
        ref = coord[0][idx[0]] - coord[0][:, None, :]
        np.testing.assert_allclose(np.asarray(rel[0]), ref, rtol=1e-6)

    def test_grad_is_scatter_add(self, rng):
        feat = jnp.asarray(rng.normal(size=(1, 8, 2)).astype(np.float32))
        idx = jnp.asarray(np.array([[[0, 0], [1, 2]]], np.int32))  # (1,2,2)

        def loss(f):
            return grouping(f, idx).sum()

        g = jax.grad(loss)(feat)
        expected = np.zeros((1, 8, 2), np.float32)
        expected[0, 0] = 2.0  # gathered twice
        expected[0, 1] = 1.0
        expected[0, 2] = 1.0
        np.testing.assert_allclose(np.asarray(g), expected)


class TestGridPool:
    def _numpy_grid_pool(self, coord, feat, grid_size):
        """Reference semantics: voxelise, unique sorted, mean coord, max feat."""
        start = coord.min(0)
        d = np.floor((coord - start) / grid_size).astype(np.int64)
        extent = d.max(0) + 1
        key = (d[:, 0] * extent[1] + d[:, 1]) * extent[2] + d[:, 2]
        uniq, inverse = np.unique(key, return_inverse=True)
        M = len(uniq)
        pooled_coord = np.zeros((M, 3))
        pooled_feat = np.full((M, feat.shape[1]), -np.inf)
        for i in range(len(coord)):
            c = inverse[i]
            pooled_feat[c] = np.maximum(pooled_feat[c], feat[i])
        for c in range(M):
            pooled_coord[c] = coord[inverse == c].mean(0)
        return pooled_coord, pooled_feat, inverse

    def test_matches_numpy(self, rng):
        N, C = 200, 5
        coord = rng.uniform(0, 2, size=(1, N, 3)).astype(np.float32)
        feat = rng.normal(size=(1, N, C)).astype(np.float32)
        mask = np.ones((1, N), bool)
        pc, pf, pm, cluster, ncl = grid_pool(
            jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask), 0.5, N
        )
        ref_c, ref_f, ref_inv = self._numpy_grid_pool(coord[0], feat[0], 0.5)
        n = int(ncl[0])
        assert n == len(ref_c)
        assert bool(pm[0, :n].all()) and not bool(pm[0, n:].any())
        np.testing.assert_allclose(np.asarray(pc[0, :n]), ref_c, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pf[0, :n]), ref_f, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(cluster[0]), ref_inv)

    def test_with_padding(self, rng):
        N = 100
        coord = rng.uniform(0, 1, size=(1, N, 3)).astype(np.float32)
        feat = rng.normal(size=(1, N, 4)).astype(np.float32)
        mask = np.ones((1, N), bool)
        mask[:, 60:] = False
        pc, pf, pm, cluster, ncl = grid_pool(
            jnp.asarray(coord), jnp.asarray(feat), jnp.asarray(mask), 0.3, N
        )
        ref_c, ref_f, ref_inv = self._numpy_grid_pool(coord[0, :60], feat[0, :60], 0.3)
        n = int(ncl[0])
        assert n == len(ref_c)
        np.testing.assert_allclose(np.asarray(pc[0, :n]), ref_c, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(cluster[0, :60]), ref_inv)

    def test_unpool_map(self, rng):
        pooled = jnp.asarray(rng.normal(size=(1, 4, 2)).astype(np.float32))
        cluster = jnp.asarray(np.array([[0, 1, 1, 3, 2]], np.int32))
        mask = jnp.ones((1, 5), bool)
        up = unpool_map(pooled, cluster, mask)
        np.testing.assert_array_equal(
            np.asarray(up[0]), np.asarray(pooled[0])[np.array([0, 1, 1, 3, 2])]
        )


class TestInterpolation:
    def test_idw(self, rng):
        src = rng.normal(size=(1, 50, 3)).astype(np.float32)
        dst = rng.normal(size=(1, 80, 3)).astype(np.float32)
        feat = rng.normal(size=(1, 50, 4)).astype(np.float32)
        out = interpolation(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(feat))
        # numpy reference
        idx, dist = brute_knn(dst[0], src[0], 3)
        w = 1.0 / (dist + 1e-8)
        w = w / w.sum(1, keepdims=True)
        ref = (feat[0][idx] * w[..., None]).sum(1)
        np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-3, atol=1e-4)

    def test_exact_at_source_points(self, rng):
        src = rng.normal(size=(1, 30, 3)).astype(np.float32)
        feat = rng.normal(size=(1, 30, 2)).astype(np.float32)
        out = interpolation(jnp.asarray(src), jnp.asarray(src), jnp.asarray(feat))
        # dist 0 -> weight ~1 on self
        np.testing.assert_allclose(np.asarray(out[0]), feat[0], rtol=1e-3, atol=1e-3)


class TestFPS:
    def test_spread(self, rng):
        coord = rng.normal(size=(2, 256, 3)).astype(np.float32)
        idx, valid = farthest_point_sampling(jnp.asarray(coord), None, 32)
        assert bool(valid.all())
        for b in range(2):
            sel = np.asarray(idx[b])
            assert len(np.unique(sel)) == 32  # no duplicates

    def test_matches_numpy(self, rng):
        coord = rng.normal(size=(1, 100, 3)).astype(np.float32)
        idx, _ = farthest_point_sampling(jnp.asarray(coord), None, 10)
        # numpy FPS
        sel = [0]
        min_d2 = np.full(100, np.inf)
        for _ in range(9):
            d2 = ((coord[0] - coord[0][sel[-1]]) ** 2).sum(-1)
            min_d2 = np.minimum(min_d2, d2)
            sel.append(int(np.argmax(min_d2)))
        np.testing.assert_array_equal(np.asarray(idx[0]), sel)

    def test_masked(self, rng):
        coord = rng.normal(size=(1, 64, 3)).astype(np.float32)
        mask = np.ones((1, 64), bool)
        mask[:, 32:] = False
        idx, valid = farthest_point_sampling(jnp.asarray(coord), jnp.asarray(mask), 16)
        assert int(np.asarray(idx).max()) < 32
        assert bool(valid.all())


class TestBallQuery:
    def test_radius_respected(self, rng):
        coord = rng.uniform(0, 1, size=(1, 200, 3)).astype(np.float32)
        idx, dist, valid = ball_query(
            jnp.asarray(coord), jnp.asarray(coord), 8, 0.0, 0.2
        )
        d = np.asarray(dist)
        v = np.asarray(valid)
        assert (d[v] < 0.2).all()

    def test_padding_repeats_first(self, rng):
        # isolated point: only itself within radius
        coord = np.zeros((1, 2, 3), np.float32)
        coord[0, 1] = 10.0
        idx, dist, valid = ball_query(
            jnp.asarray(coord), jnp.asarray(coord), 4, 0.0, 1.0
        )
        np.testing.assert_array_equal(np.asarray(idx[0, 0]), [0, 0, 0, 0])


class TestSpatialKNN:
    def test_recall_vs_exact(self, rng):
        from ao_tpu.ops import knn_self_spatial

        N = 4096
        coord = rng.uniform(0, 5, size=(1, N, 3)).astype(np.float32)
        coord[..., 2] *= 0.3  # room-like aspect
        idx, dist, valid = knn_self_spatial(
            jnp.asarray(coord), None, k=16, tile_q=256, window=512, probes=3
        )
        assert bool(valid.all())
        idxn = np.asarray(idx[0])
        # self always first
        np.testing.assert_array_equal(idxn[:, 0], np.arange(N))
        # no duplicate neighbours after probe merge
        assert all(len(set(r.tolist())) == 16 for r in idxn)
        # recall vs brute force
        sample = rng.choice(N, 200, replace=False)
        rec = []
        for i in sample:
            d2 = ((coord[0] - coord[0, i]) ** 2).sum(-1)
            ref = set(np.argsort(d2)[:16].tolist())
            rec.append(len(ref & set(idxn[i].tolist())) / 16)
        assert np.mean(rec) > 0.97

    def test_masked(self, rng):
        from ao_tpu.ops import knn_self_spatial

        N = 1024
        coord = rng.uniform(0, 3, size=(1, N, 3)).astype(np.float32)
        mask = np.ones((1, N), bool)
        mask[:, 700:] = False
        idx, dist, valid = knn_self_spatial(
            jnp.asarray(coord), jnp.asarray(mask), k=8, tile_q=128, window=256
        )
        assert int(np.asarray(idx)[0, :700].max()) < 700
        assert bool(np.asarray(valid)[0, :700].all())
        assert not bool(np.asarray(valid)[0, 700:].any())

    def test_distances_exact_for_selected(self, rng):
        from ao_tpu.ops import knn_self_spatial

        N = 512
        coord = rng.normal(size=(1, N, 3)).astype(np.float32)
        idx, dist, valid = knn_self_spatial(
            jnp.asarray(coord), None, k=4, tile_q=128, window=256
        )
        c = coord[0]
        ref = np.sqrt(((c[np.asarray(idx[0])] - c[:, None, :]) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(dist[0]), ref, rtol=1e-5, atol=1e-5)


class TestCrossSpatialKNN:
    def test_recall_vs_exact(self, rng):
        from ao_tpu.ops import knn_cross_spatial

        kq = rng.uniform(0, 5, size=(1, 2000, 3)).astype(np.float32)
        qq = rng.uniform(0, 5, size=(1, 4000, 3)).astype(np.float32)
        idx, dist, valid = knn_cross_spatial(
            jnp.asarray(qq), jnp.asarray(kq), 3, window=256, probes=2, tile_q=256
        )
        assert bool(valid.all())
        idxn = np.asarray(idx[0])
        rec = []
        for i in rng.choice(4000, 200, replace=False):
            d2 = ((kq[0] - qq[0, i]) ** 2).sum(-1)
            ref = set(np.argsort(d2)[:3].tolist())
            rec.append(len(ref & set(idxn[i].tolist())) / 3)
        assert np.mean(rec) > 0.95

    def test_masked_keys(self, rng):
        from ao_tpu.ops import knn_cross_spatial

        kq = rng.uniform(0, 3, size=(1, 512, 3)).astype(np.float32)
        qq = rng.uniform(0, 3, size=(1, 512, 3)).astype(np.float32)
        km = np.ones((1, 512), bool)
        km[:, 300:] = False
        idx, dist, valid = knn_cross_spatial(
            jnp.asarray(qq), jnp.asarray(kq), 3,
            key_mask=jnp.asarray(km), window=256, tile_q=128,
        )
        assert int(np.asarray(idx).max()) < 300

    def test_interpolation_spatial_path_matches_exact(self, rng):
        """Force the spatial path and compare against the exact-path IDW."""
        import importlib

        im = importlib.import_module("ao_tpu.ops.interpolation")

        src = rng.uniform(0, 4, size=(1, 3000, 3)).astype(np.float32)
        dst = rng.uniform(0, 4, size=(1, 6000, 3)).astype(np.float32)
        feat = rng.normal(size=(1, 3000, 8)).astype(np.float32)
        exact = im.interpolation(
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(feat)
        )
        old = im._EXACT_PAIR_BUDGET
        try:
            im._EXACT_PAIR_BUDGET = 0
            approx = im.interpolation(
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(feat)
            )
        finally:
            im._EXACT_PAIR_BUDGET = old
        err = np.abs(np.asarray(exact) - np.asarray(approx))
        # >95% of interpolated features identical (recall misses differ)
        assert (err.max(axis=-1) < 1e-4).mean() > 0.9


def test_random_ball_query_randomizes():
    """Picks stay inside the annulus, differ across rng keys, and are not
    simply the nearest neighbours (reference query.py:27-70 samples a
    random in-ball subset)."""
    import jax

    from ao_tpu.ops import random_ball_query

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(0, 2, (1, 32, 3)).astype(np.float32))
    k = jnp.asarray(rng.uniform(0, 2, (1, 2048, 3)).astype(np.float32))
    idx1, d1, v1 = random_ball_query(
        q, k, nsample=8, min_radius=0.1, max_radius=0.5,
        rng=jax.random.PRNGKey(0),
    )
    idx2, _, _ = random_ball_query(
        q, k, nsample=8, min_radius=0.1, max_radius=0.5,
        rng=jax.random.PRNGKey(1),
    )
    idx1, v1 = np.asarray(idx1), np.asarray(v1)
    dist = np.linalg.norm(
        np.asarray(k)[0][idx1[0]] - np.asarray(q)[0][:, None], axis=-1
    )
    dv = dist[v1[0]]
    assert dv.size and (dv >= 0.1).all() and (dv < 0.5).all()
    assert not np.array_equal(idx1, np.asarray(idx2))  # rng changes picks
    # mean pick distance exceeds the nearest-first baseline
    nidx, ndist, nvalid = ball_query(q, k, 8, 0.1, 0.5)
    assert dv.mean() > np.asarray(ndist)[np.asarray(nvalid)].mean() * 1.05
