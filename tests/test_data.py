import numpy as np
import pytest

from ao_tpu.datasets import Compose, TRANSFORMS, collate_fn, point_collate_fn
from ao_tpu.datasets import DataLoader, ShardedSampler, build_dataset


def scene(rng, n=500):
    return dict(
        coord=rng.uniform(0, 5, size=(n, 3)).astype(np.float32),
        color=rng.uniform(0, 255, size=(n, 3)).astype(np.float32),
        segment=rng.integers(0, 13, size=n).astype(np.int64),
    )


class TestTransforms:
    def test_center_shift(self, rng):
        d = scene(rng)
        out = Compose([dict(type="CenterShift", apply_z=True)])(dict(d))
        c = out["coord"]
        assert abs((c[:, 0].min() + c[:, 0].max()) / 2) < 1e-5
        assert abs(c[:, 2].min()) < 1e-5

    def test_normalize_color(self, rng):
        d = scene(rng)
        out = Compose([dict(type="NormalizeColor")])(dict(d))
        assert out["color"].min() >= -1.001 and out["color"].max() <= 1.001

    def test_random_rotate_preserves_distances(self, rng):
        d = scene(rng, 100)
        ref = d["coord"].copy()
        out = Compose(
            [dict(type="RandomRotate", angle=[-1, 1], axis="z", p=1.0)]
        )(dict(d))
        pd_ref = np.linalg.norm(ref[:50] - ref[50:100], axis=1)
        pd_out = np.linalg.norm(out["coord"][:50] - out["coord"][50:100], axis=1)
        np.testing.assert_allclose(pd_ref, pd_out, rtol=1e-4)

    def test_random_scale_flip_jitter(self, rng):
        d = scene(rng)
        out = Compose(
            [
                dict(type="RandomScale", scale=[0.9, 1.1]),
                dict(type="RandomFlip", p=0.5),
                dict(type="RandomJitter", sigma=0.005, clip=0.02),
            ]
        )(dict(d))
        assert out["coord"].shape == d["coord"].shape

    def test_grid_sample_train_dedups(self, rng):
        d = scene(rng, 2000)
        out = Compose(
            [
                dict(
                    type="GridSample",
                    grid_size=0.5,
                    hash_type="fnv",
                    mode="train",
                    keys=("coord", "color", "segment"),
                    return_discrete_coord=True,
                )
            ]
        )(dict(d))
        n = out["coord"].shape[0]
        assert n < 2000
        assert out["discrete_coord"].shape == (n, 3)
        # at most one point per voxel
        vox = out["discrete_coord"]
        keys = vox[:, 0] * 1000000 + vox[:, 1] * 1000 + vox[:, 2]
        assert len(np.unique(keys)) == n
        assert out["color"].shape == (n, 3)
        assert out["segment"].shape == (n,)

    def test_grid_sample_test_fragments_cover_everything(self, rng):
        d = scene(rng, 1000)
        gs = TRANSFORMS.build(
            dict(
                type="GridSample",
                grid_size=0.5,
                hash_type="fnv",
                mode="test",
                keys=("coord", "color", "segment"),
            )
        )
        frags = gs(dict(d))
        assert isinstance(frags, list) and len(frags) >= 1
        covered = np.concatenate([f["index"] for f in frags])
        assert len(np.unique(covered)) == 1000

    def test_fnv_vs_ravel_hash_consistency(self, rng):
        arr = rng.integers(0, 50, size=(500, 3))
        from ao_tpu.datasets.transform import GridSample

        for hash_fn in (GridSample.fnv_hash_vec, GridSample.ravel_hash_vec):
            keys = hash_fn(arr.copy())
            # same voxel -> same key; different voxel -> different key (no
            # collisions expected at this scale)
            _, inv = np.unique(arr, axis=0, return_inverse=True)
            _, kinv = np.unique(keys, return_inverse=True)
            assert len(np.unique(inv)) == len(np.unique(kinv))

    def test_sphere_crop(self, rng):
        d = scene(rng, 1000)
        out = Compose([dict(type="SphereCrop", point_max=200, mode="random")])(
            dict(d)
        )
        assert out["coord"].shape[0] == 200
        assert out["segment"].shape[0] == 200

    def test_chromatic_trio(self, rng):
        d = scene(rng)
        out = Compose(
            [
                dict(type="ChromaticAutoContrast", p=1.0),
                dict(type="ChromaticTranslation", p=1.0),
                dict(type="ChromaticJitter", p=1.0),
            ]
        )(dict(d))
        assert out["color"].min() >= 0 and out["color"].max() <= 255

    def test_collect_feat_concat(self, rng):
        d = scene(rng, 100)
        out = Compose(
            [
                dict(
                    type="Collect",
                    keys=("coord", "segment"),
                    feat_keys=("coord", "color"),
                )
            ]
        )(dict(d))
        assert out["feat"].shape == (100, 6)
        np.testing.assert_allclose(out["feat"][:, :3], d["coord"], rtol=1e-6)
        assert "color" not in out

    def test_elastic_distortion(self, rng):
        d = scene(rng, 300)
        out = Compose([dict(type="ElasticDistortion")])(dict(d))
        assert out["coord"].shape == (300, 3)

    def test_hue_saturation(self, rng):
        d = scene(rng, 100)
        out = Compose([dict(type="HueSaturationTranslation")])(dict(d))
        assert out["color"].min() >= 0 and out["color"].max() <= 255

    def test_shuffle_keeps_pairs(self, rng):
        d = scene(rng, 100)
        lookup = {tuple(np.round(c, 4)): s for c, s in zip(d["coord"], d["segment"])}
        out = Compose([dict(type="ShufflePoint")])(dict(d))
        for c, s in zip(out["coord"][:20], out["segment"][:20]):
            assert lookup[tuple(np.round(c, 4))] == s


class TestCollate:
    def test_padding_and_mask(self, rng):
        samples = [
            dict(
                coord=rng.normal(size=(n, 3)).astype(np.float32),
                feat=rng.normal(size=(n, 6)).astype(np.float32),
                segment=rng.integers(0, 5, size=n).astype(np.int64),
            )
            for n in (100, 200, 150)
        ]
        out = collate_fn(samples, pad_multiple=64)
        assert out["coord"].shape == (3, 256, 3)
        assert out["mask"].sum() == 450
        # pad labels are ignore
        assert (out["segment"][0, 100:] == -1).all()
        np.testing.assert_array_equal(out["feat"][1, :200], samples[1]["feat"])

    def test_mix3d(self, rng):
        samples = [
            dict(
                coord=rng.normal(size=(100, 3)).astype(np.float32),
                segment=np.zeros(100, np.int64),
            )
            for _ in range(4)
        ]
        np.random.seed(0)
        out = point_collate_fn(samples, mix_prob=1.0, pad_multiple=64)
        assert out["coord"].shape[0] == 2  # pairs merged
        assert out["mask"].sum() == 400

    def test_category_stacking(self, rng):
        samples = [
            dict(
                coord=rng.normal(size=(50, 3)).astype(np.float32),
                category=np.array([i]),
            )
            for i in range(3)
        ]
        out = collate_fn(samples, pad_multiple=16)
        np.testing.assert_array_equal(out["category"], [0, 1, 2])


class TestLoaderAndDatasets:
    def test_sharded_sampler_partitions(self):
        idx_sets = []
        for shard in range(4):
            s = ShardedSampler(100, shuffle=True, seed=1, num_shards=4,
                               shard_index=shard)
            s.set_epoch(3)
            idx_sets.append(list(s))
        all_idx = sum(idx_sets, [])
        assert len(all_idx) == 100
        assert len(set(all_idx)) == 100

    def test_sampler_epoch_changes_order(self):
        s = ShardedSampler(50, shuffle=True, seed=1)
        s.set_epoch(0)
        o1 = list(s)
        s.set_epoch(1)
        o2 = list(s)
        assert o1 != o2 and sorted(o1) == sorted(o2)

    def test_synthetic_dataset_loader_end_to_end(self):
        ds = build_dataset(
            dict(
                type="SyntheticDataset",
                split="train",
                num_scenes=6,
                num_points=512,
                transform=[
                    dict(type="CenterShift", apply_z=True),
                    dict(type="NormalizeColor"),
                    dict(type="ToTensor"),
                    dict(
                        type="Collect",
                        keys=("coord", "segment"),
                        feat_keys=("coord", "color"),
                    ),
                ],
            )
        )
        loader = DataLoader(
            ds,
            batch_size=2,
            sampler=ShardedSampler(len(ds), shuffle=True, seed=0),
            collate_fn=lambda b: collate_fn(b, pad_multiple=128),
            num_workers=2,
        )
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["coord"].shape[0] == 2
            assert b["feat"].shape[-1] == 6
            assert b["mask"].any()

    def test_dataset_loop(self):
        ds = build_dataset(
            dict(type="SyntheticDataset", split="train", num_scenes=4,
                 num_points=64, loop=3, transform=[])
        )
        assert len(ds) == 12


class TestColorConversionHelpers:
    """The own-idiom HSV conversions must match colorsys (the ground truth
    the reference's conversions were derived from)."""

    def test_roundtrip_and_colorsys_parity(self):
        import colorsys
        from ao_tpu.datasets.transform import _rgb_to_hsv, _hsv_to_rgb

        g = np.random.default_rng(0)
        rgb = g.uniform(0, 1, (200, 3)).astype(np.float64)
        h, s, v = _rgb_to_hsv(rgb)
        back = _hsv_to_rgb(h, s, v)
        assert np.allclose(back, rgb, atol=1e-6)
        for i in range(0, 200, 17):
            hh, ss, vv = colorsys.rgb_to_hsv(*rgb[i])
            assert abs(h[i] - hh) < 1e-6 or abs(abs(h[i] - hh) - 1.0) < 1e-6
            assert abs(s[i] - ss) < 1e-6
            assert abs(v[i] - vv) < 1e-6

    def test_grey_pixels_stable(self):
        from ao_tpu.datasets.transform import _rgb_to_hsv, _hsv_to_rgb

        grey = np.full((5, 3), 0.5)
        h, s, v = _rgb_to_hsv(grey)
        assert np.all(s == 0) and np.all(v == 0.5)
        assert np.allclose(_hsv_to_rgb(h + 0.3, s, v), grey)

    def test_elastic_distortion_scale(self):
        """Displacement amplitude scales linearly with magnitude and the
        field is smooth (nearby points move together)."""
        from ao_tpu.datasets.transform import ElasticDistortion

        g = np.random.default_rng(3)
        coords = g.uniform(0, 4, (4000, 3)).astype(np.float32)
        np.random.seed(11)
        out1 = ElasticDistortion.elastic_distortion(coords, 0.5, 1.0)
        np.random.seed(11)
        out2 = ElasticDistortion.elastic_distortion(coords, 0.5, 2.0)
        d1 = out1 - coords
        d2 = out2 - coords
        assert np.allclose(d2, 2 * d1, atol=1e-5)
        assert 0 < np.abs(d1).max() < 1.0
        # smoothness: displacement difference of close point pairs is small
        pair = coords + 0.02
        np.random.seed(11)
        out3 = ElasticDistortion.elastic_distortion(pair, 0.5, 1.0)
        assert np.abs((out3 - pair) - d1).max() < 0.2 * max(np.abs(d1).max(), 1e-9)
