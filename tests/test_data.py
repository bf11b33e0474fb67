import os

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


class TestStructured3DConverter:
    """Fixture test for the Structured3D converter (reference
    preprocess_structured3d.py): a synthetic zip with one perspective
    frame and one panorama must fuse into a labelled world-space cloud."""

    def _make_zip(self, tmp_path):
        import io as _io
        import zipfile
        from PIL import Image

        def png(arr):
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return buf.getvalue()

        H, W = 24, 32
        depth = np.full((H, W), 2000, np.uint16)  # 2 m everywhere
        rgb = np.full((H, W, 3), 120, np.uint8)
        sem = np.full((H, W), 1, np.uint8)  # NYU40 'wall' -> class 0

        zpath = str(tmp_path / "Structured3D_00.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            base = "Structured3D/scene_00001/2D_rendering/42"
            p = f"{base}/perspective/full/0"
            z.writestr(
                f"{p}/camera_pose.txt",
                "0 0 1000 1 0 0 0 1 0 0.8 0.6",
            )
            z.writestr(f"{p}/depth.png", png(depth))
            z.writestr(f"{p}/rgb_rawlight.png", png(rgb))
            z.writestr(f"{p}/semantic.png", png(sem))
            pano = f"{base}/panorama"
            z.writestr(f"{pano}/camera_xyz.txt", "0 0 1000")
            z.writestr(f"{pano}/full/depth.png", png(depth))
            z.writestr(f"{pano}/full/rgb_rawlight.png", png(rgb))
            z.writestr(f"{pano}/full/semantic.png", png(sem))
        return tmp_path

    def test_convert(self, tmp_path):
        from ao_tpu.datasets.preprocessing.preprocess_structured3d import main

        root = self._make_zip(tmp_path)
        out = tmp_path / "out"
        main(["--dataset-root", str(root), "--output-root", str(out)])
        files = list((out / "train" / "scene_00001").glob("*.npz"))
        assert len(files) == 1
        z = np.load(files[0])
        coord = z["coord"]
        assert coord.shape[0] > 100
        assert z["semantic_gt"].min() == 0 and z["semantic_gt"].max() == 0
        assert np.isfinite(coord).all()
        # camera sits 1 m up (z-up output frame); constant 2 m depth keeps
        # every point within a few meters of it
        cam = np.array([0, 0, 1.0])
        d = np.linalg.norm(coord - cam, axis=1)
        assert d.min() > 1.0 and d.max() < 4.5
        assert np.allclose(np.linalg.norm(z["normal"], axis=1), 1, atol=1e-3)


class TestNuScenesInfoConverter:
    """Devkit-free nuScenes info builder (reference
    preprocess_nuscenes_info.py:312-607): a micro JSON database must yield
    info pickles that NuScenesDataset can consume end to end."""

    def _make_db(self, tmp_path):
        import json

        root = tmp_path / "raw"
        (root / "v1.0-mini").mkdir(parents=True)
        (root / "samples").mkdir()
        (root / "sweeps").mkdir()
        (root / "lidarseg").mkdir()
        ident = dict(rotation=[1, 0, 0, 0], translation=[0, 0, 0])

        def write(name, rows):
            with open(root / "v1.0-mini" / f"{name}.json", "w") as f:
                json.dump(rows, f)

        write("scene", [dict(token="sc0", name="scene-0061",
                             first_sample_token="sa0")])
        write("sample", [
            dict(token="sa0", next="sa1", prev=""),
            dict(token="sa1", next="", prev="sa0"),
        ])
        sds = []
        for i, (tok, sample, key, prev) in enumerate([
            ("sd0", "sa0", True, ""),
            ("sd0s", "sa0", False, "sd0"),  # a sweep
            ("sd1", "sa1", True, "sd0s"),
        ]):
            fname = (
                f"samples/LIDAR_TOP/{tok}.pcd.bin" if key
                else f"sweeps/LIDAR_TOP/{tok}.pcd.bin"
            )
            sds.append(dict(
                token=tok, sample_token=sample, is_key_frame=key,
                filename=fname, prev=prev, timestamp=1000 + i,
                ego_pose_token="ep0", calibrated_sensor_token="cs0",
            ))
            pts = np.random.default_rng(i).normal(
                size=(50, 5)
            ).astype(np.float32)
            path = root / fname
            path.parent.mkdir(parents=True, exist_ok=True)
            pts.tofile(path)
        write("sample_data", sds)
        write("ego_pose", [dict(token="ep0", **ident)])
        write("calibrated_sensor", [dict(token="cs0", **ident)])
        seg = np.random.default_rng(9).integers(0, 31, 50).astype(np.uint8)
        seg.tofile(root / "lidarseg" / "sd0.bin")
        write("lidarseg", [dict(token="sd0",
                                filename="lidarseg/sd0.bin")])
        return root

    def test_build_and_load(self, tmp_path):
        from ao_tpu.datasets.preprocessing.preprocess_nuscenes_info import main
        from ao_tpu.datasets.nuscenes import NuScenesDataset

        root = self._make_db(tmp_path)
        main(["--dataset-root", str(root), "--output-root", str(tmp_path),
              "--version", "v1.0-mini", "--max-sweeps", "3"])
        import pickle

        with open(tmp_path / "info" /
                  "nuscenes_infos_3sweeps_train.pkl", "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 2
        assert infos[0]["lidar_token"] == "sd0"
        assert infos[0]["gt_segment_path"] == "lidarseg/sd0.bin"
        assert len(infos[0]["sweeps"]) == 2  # prev chain + repeat
        assert np.allclose(
            infos[0]["sweeps"][0]["sensor2lidar_rotation"], np.eye(3)
        )

        ds = NuScenesDataset(split="train", data_root=str(tmp_path),
                             sweeps=3, transform=[])
        sample = ds.get_data(0)
        assert sample["coord"].shape == (50, 3)
        assert sample["segment"].shape == (50,)
        assert sample["segment"].max() < 16


class TestArkitScenesConverter:
    """ARKitScenes mesh converter (reference
    preprocess_arkitscenes_mesh.py): vertex normals from area-weighted
    face normals; output in the canonical scene layout."""

    def test_convert(self, tmp_path):
        from ao_tpu.utils.ply import write_ply
        from ao_tpu.datasets.preprocessing.preprocess_arkitscenes import main

        coord = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        color = np.full((4, 3), 128, np.uint8)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh_dir = tmp_path / "3dod" / "Training" / "41069021"
        mesh_dir.mkdir(parents=True)
        write_ply(
            str(mesh_dir / "41069021_3dod_mesh.ply"),
            [coord, color[:, 0], color[:, 1], color[:, 2]],
            ["x", "y", "z", "red", "green", "blue"],
            triangular_faces=faces,
        )
        out = tmp_path / "out"
        main(["--dataset-root", str(tmp_path), "--output-root", str(out)])
        z = np.load(out / "Training" / "41069021.npz")
        assert z["coord"].shape == (4, 3)
        # planar square in z=0 with CCW faces -> +z normals everywhere
        assert np.allclose(z["normal"], [[0, 0, 1]] * 4, atol=1e-5)
        assert np.all(z["color"] == 128)


class TestScanNetPairConverter:
    """scannet_pair pipeline (reference scannet_pair/*): .sens parsing,
    depth unprojection, pairwise overlap, and the pair list consumed by
    ScanNetPairDataset."""

    def _write_sens(self, path, poses, depths, colors, intrinsic):
        import io as _io
        import struct
        import zlib
        from PIL import Image

        with open(path, "wb") as f:
            f.write(struct.pack("I", 4))
            name = b"testsensor"
            f.write(struct.pack("Q", len(name)) + name)
            for m in (intrinsic, np.eye(4), intrinsic, np.eye(4)):
                f.write(np.asarray(m, np.float32).tobytes())
            f.write(struct.pack("ii", 2, 1))  # jpeg color, zlib depth
            h, w = depths[0].shape
            f.write(struct.pack("II", w, h))  # color size
            f.write(struct.pack("II", w, h))  # depth size
            f.write(struct.pack("f", 1000.0))
            f.write(struct.pack("Q", len(poses)))
            for pose, depth, color in zip(poses, depths, colors):
                f.write(np.asarray(pose, np.float32).tobytes())
                f.write(struct.pack("QQ", 0, 0))
                buf = _io.BytesIO()
                Image.fromarray(color).save(buf, format="JPEG")
                cb = buf.getvalue()
                db = zlib.compress(depth.astype(np.uint16).tobytes())
                f.write(struct.pack("QQ", len(cb), len(db)))
                f.write(cb + db)

    def test_pipeline(self, tmp_path):
        from ao_tpu.datasets.preprocessing.preprocess_scannet_pair import main

        h, w = 16, 20
        intr = np.eye(4)
        intr[0, 0] = intr[1, 1] = 20.0
        intr[0, 2], intr[1, 2] = w / 2, h / 2
        depth = np.full((h, w), 2000, np.uint16)
        color = np.full((h, w, 3), 90, np.uint8)
        ident = np.eye(4)
        shifted = np.eye(4)
        shifted[0, 3] = 0.3  # 30 cm away: still large overlap
        far = np.eye(4)
        far[0, 3] = 50.0  # disjoint
        scene = tmp_path / "scene0000_00"
        scene.mkdir()
        self._write_sens(str(scene / "scene0000_00.sens"),
                         [ident, shifted, far],
                         [depth] * 3, [color] * 3, intr)
        out = tmp_path / "out"
        main(["--dataset-root", str(tmp_path), "--output-root", str(out),
              "--frame-skip", "1"])

        pcds = sorted((out / "scene0000_00" / "pcd").glob("*.npz"))
        assert len(pcds) == 3
        lines = open(out / "scene0000_00" / "pcd" / "overlap.txt").read().splitlines()
        ratios = {}
        for line in lines:
            p0, p1, r = line.split()
            key = tuple(sorted(
                [os.path.basename(p0), os.path.basename(p1)]
            ))
            ratios[key] = float(r)
        assert ratios[("0.npz", "1.npz")] > 0.5
        assert ratios[("0.npz", "2.npz")] < 0.1
        filtered = open(out / "overlap30.txt").read().splitlines()
        assert len(filtered) == 1  # only the near pair survives

        from ao_tpu.datasets.misc_datasets import ScanNetPairDataset

        ds = ScanNetPairDataset(
            data_root=str(out), split="train", transform=[],
        )
        assert len(ds.get_data_list()) == 1

        # per-view transforms (PointContrast config path): each view is
        # augmented independently before prefixing
        ds_v = ScanNetPairDataset(
            data_root=str(out), split="train", transform=[],
            view1_transform=[
                dict(type="Copy", keys_dict={"coord": "origin_coord"}),
            ],
            view2_transform=[],
        )
        sample = ds_v.get_data(0)
        assert "view1_origin_coord" in sample
        assert "view2_origin_coord" not in sample
        np.testing.assert_allclose(
            sample["view1_origin_coord"], sample["view1_coord"]
        )
