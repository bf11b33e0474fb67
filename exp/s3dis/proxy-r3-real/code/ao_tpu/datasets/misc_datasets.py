"""Structured3D, ArkitScenes, ScanNetPair, ShapeNetPart datasets
(reference: pointcept/datasets/{structure3d, arkitscenes, scannet_pair,
shapenet_part}.py)."""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Sequence

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset, load_scene
from .transform import Compose


@DATASETS.register_module()
class Structured3DDataset(DefaultDataset):
    """Scenes live one directory deeper: <root>/<split>/<scene>/<room>.pth."""

    def get_data_list(self):
        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        data_list = []
        for split in splits:
            data_list += glob.glob(os.path.join(self.data_root, split, "*/*.pth"))
            data_list += glob.glob(os.path.join(self.data_root, split, "*/*.npz"))
        return sorted(data_list)

    def get_data_name(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        scene = os.path.basename(os.path.dirname(path))
        room = os.path.splitext(os.path.basename(path))[0]
        return f"{scene}_{room}"


@DATASETS.register_module()
class ArkitScenesDataset(DefaultDataset):
    """ARKitScenes mesh scenes; labels follow ScanNet200 ids
    (reference: arkitscenes.py)."""

    def get_data(self, idx):
        data = load_scene(self.data_list[idx % len(self.data_list)])
        coord = np.asarray(data["coord"], np.float32)
        n = coord.shape[0]
        out = dict(
            coord=coord,
            color=np.asarray(data["color"], np.float32),
            segment=-np.ones(n, np.int64),  # no public GT
        )
        if "normal" in data:
            out["normal"] = np.asarray(data["normal"], np.float32)
        return out


@DATASETS.register_module()
class ScanNetPairDataset(DefaultDataset):
    """Two-view contrastive pretraining pairs
    (reference: scannet_pair.py — per-frame point clouds + overlap list)."""

    def __init__(self, overlap_threshold=0.3, view1_transform=None,
                 view2_transform=None, **kwargs):
        self.overlap_threshold = overlap_threshold
        # per-view augmentation pipelines applied before the shared
        # transform (reference: scannet_pair.py:28-37,70-80)
        self.view1_transform = Compose(view1_transform or [])
        self.view2_transform = Compose(view2_transform or [])
        super().__init__(**kwargs)

    def get_data_list(self):
        data_list = []
        for overlap_path in glob.glob(
            os.path.join(self.data_root, "*", "pcd", "overlap.txt")
        ):
            with open(overlap_path) as f:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) == 3 and float(parts[2]) > self.overlap_threshold:
                        root = os.path.dirname(overlap_path)
                        data_list.append(
                            (
                                os.path.join(root, os.path.basename(parts[0])),
                                os.path.join(root, os.path.basename(parts[1])),
                            )
                        )
        return data_list

    def get_data(self, idx):
        path1, path2 = self.data_list[idx % len(self.data_list)]
        view1 = load_scene(path1)
        view2 = load_scene(path2)
        out = {}
        views = ((("view1_", self.view1_transform), view1),
                 (("view2_", self.view2_transform), view2))
        for (prefix, view_tf), view in views:
            vd = {"coord": np.asarray(view["coord"], np.float32)}
            if "color" in view:
                vd["color"] = np.asarray(view["color"], np.float32)
            if "normal" in view:
                vd["normal"] = np.asarray(view["normal"], np.float32)
            vd = view_tf(vd)
            for key, value in vd.items():
                out[prefix + key] = value
        return out

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))


@DATASETS.register_module()
class ShapeNetPartDataset(DefaultDataset):
    """ShapeNetPart part segmentation (reference: shapenet_part.py:20-160):
    16 categories, 50 part labels, txt files of (xyz, normal, part)."""

    category2part = {
        "Airplane": [0, 1, 2, 3], "Bag": [4, 5], "Cap": [6, 7],
        "Car": [8, 9, 10, 11], "Chair": [12, 13, 14, 15],
        "Earphone": [16, 17, 18], "Guitar": [19, 20, 21], "Knife": [22, 23],
        "Lamp": [24, 25, 26, 27], "Laptop": [28, 29],
        "Motorbike": [30, 31, 32, 33, 34, 35], "Mug": [36, 37],
        "Pistol": [38, 39, 40], "Rocket": [41, 42, 43],
        "Skateboard": [44, 45, 46], "Table": [47, 48, 49],
    }

    def __init__(self, **kwargs):
        data_root = kwargs.get(
            "data_root",
            "data/shapenetcore_partanno_segmentation_benchmark_v0_normal",
        )
        self.categories = []
        self.token2category = {}
        with open(os.path.join(data_root, "synsetoffset2category.txt")) as f:
            for line in f:
                name, token = line.strip().split()
                self.token2category[token] = len(self.categories)
                self.categories.append(name)
        super().__init__(**kwargs)

    def get_data_list(self):
        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        data_list = []
        for split in splits:
            split_file = os.path.join(
                self.data_root, "train_test_split",
                f"shuffled_{split}_file_list.json",
            )
            with open(split_file) as f:
                data_list += [
                    os.path.join(self.data_root, p[11:] + ".txt")
                    for p in json.load(f)
                ]
        return data_list

    def get_data(self, idx):
        path = self.data_list[idx % len(self.data_list)]
        data = np.loadtxt(path).astype(np.float32)
        token = os.path.basename(os.path.dirname(path))
        return dict(
            coord=data[:, :3],
            normal=data[:, 3:6],
            segment=data[:, 6].astype(np.int64),
            category=np.array([self.token2category[token]]),
        )

    def get_data_name(self, idx):
        return os.path.splitext(
            os.path.basename(self.data_list[idx % len(self.data_list)])
        )[0]
