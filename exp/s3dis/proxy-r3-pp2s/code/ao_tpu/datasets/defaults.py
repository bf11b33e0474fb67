"""Base dataset (reference: pointcept/datasets/defaults.py:21-173).

Scenes are ``.pth`` (torch-saved dict, loaded CPU-side) or ``.npz`` files
under ``<data_root>/<split>/``, holding ``coord/color/normal/
semantic_gt/instance_gt`` arrays. Train path: load -> transform. Test
path: base transform -> per-TTA-aug GridSample fragmentation -> post
transform on each fragment (whole-scene voting happens in the tester).
``loop`` repeats the scene list (the reference's mega-epoch scheme,
defaults.py:123).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence
from copy import deepcopy

import numpy as np

from ao_tpu.utils.logger import get_root_logger

from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose


def load_scene(path: str) -> dict:
    """Load a canonical scene dict from .pth (torch) or .npz."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # cpu-only usage: deserializing the preprocessed dicts

    data = torch.load(path, map_location="cpu", weights_only=False)
    return {
        k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in data.items()
    }


@DATASETS.register_module()
class DefaultDataset:
    def __init__(
        self,
        split="train",
        data_root="data/dataset",
        transform=None,
        test_mode=False,
        test_cfg=None,
        loop=1,
    ):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None

        if test_mode:
            self.test_voxelize = (
                TRANSFORMS.build(dict(self.test_cfg["voxelize"]))
                if self.test_cfg.get("voxelize") is not None
                else None
            )
            self.test_crop = (
                TRANSFORMS.build(dict(self.test_cfg["crop"]))
                if self.test_cfg.get("crop") is not None
                else None
            )
            self.post_transform = Compose(self.test_cfg.get("post_transform"))
            self.aug_transform = [
                Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])
            ]

        self.data_list = self.get_data_list()
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in "
            f"{split} set."
        )

    def get_data_list(self):
        if isinstance(self.split, str):
            splits = [self.split]
        elif isinstance(self.split, Sequence):
            splits = list(self.split)
        else:
            raise NotImplementedError
        data_list = []
        for split in splits:
            data_list += glob.glob(os.path.join(self.data_root, split, "*.pth"))
            data_list += glob.glob(os.path.join(self.data_root, split, "*.npz"))
        return sorted(data_list)

    def get_data(self, idx):
        data = load_scene(self.data_list[idx % len(self.data_list)])
        coord = data["coord"]
        out = dict(coord=np.asarray(coord, np.float32))
        if "color" in data:
            out["color"] = np.asarray(data["color"], np.float32)
        if "normal" in data:
            out["normal"] = np.asarray(data["normal"], np.float32)
        if "semantic_gt" in data:
            out["segment"] = np.asarray(data["semantic_gt"], np.int64).reshape(-1)
        else:
            out["segment"] = -np.ones(coord.shape[0], np.int64)
        if "instance_gt" in data:
            out["instance"] = np.asarray(data["instance_gt"], np.int64).reshape(-1)
        return out

    def get_data_name(self, idx):
        return os.path.splitext(
            os.path.basename(self.data_list[idx % len(self.data_list)])
        )[0]

    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        data_dict = self.get_data(idx)
        segment = data_dict.pop("segment")
        result_dict = dict(segment=segment, name=self.get_data_name(idx))
        if "category" in data_dict:  # part-seg: shape class rides along
            result_dict["category"] = data_dict["category"]
        data_dict = self.transform(data_dict)

        fragment_list = []
        for aug in self.aug_transform:
            data = aug(deepcopy(data_dict))
            if self.test_voxelize is not None:
                data_part_list = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                data_part_list = [data]
            for data_part in data_part_list:
                if self.test_crop is not None:
                    data_part = self.test_crop(data_part)
                else:
                    data_part = [data_part]
                fragment_list += data_part
        result_dict["fragment_list"] = [
            self.post_transform(frag) for frag in fragment_list
        ]
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ConcatDataset:
    def __init__(self, datasets, loop=1):
        self.datasets = [build_dataset(d) for d in datasets]
        self.loop = loop
        self.data_list = []
        for i, ds in enumerate(self.datasets):
            self.data_list += [(i, j) for j in range(len(ds))]
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in the "
            f"concat set."
        )

    def __getitem__(self, idx):
        ds_idx, sample_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[ds_idx][sample_idx]

    def __len__(self):
        return len(self.data_list) * self.loop
