"""NuScenes lidarseg dataset (reference: pointcept/datasets/nuscenes.py:20-139).

Driven by the preprocessed info pickles (lidar paths + gt segment paths);
raw sweeps are (N, 5) float32 bins with intensity scaled to [-1, 1] and
labels remapped to 16 classes through the standard learning map.
"""

from __future__ import annotations

import os
import pickle
from collections.abc import Sequence

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset


@DATASETS.register_module()
class NuScenesDataset(DefaultDataset):
    def __init__(
        self,
        split="train",
        data_root="data/nuscenes",
        sweeps=10,
        transform=None,
        test_mode=False,
        test_cfg=None,
        loop=1,
        ignore_index=-1,
    ):
        self.sweeps = sweeps
        self.ignore_index = ignore_index
        self.learning_map = self.get_learning_map(ignore_index)
        super().__init__(
            split=split, data_root=data_root, transform=transform,
            test_mode=test_mode, test_cfg=test_cfg, loop=loop,
        )

    def get_info_path(self, split):
        assert split in ("train", "val", "test")
        return os.path.join(
            self.data_root, "info",
            f"nuscenes_infos_{self.sweeps}sweeps_{split}.pkl",
        )

    def get_data_list(self):
        splits = [self.split] if isinstance(self.split, str) else list(self.split)
        data_list = []
        for s in splits:
            with open(self.get_info_path(s), "rb") as f:
                data_list.extend(pickle.load(f))
        return data_list

    def get_data(self, idx):
        data = self.data_list[idx % len(self.data_list)]
        lidar_path = os.path.join(self.data_root, "raw", data["lidar_path"])
        points = np.fromfile(str(lidar_path), dtype=np.float32).reshape(-1, 5)
        coord = points[:, :3]
        strength = points[:, 3].reshape(-1, 1) / 127.5 - 1  # -> [-1, 1]
        if "gt_segment_path" in data:
            gt_path = os.path.join(self.data_root, "raw", data["gt_segment_path"])
            raw = np.fromfile(str(gt_path), dtype=np.uint8).reshape(-1)
            lut = np.full(max(self.learning_map) + 1, self.ignore_index, np.int64)
            for k, v in self.learning_map.items():
                lut[k] = v
            segment = lut[raw]
        else:
            segment = np.full(points.shape[0], self.ignore_index, np.int64)
        return dict(coord=coord, strength=strength, segment=segment)

    def get_data_name(self, idx):
        return self.data_list[idx % len(self.data_list)]["lidar_token"]

    @staticmethod
    def get_learning_map(ignore_index):
        return {
            0: ignore_index, 1: ignore_index, 2: 6, 3: 6, 4: 6,
            5: ignore_index, 6: 6, 7: ignore_index, 8: ignore_index, 9: 0,
            10: ignore_index, 11: ignore_index, 12: 7, 13: ignore_index,
            14: 1, 15: 2, 16: 2, 17: 3, 18: 4, 19: ignore_index,
            20: ignore_index, 21: 5, 22: 8, 23: 9, 24: 10, 25: 11, 26: 12,
            27: 13, 28: 14, 29: ignore_index, 30: 15, 31: ignore_index,
        }
