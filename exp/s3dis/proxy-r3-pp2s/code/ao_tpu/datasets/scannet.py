"""ScanNet / ScanNet200 datasets with data-efficient limited-annotation
modes (reference: pointcept/datasets/scannet.py:30-204).

``lr_file`` restricts the scene list (limited reconstructions); ``la_file``
maps scene name -> sampled point indices (limited annotations): all other
points' labels become ignore_index and the indices ride along so
GridSample keeps them (transform.py sampled_index handling).
"""

from __future__ import annotations

import os

import numpy as np

from .builder import DATASETS
from .defaults import DefaultDataset, load_scene


@DATASETS.register_module()
class ScanNetDataset(DefaultDataset):
    segment_key = "semantic_gt20"

    def __init__(
        self,
        split="train",
        data_root="data/scannet",
        transform=None,
        lr_file=None,
        la_file=None,
        ignore_index=-1,
        test_mode=False,
        test_cfg=None,
        cache=False,
        loop=1,
    ):
        self.lr_file = lr_file
        self.ignore_index = ignore_index
        super().__init__(
            split=split,
            data_root=data_root,
            transform=transform,
            test_mode=test_mode,
            test_cfg=test_cfg,
            loop=loop,
        )
        if la_file:
            import torch

            self.la = torch.load(la_file, map_location="cpu", weights_only=False)
        else:
            self.la = None

    def get_data_list(self):
        if self.lr_file:
            return [
                os.path.join(self.data_root, "train", name + ".pth")
                for name in np.loadtxt(self.lr_file, dtype=str)
            ]
        return super().get_data_list()

    def get_data(self, idx):
        data = load_scene(self.data_list[idx % len(self.data_list)])
        coord = np.asarray(data["coord"], np.float32)
        n = coord.shape[0]
        segment = (
            np.asarray(data[self.segment_key], np.int64).reshape(-1)
            if self.segment_key in data
            else -np.ones(n, np.int64)
        )
        instance = (
            np.asarray(data["instance_gt"], np.int64).reshape(-1)
            if "instance_gt" in data
            else -np.ones(n, np.int64)
        )
        data_dict = dict(
            coord=coord,
            color=np.asarray(data["color"], np.float32),
            normal=np.asarray(data["normal"], np.float32),
            segment=segment,
            instance=instance,
            scene_id=data.get("scene_id", self.get_data_name(idx)),
        )
        if self.la is not None:
            sampled_index = self.la[self.get_data_name(idx)]
            mask = np.ones_like(segment, bool)
            mask[sampled_index] = False
            segment[mask] = self.ignore_index
            data_dict["segment"] = segment
            data_dict["sampled_index"] = sampled_index
        return data_dict


@DATASETS.register_module()
class ScanNet200Dataset(ScanNetDataset):
    segment_key = "semantic_gt200"
