# PointContrast-style pretraining via the MSC trainer: real ScanNet frame
# pairs, no masking, no mix, color-only features, InfoNCE tau=0.07
# (reference: configs/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast.py)
_base_ = ["pretrain-msc-v1m1-0-spunet-base.py"]
save_path = "exp/scannet/pretrain-msc-v1m1-1-spunet-pointcontrast"
epoch = 10
eval_epoch = 10
model = dict(
    backbone=dict(in_channels=3),
    backbone_in_channels=3,
    mask_rate=0,
    matching_max_pair=4096,
    nce_t=0.07,
    reconstruct_color=False,
    reconstruct_normal=False,
)

_view_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="Copy", keys_dict={"coord": "origin_coord"}),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=1),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=1),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=1),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="RandomColorJitter", brightness=0.4, contrast=0.4,
         saturation=0.2, hue=0.02, p=0.8),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.025, hash_type="fnv", mode="train",
         keys=("origin_coord", "coord", "color"),
         return_discrete_coord=True),
    dict(type="NormalizeColor"),
]

data = dict(
    train=dict(
        _delete_=True,
        type="ScanNetPairDataset",
        data_root="data/scannet_pair",
        view1_transform=_view_transform,
        view2_transform=_view_transform,
        transform=[
            dict(type="ToTensor"),
            dict(
                type="Collect",
                keys=(
                    "view1_coord", "view1_origin_coord", "view1_color",
                    "view1_discrete_coord",
                    "view2_coord", "view2_origin_coord", "view2_color",
                    "view2_discrete_coord",
                ),
                view1_feat_keys=("view1_color",),
                view2_feat_keys=("view2_color",),
            ),
        ],
        test_mode=False,
    ),
)
