# Data-free smoke config: MSC self-supervised pretraining on synthetic
# scenes with a tiny SpUNet backbone. Exercises the two-view pipeline
# (ContrastiveViewsGenerator -> PretrainTrainer -> MSC loss) end to end.
# Reference: configs/scannet/pretrain-msc-v1m1-0-spunet-base.py (scaled down,
# normals dropped — the synthetic dataset has none).
_base_ = ["../_base_/default_runtime.py"]

batch_size = 2
num_worker = 2
epoch = 2
eval_epoch = 2
evaluate = False
seed = 777
pad_multiple = 1024
save_path = "exp/synthetic/pretrain_msc_smoke"

model = dict(
    type="MSC-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=8,
        channels=(8, 16, 32, 32, 32, 32, 16, 16),
        layers=(1, 1, 1, 1, 1, 1, 1, 1),
        stage_cap_ratios=(0.6, 0.6, 0.6, 0.6),
    ),
    backbone_in_channels=6,
    backbone_out_channels=16,
    mask_grid_size=0.1,
    mask_rate=0.4,
    matching_max_k=8,
    matching_max_radius=0.03,
    matching_max_pair=512,
    nce_t=0.4,
    contrast_weight=1.0,
    reconstruct_weight=1.0,
    reconstruct_color=True,
    reconstruct_normal=False,
)

optimizer = dict(type="SGD", lr=0.1, momentum=0.8, weight_decay=1e-4)
scheduler = dict(type="OneCycleLR", max_lr=0.1, pct_start=0.05)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=1),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver", save_freq=None),
]

dataset_type = "SyntheticDataset"

_view_aug = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
]

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[f"class{i}" for i in range(13)],
    train=dict(
        type=dataset_type,
        split="train",
        num_scenes=4,
        num_points=4096,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(
                type="GridSample",
                grid_size=0.05,
                hash_type="fnv",
                mode="train",
                keys=("coord", "color"),
            ),
            dict(type="SphereCrop", point_max=2048, mode="random"),
            dict(type="NormalizeColor"),
            dict(type="Copy", keys_dict={"coord": "origin_coord"}),
            dict(
                type="ContrastiveViewsGenerator",
                view_keys=("coord", "color", "origin_coord"),
                view_trans_cfg=_view_aug,
            ),
            dict(type="ToTensor"),
            dict(
                type="Collect",
                keys=(
                    "view1_coord", "view1_origin_coord", "view1_color",
                    "view2_coord", "view2_origin_coord", "view2_color",
                ),
                view1_feat_keys=("view1_coord", "view1_color"),
                view2_feat_keys=("view2_coord", "view2_color"),
            ),
        ],
        test_mode=False,
    ),
)
