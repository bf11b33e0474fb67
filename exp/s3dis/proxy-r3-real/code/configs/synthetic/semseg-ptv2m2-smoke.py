# Data-free smoke config: tiny PT-v2m2 on synthetic scenes.
# Exercises the full engine (loader -> jitted train step -> evaluator ->
# checkpointing -> tester) in ~a minute; no dataset on disk required.
_base_ = ["../_base_/default_runtime.py"]

batch_size = 2
batch_size_val = 2
num_worker = 2
epoch = 2
eval_epoch = 2
seed = 1234
pad_multiple = 1024
save_path = "exp/synthetic/smoke"

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v2m2",
        in_channels=6,
        num_classes=13,
        patch_embed_depth=1,
        patch_embed_channels=16,
        patch_embed_groups=2,
        patch_embed_neighbours=8,
        enc_depths=(1, 1),
        enc_channels=(32, 64),
        enc_groups=(4, 8),
        enc_neighbours=(8, 8),
        dec_depths=(1, 1),
        dec_channels=(16, 32),
        dec_groups=(2, 4),
        dec_neighbours=(8, 8),
        grid_sizes=(0.2, 0.4),
        drop_path_rate=0.1,
        unpool_backend="map",
        stage_cap_ratios=(0.5, 0.5),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.02)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)

dataset_type = "SyntheticDataset"

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(
        type="GridSample",
        grid_size=0.05,
        hash_type="fnv",
        mode="train",
        keys=("coord", "color", "segment"),
    ),
    dict(type="SphereCrop", point_max=2048, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "segment"), feat_keys=["coord", "color"]),
]

data = dict(
    num_classes=13,
    ignore_index=-1,
    names=[f"class{i}" for i in range(13)],
    train=dict(
        type=dataset_type,
        split="train",
        num_scenes=8,
        num_points=4096,
        transform=_train_transform,
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        num_scenes=2,
        num_points=4096,
        transform=_train_transform,
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="val",
        num_scenes=2,
        num_points=4096,
        transform=[dict(type="CenterShift", apply_z=True),
                   dict(type="NormalizeColor")],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(
                type="GridSample",
                grid_size=0.05,
                hash_type="fnv",
                mode="test",
                keys=("coord", "color"),
            ),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(
                    type="Collect",
                    keys=("coord", "index"),
                    feat_keys=("coord", "color"),
                ),
            ],
            aug_transform=[
                [dict(type="RandomScale", scale=[1, 1], anisotropic=True)],
                [
                    dict(type="RandomScale", scale=[1, 1], anisotropic=True),
                    dict(type="RandomFlip", p=1),
                ],
            ],
        ),
    ),
)
