# ScanNet OctFormer-v1m1
# (reference: configs/scannet/semseg-octformer-v1m1-0-base.py; octree
# attention re-designed as Morton-sorted group attention)

batch_size = 12
mix_prob = 0.8
seed = 2023
pad_multiple = 8192
max_points = 102400
save_path = "exp/scannet/semseg-pt-v2m2-0-base"

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="OctFormer-v1m1",
        in_channels=9,
        num_classes=20,
        channels=(96, 192, 384, 384),
        depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 24),
        patch_size=26,
        dilation=4,
        drop_path_rate=0.5,
        grid_sizes=(0.04, 0.08, 0.16),
        stage_cap_ratios=(0.4, 0.4, 0.4),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

epoch = 600
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.0015, weight_decay=0.05)
scheduler = dict(
    type="MultiStepWithWarmupLR", milestones=[0.6, 0.9], gamma=0.1,
    warmup_rate=0.05, warmup_scale=1e-5,
)
param_dicts = [dict(keyword="blocks", lr=0.00015)]

dataset_type = "ScanNetDataset"
data_root = "data/scannet"

names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         keys=("coord", "color", "normal", "segment"),
         return_discrete_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
         feat_keys=("coord", "color", "normal")),
]

data = dict(
    num_classes=20,
    ignore_index=-1,
    names=names,
    train=dict(type=dataset_type, split="train", data_root=data_root,
               transform=_train_transform, test_mode=False),
    val=dict(
        type=dataset_type, split="val", data_root=data_root,
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy",
                 keys_dict={"coord": "origin_coord", "segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                 mode="train", keys=("coord", "color", "normal", "segment"),
                 return_discrete_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
                 feat_keys=("coord", "color", "normal")),
        ],
        test_mode=False,
    ),
    test=dict(
        type=dataset_type, split="val", data_root=data_root,
        transform=[dict(type="CenterShift", apply_z=True),
                   dict(type="NormalizeColor")],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.02, hash_type="fnv",
                          mode="test", keys=("coord", "color", "normal"),
                          return_discrete_coord=True),
            crop=None,
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "discrete_coord", "index"),
                     feat_keys=("coord", "color", "normal")),
            ],
            aug_transform=[
                [dict(type="RandomScale", scale=[s, s], anisotropic=True)]
                for s in (0.9, 0.95, 1.0, 1.05, 1.1)
            ] + [
                [dict(type="RandomScale", scale=[s, s], anisotropic=True),
                 dict(type="RandomFlip", p=1)]
                for s in (0.9, 0.95, 1.0, 1.05, 1.1)
            ],
        ),
    ),
)
