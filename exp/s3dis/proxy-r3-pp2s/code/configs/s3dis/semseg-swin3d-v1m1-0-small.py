# S3DIS Swin3D-v1m1 small with cRSE XYZ_RGB_NORM
# (reference: configs/s3dis/semseg-swin3d-v1m1-0-small.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/s3dis/semseg-swin3d-v1m1-0-small"
model = dict(
    backbone=dict(
        _delete_=True,
        type="Swin3D-v1m1",
        in_channels=9,
        num_classes=13,
        base_grid_size=0.04,
        depths=(2, 4, 9, 4, 4),
        channels=(48, 96, 192, 384, 384),
        num_heads=(6, 6, 12, 24, 24),
        window_sizes=(5, 7, 7, 7, 7),
        quant_size=4,
        signal_modes=("xyz", "rgb", "norm"),
        color_channels=(3, 6),
        normal_channels=(6, 9),
        drop_path_rate=0.3,
        up_k=3,
        stage_cap_ratios=(0.4, 0.4, 0.4, 0.4),
        window_capacity=64,
    ),
)
epoch = 3000
optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR", max_lr=0.001, pct_start=0.05, anneal_strategy="cos",
    div_factor=10.0, final_div_factor=1000.0,
)
_s3dis_cn_transform_train = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2,
         dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.04, hash_type="fnv", mode="train",
         keys=("coord", "color", "normal", "segment"),
         return_discrete_coord=True),
    dict(type="SphereCrop", point_max=80000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
         feat_keys=("coord", "color", "normal")),
]
data = dict(
    train=dict(transform=_s3dis_cn_transform_train),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="GridSample", grid_size=0.04, hash_type="fnv",
                 mode="train", keys=("coord", "color", "normal", "segment"),
                 return_discrete_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
                 feat_keys=("coord", "color", "normal")),
        ],
    ),
    test=dict(
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.04, hash_type="fnv",
                          mode="test", keys=("coord", "color", "normal"),
                          return_discrete_coord=True),
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "discrete_coord", "index"),
                     feat_keys=("coord", "color", "normal")),
            ],
        ),
    ),
)
