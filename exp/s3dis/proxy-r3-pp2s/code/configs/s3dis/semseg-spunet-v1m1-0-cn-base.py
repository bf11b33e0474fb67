# S3DIS SpUNet with color+normal features (6ch, no coord in feat)
# (reference: configs/s3dis/semseg-spunet-v1m1-0-cn-base.py; precise
# origin-coord validation on)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/s3dis/semseg-spunet-v1m1-0-cn-base"
data = dict(
    train=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2,
                 dropout_application_ratio=0.2),
            dict(type="RandomRotate", angle=[-1, 1], axis="z",
                 center=[0, 0, 0], p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
            dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", keys=("coord", "color", "normal", "segment"),
                 return_discrete_coord=True),
            dict(type="SphereCrop", point_max=100000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
                 feat_keys=("color", "normal")),
        ],
    ),
    val=dict(
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy",
                 keys_dict={"coord": "origin_coord",
                            "segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                 mode="train", keys=("coord", "color", "normal", "segment"),
                 return_discrete_coord=True),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect",
                 keys=("coord", "discrete_coord", "origin_coord",
                       "segment", "origin_segment"),
                 offset_keys_dict=dict(offset="coord",
                                       origin_offset="origin_coord"),
                 feat_keys=("color", "normal")),
        ],
    ),
    test=dict(
        test_cfg=dict(
            post_transform=[
                dict(type="CenterShift", apply_z=False),
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "discrete_coord", "index"),
                     feat_keys=("color", "normal")),
            ],
        ),
    ),
)
