# ScanNet SpUNet with origin-coordinate interpolated evaluation

# (reference: configs/scannet/semseg-spunet-v1m1-1-interp-eval.py)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/scannet/semseg-spunet-v1m1-1-interp-eval"
data = dict(
    val=dict(
        _delete_=True,
        type="ScanNetDataset",
        split="val",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy",
                 keys_dict={"coord": "origin_coord",
                            "segment": "origin_segment"}),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv",
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
        test_mode=False,
    ),
)
