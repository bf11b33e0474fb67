# ScanNet precise (origin-coordinate) validation during training

# (reference: configs/scannet/semseg-pt-v2m2-2-precise-evaluate.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/scannet/semseg-pt-v2m2-2-precise-evaluate"
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
                 feat_keys=("coord", "color", "normal")),
        ],
        test_mode=False,
    ),
)
