# SemanticKITTI MinkUNet34C
# (reference: configs/semantic_kitti/semseg-minkunet34c-0-base.py)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/semantic_kitti/semseg-minkunet34c-0-base"
model = dict(
    backbone=dict(
        _delete_=True,
        type="MinkUNet34C",
        in_channels=4,
        num_classes=19,
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
)
