# SemanticKITTI SPVCNN (point-voxel fusion at every stage boundary)
# (reference: configs/semantic_kitti/semseg-spvcnn-v1m1-0-base.py)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/semantic_kitti/semseg-spvcnn-v1m1-0-base"
model = dict(
    backbone=dict(
        _delete_=True,
        type="SPVCNN",
        in_channels=4,
        out_channels=19,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 2, 2, 2, 2, 2, 2, 2),
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
)
