# S3DIS PT-v1 (PointTransformer-Seg50)
# (reference: configs/s3dis/semseg-pt-v1-0-base.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/s3dis/semseg-pt-v1-0-base"
model = dict(
    backbone=dict(
        _delete_=True,
        type="PointTransformer-Seg50",
        in_channels=6,
        num_classes=13,
    ),
)
epoch = 3000
optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
