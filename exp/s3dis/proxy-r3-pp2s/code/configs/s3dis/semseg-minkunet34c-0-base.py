# S3DIS MinkUNet34C
# (reference: configs/s3dis/semseg-minkunet34c-0-base.py)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/s3dis/semseg-minkunet34c-0-base"
model = dict(
    backbone=dict(
        _delete_=True,
        type="MinkUNet34C",
        in_channels=6,
        num_classes=13,
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
)
epoch = 3000
optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="PolyLR", power=0.9)
