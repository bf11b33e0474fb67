# ModelNet40 classification, SpUNet in cls_mode
# (reference: configs/modelnet40/cls-spunet-v1m1-0-base.py)
_base_ = ["cls-ptv1-0-base.py"]
save_path = "exp/modelnet40/cls-spunet-v1m1-0-base"
batch_size = 16
model = dict(
    _delete_=True,
    type="DefaultClassifier",
    num_classes=40,
    backbone_embed_dim=256,
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        cls_mode=True,
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                   ignore_index=-1)],
)
optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
