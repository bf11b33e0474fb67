# SemanticKITTI SpUNet-v1m1 (class-frequency CE weights)
# (reference: configs/semantic_kitti/semseg-spunet-v1m1-0-base.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/semantic_kitti/semseg-spunet-v1m1-0-base"
batch_size = 8
model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=19,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
    criteria=[
        dict(type="CrossEntropyLoss",
             weight=[3.1557, 8.7029, 7.8281, 6.1354, 6.3161, 7.9937, 8.9704, 10.1922, 1.6155, 4.2187, 1.9385, 5.5455, 2.0198, 2.6261, 1.3212, 5.1102, 2.5492, 5.8585, 7.3929],
             loss_weight=1.0, ignore_index=-1),
    ],
)
epoch = 50
eval_epoch = 50
optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.005)
scheduler = dict(
    type="OneCycleLR", max_lr=0.002, pct_start=0.04, anneal_strategy="cos",
    div_factor=10.0, final_div_factor=100.0,
)
