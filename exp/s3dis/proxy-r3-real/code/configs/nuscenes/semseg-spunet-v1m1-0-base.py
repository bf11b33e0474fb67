# nuScenes SpUNet-v1m1
# (reference: configs/nuscenes/semseg-spunet-v1m1-0-base.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/nuscenes/semseg-spunet-v1m1-0-base"
batch_size = 12
model = dict(
    backbone=dict(
        _delete_=True,
        type="SpUNet-v1m1",
        in_channels=4,
        num_classes=16,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                   ignore_index=-1)],
)
epoch = 50
eval_epoch = 50
optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.005)
scheduler = dict(
    type="OneCycleLR", max_lr=0.002, pct_start=0.04, anneal_strategy="cos",
    div_factor=10.0, final_div_factor=100.0,
)
