# ScanNet PT-v1 (PointTransformer-Seg50)
# (reference: configs/scannet/semseg-pt-v1-0-base.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/scannet/semseg-pt-v1-0-base"
model = dict(
    backbone=dict(
        _delete_=True,
        type="PointTransformer-Seg50",
        in_channels=9,
        num_classes=20,
    ),
)
epoch = 900
optimizer = dict(type="AdamW", lr=0.005, weight_decay=0.02)
scheduler = dict(type="OneCycleLR", max_lr=0.005, pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
