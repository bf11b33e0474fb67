# ScanNet Stratified Transformer v1m2 (refined: KPConv stem, 4 stages,
# color+normal features)
# (reference: configs/scannet/semseg-st-v1m2-0-refined.py)
_base_ = ["semseg-st-v1m1-0-origin.py"]
save_path = "exp/scannet/semseg-st-v1m2-0-refined"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ST-v1m2",
        in_channels=9,
        num_classes=20,
        depths=(3, 9, 3, 3),
        channels=(48, 96, 192, 384),
        num_heads=(6, 12, 24, 24),
        window_sizes=(0.2, 0.4, 0.8, 1.6),
        quant_sizes=(0.01, 0.02, 0.04, 0.08),
        grid_sizes=(0.04, 0.08, 0.16),
        window_capacity=64,
        stage_cap_ratios=(0.4, 0.4, 0.4),
        kp_embed_channels=48,
        drop_path_rate=0.2,
    ),
)
optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
