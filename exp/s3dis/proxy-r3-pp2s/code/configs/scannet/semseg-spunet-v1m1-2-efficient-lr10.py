# ScanNet data-efficient limited-reconstruction setting (10% of scenes;
# reference: semseg-spunet-v1m1-2-efficient-lr10.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/lr10.txt",
    )
)
