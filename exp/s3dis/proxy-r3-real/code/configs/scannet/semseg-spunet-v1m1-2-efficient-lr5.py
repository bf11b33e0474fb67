# ScanNet data-efficient limited-reconstruction setting (5% of scenes;
# reference: semseg-spunet-v1m1-2-efficient-lr5.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/lr5.txt",
    )
)
