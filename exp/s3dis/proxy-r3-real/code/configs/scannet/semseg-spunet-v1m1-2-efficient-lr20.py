# ScanNet data-efficient limited-reconstruction setting (20% of scenes;
# reference: semseg-spunet-v1m1-2-efficient-lr20.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/lr20.txt",
    )
)
