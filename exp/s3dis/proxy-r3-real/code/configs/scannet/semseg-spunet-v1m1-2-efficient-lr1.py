# ScanNet data-efficient limited-reconstruction setting (1% of scenes;
# reference: semseg-spunet-v1m1-2-efficient-lr1.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

data = dict(
    train=dict(
        lr_file="data/scannet/tasks/scenes/lr1.txt",
    )
)
