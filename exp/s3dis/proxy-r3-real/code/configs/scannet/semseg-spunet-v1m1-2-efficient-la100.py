# ScanNet data-efficient limited-annotation setting (100 labelled points
# per scene; reference: semseg-spunet-v1m1-2-efficient-la100.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

data = dict(
    train=dict(
        la_file="data/scannet/tasks/points/points100",
        ignore_index=-1,
    )
)
