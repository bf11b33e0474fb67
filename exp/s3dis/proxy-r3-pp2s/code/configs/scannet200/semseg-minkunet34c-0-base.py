# ScanNet200 MinkUNet34C
# (reference: configs/scannet200/semseg-minkunet34c-0-base.py)
_base_ = ["../scannet/semseg-minkunet34c-0-base.py"]
model = dict(backbone=dict(num_classes=200))

save_path = "exp/scannet200/semseg-minkunet34c-0-base"
dataset_type = "ScanNet200Dataset"
data_root = "data/scannet200"

from ao_tpu.datasets.preprocessing.scannet_meta import CLASS_LABELS_200

data = dict(
    num_classes=200,
    names=list(CLASS_LABELS_200),
    train=dict(type=dataset_type, data_root=data_root),
    val=dict(type=dataset_type, data_root=data_root),
    test=dict(type=dataset_type, data_root=data_root),
)
