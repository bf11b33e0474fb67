# ScanNet200 semantic segmentation (200-class head)
# (reference: configs/scannet200/semseg-pt-v2m2-0-base.py)
_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]

save_path = "exp/scannet200/semseg-pt-v2m2-0-base"
dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

model = dict(backbone=dict(num_classes=200))

from ao_tpu.datasets.preprocessing.scannet_meta import CLASS_LABELS_200

data = dict(
    num_classes=200,
    names=list(CLASS_LABELS_200),
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)
