# ScanNet200 CAC + PT-v2m2 + Lovasz
# (reference: configs/scannet200/semseg-cac-v1m1-2-ptv2-lovasz.py)
_base_ = ["../scannet/semseg-cac-v1m1-2-ptv2-lovasz.py"]
model = dict(num_classes=200)

save_path = "exp/scannet200/semseg-cac-v1m1-2-ptv2-lovasz"
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
