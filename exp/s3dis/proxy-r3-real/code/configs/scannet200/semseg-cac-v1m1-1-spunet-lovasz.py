# ScanNet200 CAC + SpUNet + Lovasz
# (reference: configs/scannet200/semseg-cac-v1m1-1-spunet-lovasz.py)
_base_ = ["../scannet/semseg-cac-v1m1-1-spunet-lovasz.py"]
model = dict(num_classes=200)

save_path = "exp/scannet200/semseg-cac-v1m1-1-spunet-lovasz"
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
