# ScanNet200 instance segmentation, PointGroup + SpUNet
# (reference: configs/scannet200/insseg-pointgroup-spunet-0-base.py —
# batch 48; same clustering params as the 20-class setting)
_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]
batch_size = 48
model = dict(semantic_num_classes=200)

save_path = "exp/scannet200/insseg-pointgroup-spunet-0-base"
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
