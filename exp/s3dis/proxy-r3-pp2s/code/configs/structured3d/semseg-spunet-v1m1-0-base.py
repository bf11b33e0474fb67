# Structured3D SpUNet-v1m1 (25-class panoramic-room point clouds)
# (reference: configs/structured3d/semseg-spunet-v1m1-0-base.py — same
# pipeline as ScanNet at grid 0.02 with color+normal features)
_base_ = ["../scannet/semseg-spunet-v1m1-0-base.py"]
save_path = "exp/structured3d/semseg-spunet-v1m1-0-base"
model = dict(backbone=dict(num_classes=25))
epoch = 100
eval_epoch = 100
dataset_type = "Structured3DDataset"
data_root = "data/structured3d"
names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "picture", "desk", "shelves", "curtain", "dresser", "pillow",
    "mirror", "ceiling", "refrigerator", "television", "nightstand",
    "sink", "lamp", "otherstructure", "otherfurniture", "otherprop",
]
data = dict(
    num_classes=25,
    names=names,
    train=dict(type=dataset_type, data_root=data_root, split="train"),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
