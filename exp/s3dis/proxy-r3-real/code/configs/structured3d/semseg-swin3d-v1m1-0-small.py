# Structured3D Swin3D-v1m1 small with cRSE XYZ_RGB_NORM
# (reference: configs/structured3d/semseg-swin3d-v1m1-0-small.py)
_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]
save_path = "exp/structured3d/semseg-swin3d-v1m1-0-small"
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
