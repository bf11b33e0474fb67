# Structured3D PT-v2m2
# (reference: configs/structured3d/semseg-pt-v2m2-0-base.py)
_base_ = ["../scannet/semseg-pt-v2m2-0-base.py"]
save_path = "exp/structured3d/semseg-pt-v2m2-0-base"
model = dict(backbone=dict(num_classes=25))
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
