# ScanNet instance segmentation, PointGroup + SpUNet
# (reference: configs/scannet/insseg-pointgroup-v1m1-0-spunet-base.py)
_base_ = ["../_base_/default_runtime.py"]

batch_size = 12
seed = 2023
pad_multiple = 8192
max_points = 102400
save_path = "exp/scannet/insseg-pointgroup-v1m1-0-spunet-base"

model = dict(
    type="PG-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        stage_cap_ratios=(0.5, 0.5, 0.5, 0.5),
    ),
    backbone_out_channels=96,
    semantic_num_classes=20,
    semantic_ignore_index=-1,
    segment_ignore_index=(-1, 0, 1),
    instance_ignore_index=-1,
    cluster_thresh=1.5,
    cluster_closed_points=300,
    cluster_propose_points=100,
    cluster_min_points=50,
)

epoch = 800
eval_epoch = 100
optimizer = dict(type="SGD", lr=0.1, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="PolyLR", power=0.9)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1)),
    dict(type="CheckpointSaver", save_freq=None),
]

dataset_type = "ScanNetDataset"
data_root = "data/scannet"
names = [
    "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
    "otherfurniture",
]

_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         keys=("coord", "color", "normal", "segment", "instance"),
         return_discrete_coord=True),
    dict(type="SphereCrop", point_max=100000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="InstanceParser", segment_ignore_index=(-1, 0, 1),
         instance_ignore_index=-1),
    dict(type="ToTensor"),
    dict(type="Collect",
         keys=("coord", "discrete_coord", "segment", "instance",
               "instance_center"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=20,
    ignore_index=-1,
    names=names,
    train=dict(type=dataset_type, split="train", data_root=data_root,
               transform=_transform, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root,
             transform=_transform, test_mode=False),
    test=dict(),
)
