# ModelNet40 classification, PointTransformer-Cls26 (1024 pts)
# (reference: configs/modelnet40/cls-pt-v1-0-base.py)
_base_ = ["../_base_/default_runtime.py"]

batch_size = 32
num_worker = 8
seed = 1234
epoch = 200
eval_epoch = 200
pad_multiple = 1024
save_path = "exp/modelnet40/cls-ptv1-0-base"

model = dict(
    type="DefaultSegmentor",  # backbone returns class logits directly
    backbone=dict(
        type="PointTransformer-Cls26",
        in_channels=6,
        num_classes=40,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

optimizer = dict(type="SGD", lr=0.05, momentum=0.9, weight_decay=0.0001,
                 nesterov=True)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)

dataset_type = "ModelNetDataset"
data_root = "data/modelnet40_normal_resampled"

names = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
    "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
    "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
test = dict(type="ClsTester", verbose=True)

data = dict(
    num_classes=40,
    ignore_index=-1,
    names=names,
    train=dict(
        type=dataset_type,
        split="train",
        data_root=data_root,
        class_names=names,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="RandomScale", scale=[0.7, 1.5], anisotropic=True),
            dict(type="RandomShift", shift=((-0.2, 0.2), (-0.2, 0.2), (-0.2, 0.2))),
            dict(type="SphereCrop", point_max=1024, mode="random"),
            dict(type="ToTensor"),
            dict(
                type="Collect",
                keys=("coord", "category"),
                feat_keys=["coord", "normal"],
            ),
        ],
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        class_names=names,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="SphereCrop", point_max=1024, mode="center"),
            dict(type="ToTensor"),
            dict(
                type="Collect",
                keys=("coord", "category"),
                feat_keys=["coord", "normal"],
            ),
        ],
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        class_names=names,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="SphereCrop", point_max=1024, mode="center"),
            dict(type="ToTensor"),
            dict(
                type="Collect",
                keys=("coord", "category"),
                feat_keys=["coord", "normal"],
            ),
        ],
        test_mode=True,
        test_cfg=dict(),
    ),
)
