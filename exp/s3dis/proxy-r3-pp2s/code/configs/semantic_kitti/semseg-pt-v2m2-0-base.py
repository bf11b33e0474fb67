# SemanticKITTI outdoor LiDAR semseg
# (reference: configs/semantic_kitti/semseg-pt-v2m2-0-base.py: 4-channel
# coord+strength input, PointClip range crop, 120k crop)
_base_ = ["../_base_/default_runtime.py"]

batch_size = 12
mix_prob = 0
seed = 2023
pad_multiple = 8192
max_points = 122880
save_path = "exp/semantic_kitti/semseg-pt-v2m2-0-base"

learning_map = {
    0: -1, 1: -1, 10: 0, 11: 1, 13: 4, 15: 2, 16: 4, 18: 3, 20: 4, 30: 5,
    31: 6, 32: 7, 40: 8, 44: 9, 48: 10, 49: 11, 50: 12, 51: 13, 52: -1,
    60: 8, 70: 14, 71: 15, 72: 16, 80: 17, 81: 18, 99: -1, 252: 0, 253: 6,
    254: 5, 255: 7, 256: 4, 257: 4, 258: 3, 259: 4,
}
learning_map_inv = {
    -1: 0, 0: 10, 1: 11, 2: 15, 3: 18, 4: 20, 5: 30, 6: 31, 7: 32, 8: 40,
    9: 44, 10: 48, 11: 49, 12: 50, 13: 51, 14: 70, 15: 71, 16: 72, 17: 80,
    18: 81,
}

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v2m2",
        in_channels=4,
        num_classes=19,
        patch_embed_depth=1,
        patch_embed_channels=48,
        patch_embed_groups=6,
        patch_embed_neighbours=8,
        enc_depths=(2, 2, 6, 2),
        enc_channels=(96, 192, 384, 512),
        enc_groups=(12, 24, 48, 64),
        enc_neighbours=(16, 16, 16, 16),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(48, 96, 192, 384),
        dec_groups=(6, 12, 24, 48),
        dec_neighbours=(16, 16, 16, 16),
        grid_sizes=(0.15, 0.375, 0.9375, 2.34375),
        attn_qkv_bias=True,
        pe_multiplier=False,
        pe_bias=True,
        attn_drop_rate=0.0,
        drop_path_rate=0.3,
        unpool_backend="map",
        stage_cap_ratios=(0.35, 0.35, 0.35, 0.35),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
)

epoch = 50
eval_epoch = 50
optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.005)
scheduler = dict(type="OneCycleLR", max_lr=0.002, pct_start=0.04,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=100.0)

dataset_type = "SemanticKITTIDataset"
data_root = "data/semantic_kitti"
names = [
    "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
    "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
]

_train_transform = [
    dict(type="PointClip", point_cloud_range=(-51.2, -51.2, -4, 51.2, 51.2, 2.4)),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         keys=("coord", "strength", "segment"), return_discrete_coord=True),
    dict(type="SphereCrop", point_max=120000, mode="random"),
    dict(type="ToTensor"),
    dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
         feat_keys=("coord", "strength")),
]

data = dict(
    num_classes=19,
    ignore_index=-1,
    names=names,
    train=dict(type=dataset_type, split="train", data_root=data_root,
               learning_map=learning_map, transform=_train_transform,
               test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root,
             learning_map=learning_map,
             transform=[
                 dict(type="PointClip",
                      point_cloud_range=(-51.2, -51.2, -4, 51.2, 51.2, 2.4)),
                 dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                      mode="train", keys=("coord", "strength", "segment"),
                      return_discrete_coord=True),
                 dict(type="SphereCrop", point_max=120000, mode="center"),
                 dict(type="ToTensor"),
                 dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
                      feat_keys=("coord", "strength")),
             ],
             test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root,
              learning_map=learning_map,
              transform=[
                  dict(type="PointClip",
                       point_cloud_range=(-51.2, -51.2, -4, 51.2, 51.2, 2.4)),
              ],
              test_mode=True,
              test_cfg=dict(
                  voxelize=dict(type="GridSample", grid_size=0.05,
                                hash_type="fnv", mode="test",
                                keys=("coord", "strength"),
                                return_discrete_coord=True),
                  crop=None,
                  post_transform=[
                      dict(type="ToTensor"),
                      dict(type="Collect",
                           keys=("coord", "discrete_coord", "index"),
                           feat_keys=("coord", "strength")),
                  ],
                  aug_transform=[
                      [dict(type="RandomScale", scale=[1, 1], anisotropic=True)],
                  ],
              )),
)
