# NuScenes lidarseg (reference: configs/nuscenes/semseg-pt-v2m2-0-base.py)
_base_ = ["../semantic_kitti/semseg-pt-v2m2-0-base.py"]

save_path = "exp/nuscenes/semseg-pt-v2m2-0-base"
dataset_type = "NuScenesDataset"
data_root = "data/nuscenes"

model = dict(backbone=dict(num_classes=16))
names = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation",
]
data = dict(
    num_classes=16,
    names=names,
    train=dict(type=dataset_type, data_root=data_root, learning_map=None),
    val=dict(type=dataset_type, data_root=data_root, learning_map=None),
    test=dict(type=dataset_type, data_root=data_root, learning_map=None),
)
