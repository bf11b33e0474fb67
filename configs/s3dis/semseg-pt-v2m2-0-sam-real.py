# REAL: SAM-in-the-loop pseudo-label refinement on S3DIS
# (reference: configs/s3dis/semseg-pt-v2m2-0-sam-final.py + train_real.sh)
_base_ = ["semseg-pt-v2m2-0-base.py"]

# start from the PP2S-trained model (reference train_sam_real.py:585-595)
weight = "exp/s3dis/semseg-pt-v2m2-0-sam-pp2s/model/model_best.ckpt"
save_path = "exp/s3dis/semseg-pt-v2m2-0-sam-real"

epoch = 3000
eval_epoch = 100

real = dict(
    initial_labels="data/sam_labels",
    basket="data/basket_s3dis.pickle",
    data_root="data/s3dis",
    bridge_root="data/bridge",
    embedding_root="data/embeddings",
    sam_checkpoint="SAM_ckpt/sam_vit_h_4b8939.pth",
    sam_model_type="vit_h",
    frame_size=(1080, 1080),
    grid_scale=0.5,
    conf_thresh=0.9,
    # the reference's label-quality curves score Area_1 only
    # (my_evaluate.py:16); list all train areas for the full metric
    eval_areas=("Area_1",),
)

data = dict(
    train=dict(
        weak=True,
        mode="real",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
            dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
            dict(type="ChromaticJitter", p=0.95, std=0.05),
            dict(
                type="GridSample",
                grid_size=0.04,
                hash_type="fnv",
                mode="train",
                keys=("coord", "color", "segment", "instance"),
                return_discrete_coord=True,
            ),
            dict(type="SphereCrop", point_max=80000, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(
                type="Collect",
                # scene_id (full path) disambiguates rooms with the same
                # name across areas in the basket fill
                keys=(
                    "coord", "discrete_coord", "segment", "instance",
                    "name", "scene_id",
                ),
                feat_keys=["coord", "color"],
            ),
        ],
    ),
)
