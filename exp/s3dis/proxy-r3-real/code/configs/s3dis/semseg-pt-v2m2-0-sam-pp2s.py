# PP2S-label supervised training on S3DIS
# (reference: configs/s3dis/semseg-pt-v2m2-0-sam.py + train_pp2s.sh)
_base_ = ["semseg-pt-v2m2-0-base.py"]

save_path = "exp/s3dis/semseg-pt-v2m2-0-sam-pp2s"

data = dict(
    train=dict(
        weak=True,
        mode="pp2s",
        weak_path="data/sam_labels",
    ),
)
