# S3DIS PT-v2m1 (grouped-linear weight encoding, pe_multiplier on,
# interp unpooling)
# (reference: configs/s3dis/semseg-pt-v2m1-0-base.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/s3dis/semseg-pt-v2m1-0-base"
model = dict(
    backbone=dict(
        type="PT-v2m1",
        pe_multiplier=True,
        unpool_backend="interp",
    ),
)
scheduler = dict(type="MultiStepLR", milestones=[0.6, 0.8], gamma=0.1)
