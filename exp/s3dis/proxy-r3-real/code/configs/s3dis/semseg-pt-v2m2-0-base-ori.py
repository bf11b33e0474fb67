# S3DIS PT-v2m2 "ori" schedule
# (reference: configs/s3dis/semseg-pt-v2m2-0-base-ori.py — a clone of the
# base config kept for provenance; identical here via inheritance)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/s3dis/semseg-pt-v2m2-0-base-ori"
