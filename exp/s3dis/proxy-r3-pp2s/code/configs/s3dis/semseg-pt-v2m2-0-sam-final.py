# S3DIS REAL final refinement: no Mix3D during the SAM-in-the-loop stage
# (reference: configs/s3dis/semseg-pt-v2m2-0-sam-final.py — the released
# setting; mix_prob 0 vs the sam draft)
_base_ = ["semseg-pt-v2m2-0-sam-real.py"]
save_path = "exp/s3dis/semseg-pt-v2m2-0-sam-final"
mix_prob = 0
