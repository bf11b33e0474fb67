# ScanNet200 benchmark submission: train on train+val, predict test
# (reference: configs/scannet200/semseg-pt-v2m2-1-benchmark-submit.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/scannet200/semseg-pt-v2m2-1-benchmark-submit"
evaluate = False
data = dict(
    train=dict(split=["train", "val"]),
    test=dict(split="test"),
)
