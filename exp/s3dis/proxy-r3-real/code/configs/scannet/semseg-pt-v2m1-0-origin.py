# ScanNet PT-v2m1 (grouped-linear weight encoding, pe_multiplier on)
# (reference: configs/scannet/semseg-pt-v2m1-0-origin.py)
_base_ = ["semseg-pt-v2m2-0-base.py"]
save_path = "exp/scannet/semseg-pt-v2m1-0-origin"
model = dict(
    backbone=dict(
        type="PT-v2m1",
        pe_multiplier=True,
    ),
)
