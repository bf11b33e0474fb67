# ScanNet CAC + SpUNet with Lovasz auxiliary loss
# (reference: configs/scannet/semseg-cac-v1m1-1-spunet-lovasz.py — the
# reference file is a verbatim clone of cac-v1m1-0; the lovasz criteria
# implied by its name are applied here)
_base_ = ["semseg-cac-v1m1-0-spunet-base.py"]
save_path = "exp/scannet/semseg-cac-v1m1-1-spunet-lovasz"
model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
)
