# ScanNet SpUNet fine-tune from MSC pretraining (large batch)
# (reference: configs/scannet/semseg-spunet-v1m1-4-ft.py — identical to
# the base but batch 48; load pretrained weights via
# --options weight=exp/scannet/pretrain-msc-v1m1-0-spunet-base/model/model_last.ckpt)
_base_ = ["semseg-spunet-v1m1-0-base.py"]
save_path = "exp/scannet/semseg-spunet-v1m1-4-ft"
batch_size = 48
