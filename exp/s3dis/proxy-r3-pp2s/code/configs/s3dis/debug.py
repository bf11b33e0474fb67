# Small debug config: the S3DIS base model on a shortened schedule with
# tiny batches (reference: configs/s3dis/debug.py)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

batch_size = 2
batch_size_val = 1
num_worker = 2
epoch = 2
eval_epoch = 2
