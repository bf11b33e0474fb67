# AO-loop proxy stage B: PP2S weak-label supervised training on the
# s3dis_proxy rooms, consuming the oracle-SAM labels written by
# `tools/pp2s.py --data-root data/ao_proxy --sam-oracle --stage all`
# (reference: configs/s3dis/semseg-pt-v2m2-0-sam.py + train_pp2s.sh over
# the real S3DIS; scale knobs as in semseg-pt-v2m2-1-proxy.py).
_base_ = ["./semseg-pt-v2m2-1-proxy.py"]

save_path = "exp/s3dis/proxy-r5-pp2s"

# 48 epochs: at 20 the model was still climbing (0.2585 -> 0.2794 over
# the last four evals) and the REAL loop can only lift labels when the
# model is clearly better than the 0.258-mIoU labels it starts from.
epoch = 48
eval_epoch = 8

data = dict(
    train=dict(
        weak=True,
        mode="pp2s",
        weak_path="data/ao_proxy/sam_labels",
        loop=10,
    ),
)
