# AO-loop proxy stage B: PP2S weak-label supervised training on the
# s3dis_proxy rooms, consuming the oracle-SAM labels written by
# `tools/pp2s.py --data-root data/ao_proxy --sam-oracle --stage all`
# (reference: configs/s3dis/semseg-pt-v2m2-0-sam.py + train_pp2s.sh over
# the real S3DIS; scale knobs as in semseg-pt-v2m2-1-proxy.py).
_base_ = ["./semseg-pt-v2m2-1-proxy.py"]

save_path = "exp/s3dis/proxy-r4-pp2s"

epoch = 20
eval_epoch = 5

data = dict(
    train=dict(
        weak=True,
        mode="pp2s",
        weak_path="data/ao_proxy/sam_labels",
        loop=10,
    ),
)
