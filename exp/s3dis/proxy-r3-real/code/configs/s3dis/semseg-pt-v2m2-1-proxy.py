# S3DIS-proxy end-to-end training proof (VERDICT.md round-1 item #1).
#
# Same model/transform/optimizer stack as semseg-pt-v2m2-0-base, run on the
# procedurally generated s3dis_proxy dataset (tools/make_s3dis_proxy.py:
# the build environment ships no real S3DIS download, so the densest
# feasible proxy is used — see that file's docstring). Differences from
# the base config are ONLY scale knobs for a single-chip run:
#   * batch_size 3 = the reference's per-GPU batch (12 across 4 GPUs,
#     reference configs/s3dis/semseg-pt-v2m2-0-base.py:3)
#   * shortened schedule: 20 eval epochs x loop 15 over 60 rooms
#     (reference: 100 x 30 over 204 rooms)
_base_ = ["./semseg-pt-v2m2-0-base.py"]

batch_size = 3
batch_size_val = 1
num_worker = 4

epoch = 300
eval_epoch = 20

data_root = "data/s3dis_proxy"
data = dict(
    train=dict(data_root=data_root),
    val=dict(data_root=data_root),
    test=dict(data_root=data_root),
)
