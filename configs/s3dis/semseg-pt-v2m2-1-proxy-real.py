# AO-loop proxy stage C: REAL SAM-in-the-loop refinement on the proxy
# rooms, starting from the PP2S-trained model and the pipeline artifacts
# under data/ao_proxy (reference: train_sam_real.py:222-582 over real
# S3DIS; here the frames are the 512^2 rendered views and the masks come
# from the oracle SAM — models/sam/oracle.py — since this environment
# ships no SAM checkpoint).
_base_ = ["./semseg-pt-v2m2-1-proxy.py"]

weight = "exp/s3dis/proxy-r4-pp2s/model/model_best.ckpt"
save_path = "exp/s3dis/proxy-r4-real"

# refinement runs after every mega-epoch (max_epoch = eval_epoch) ->
# 8 sam_label/* curve points; loop = epoch // eval_epoch = 3
epoch = 24
eval_epoch = 8

real = dict(
    initial_labels="data/ao_proxy/sam_labels",
    basket="data/ao_proxy/basket_s3dis.pickle",
    data_root="data/ao_proxy/s3dis",
    bridge_root="data/ao_proxy/bridge",
    embedding_root="data/ao_proxy/embeddings",
    sam_oracle=True,
    oracle_quality=0.85,
    frame_size=(512, 512),
    grid_scale=0.5,
    conf_thresh=0.9,
    sam_frame_batch=4,
    eval_areas=("Area_1",),
)

data = dict(
    train=dict(weak=True, mode="real"),
)
