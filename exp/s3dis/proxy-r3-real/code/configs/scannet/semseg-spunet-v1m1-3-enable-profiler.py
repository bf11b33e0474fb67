# SpUNet with the runtime profiler hooks enabled
# (reference: configs/scannet/semseg-spunet-v1m1-3-enable-profiler.py)
_base_ = ["./semseg-spunet-v1m1-0-base.py"]

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="RuntimeProfiler", warm_up=2, profile_steps=3),
]
