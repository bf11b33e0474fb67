# Global runtime defaults (reference: configs/_base_/default_runtime.py)
weight = None  # checkpoint to load
resume = False  # resume training (epoch/optimizer state)
evaluate = True  # per-epoch evaluation
test_only = False

seed = None  # random if None
save_path = "exp/default"
num_worker = 8  # data-prep worker threads (total across processes)
batch_size = 16  # GLOBAL batch size (sharded over the data mesh axis)
batch_size_val = None
batch_size_test = None
epoch = 100  # total epochs (dataset loops epoch // eval_epoch per mega-epoch)
eval_epoch = 100  # number of mega-epochs (evaluation points)

# TPU batching: samples pad to a multiple of this (bounds compiled shapes)
pad_multiple = 4096
max_points = None  # hard cap on padded points per sample

mix_prob = 0
param_dicts = None

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]

test = dict(type="SemSegTester", verbose=True)
