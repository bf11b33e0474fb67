"""Worker for the 2-process CPU distributed test (tests/test_multiprocess.py).

Runs the REAL Trainer end-to-end under jax.distributed with 2 processes x
2 virtual CPU devices: sharded train steps (make_array_from_process_local_data
path in Trainer.put_batch), the SemSegEvaluator with the origin-coord
host re-projection (cross-process histogram all-reduce), checkpointing,
and a REAL-style basket merge over comm.gather. Writes a JSON summary the
parent test compares across ranks.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    outfile = sys.argv[4]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=rank,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == 2 * num_processes

    import numpy as np

    from ao_tpu.engines.train import Trainer
    from ao_tpu.utils import comm
    from ao_tpu.utils.config import Config

    val_transform = [
        dict(type="Copy",
             keys_dict={"coord": "origin_coord", "segment": "origin_segment"}),
        dict(type="GridSample", grid_size=0.2, hash_type="fnv", mode="train",
             keys=("coord", "color", "segment"), return_discrete_coord=True),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect",
             keys=("coord", "discrete_coord", "segment",
                   "origin_coord", "origin_segment"),
             feat_keys=("coord", "color")),
    ]
    train_transform = [
        dict(type="GridSample", grid_size=0.2, hash_type="fnv", mode="train",
             keys=("coord", "color", "segment"), return_discrete_coord=True),
        dict(type="NormalizeColor"),
        dict(type="ToTensor"),
        dict(type="Collect", keys=("coord", "discrete_coord", "segment"),
             feat_keys=("coord", "color")),
    ]
    backbone = dict(
        type="PT-v2m2", in_channels=6, num_classes=5,
        patch_embed_depth=1, patch_embed_channels=8, patch_embed_groups=2,
        patch_embed_neighbours=8, enc_depths=(1,), enc_channels=(16,),
        enc_groups=(4,), enc_neighbours=(8,), dec_depths=(1,),
        dec_channels=(8,), dec_groups=(2,), dec_neighbours=(8,),
        grid_sizes=(0.5,), stage_cap_ratios=(1.0,), unpool_backend="map",
    )
    cfg = Config(dict(
        save_path=sys.argv[5],
        seed=7,
        batch_size=2,  # global; 1 per process
        batch_size_val=2,
        num_worker=2,
        epoch=1,
        eval_epoch=1,
        evaluate=True,
        mix_prob=0,
        pad_multiple=256,
        max_points=512,
        model=dict(
            type="DefaultSegmentor", backbone=backbone,
            criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
        ),
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        scheduler=dict(type="PolyLR"),
        hooks=[
            dict(type="IterationTimer", warmup_iter=1),
            dict(type="InformationWriter"),
            dict(type="SemSegEvaluator"),
            dict(type="CheckpointSaver", save_freq=None),
        ],
        data=dict(
            num_classes=5,
            ignore_index=-1,
            names=[f"c{i}" for i in range(5)],
            train=dict(type="SyntheticDataset", split="train", num_scenes=4,
                       num_points=512, num_classes=5,
                       transform=train_transform),
            val=dict(type="SyntheticDataset", split="val", num_scenes=2,
                     num_points=512, num_classes=5,
                     transform=val_transform),
        ),
    ))
    trainer = Trainer(cfg)
    trainer.train()

    # REAL-style basket merge: each process contributes its scenes
    basket = {f"scene_rank{rank}": np.full((4, 5), rank, np.float32)}
    merged = {}
    for part in comm.all_gather(basket):
        merged.update(part)

    result = dict(
        rank=rank,
        final_loss=trainer.comm_info["loss_dict"]["loss"],
        miou=trainer.comm_info.get("current_metric_value"),
        merged_keys=sorted(merged.keys()),
        ckpt_exists=os.path.isfile(
            os.path.join(cfg.save_path, "model", "model_last.ckpt")
        ),
    )
    with open(outfile, "w") as f:
        json.dump(result, f)
    print("WORKER_DONE", rank)


if __name__ == "__main__":
    main()
