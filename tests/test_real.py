"""REAL loop tests: unit tests for prompt mining / mask voting, plus a
synthetic end-to-end epoch (tiny PT-v2 + tiny SAM + fabricated scenes,
bridges, embeddings, basket)."""

import os
import pickle

import numpy as np
import pytest

from ao_tpu.engines.train_real import grid_prompt_search, vote_masks_for_frame


class TestGridPromptSearch:
    def test_picks_max_conf_incognita_per_cell_class(self):
        # 4 points in one 0.5m cell, all predicted class 2, labels disagree
        coord = np.array(
            [[0.1, 0.1, 0], [0.2, 0.2, 0], [0.3, 0.1, 0], [0.2, 0.3, 0]],
            np.float32,
        )
        seg_pred = np.array([2, 2, 2, 2])
        conf = np.array([0.95, 0.99, 0.92, 0.5])
        sam_label = np.array([0, 0, 2, 0])  # idx 2 agrees -> not incognita
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([2])
        )
        assert idx.tolist() == [1]  # max conf among {0, 1, 3} above 0.9
        assert cls.tolist() == [2]

    def test_confidence_threshold(self):
        coord = np.zeros((3, 3), np.float32)
        seg_pred = np.array([1, 1, 1])
        conf = np.array([0.5, 0.6, 0.7])
        sam_label = np.array([0, 0, 0])
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([1])
        )
        assert idx.size == 0

    def test_query_ablation_drops_disagreement_requirement(self):
        """train_sam_final_query_abl.py:370-375: the ablation prompts the
        max-confidence point of a class even when its current label
        already agrees (threshold 0.95)."""
        coord = np.array(
            [[0.1, 0.1, 0], [0.2, 0.2, 0], [0.3, 0.1, 0]], np.float32
        )
        seg_pred = np.array([2, 2, 2])
        conf = np.array([0.97, 0.99, 0.96])
        sam_label = np.array([2, 2, 2])  # all agree: incognita empty
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([2])
        )
        assert idx.size == 0  # release behaviour: nothing to prompt
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([2]),
            conf_thresh=0.95, require_disagreement=False,
        )
        assert idx.tolist() == [1]
        assert cls.tolist() == [2]

    def test_absent_class_ignored(self):
        coord = np.zeros((2, 3), np.float32)
        seg_pred = np.array([3, 3])
        conf = np.array([0.99, 0.99])
        sam_label = np.array([0, 0])
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([1, 2])
        )
        assert idx.size == 0

    def test_separate_cells(self):
        coord = np.array([[0.1, 0.1, 0], [5.0, 5.0, 0]], np.float32)
        seg_pred = np.array([1, 1])
        conf = np.array([0.95, 0.97])
        sam_label = np.array([0, 0])
        idx, cls = grid_prompt_search(
            coord, seg_pred, conf, sam_label, np.array([1])
        )
        assert sorted(idx.tolist()) == [0, 1]  # one prompt per cell


class TestVoteMasks:
    def test_mode_verification(self):
        n, C = 6, 4
        bridge = np.zeros((n, 3), np.uint16)
        bridge[:4, 0] = [2, 3, 4, 8]  # u (point 3 outside the mask)
        bridge[:4, 1] = [2, 3, 4, 8]  # v
        bridge[:4, 2] = 1
        masks = np.zeros((1, 10, 10), bool)
        masks[0, 1:5, 1:5] = True  # covers points 0..2 at (v-1, u-1)
        seg_pred = np.array([1, 1, 1, 2, 0, 0])
        conf = np.array([0.95, 0.95, 0.95, 0.95, 0.1, 0.1])
        vote = np.zeros((n, C), np.int32)
        vote_masks_for_frame(masks, np.array([1]), bridge, seg_pred, conf, vote)
        # mask covers visible points 0,1,2 (mode of their high-conf preds =
        # 1 == prompt class) -> votes
        assert vote[0, 1] == 1 and vote[1, 1] == 1 and vote[2, 1] == 1
        assert vote[3].sum() == 0

    def test_mode_mismatch_rejects(self):
        n, C = 3, 4
        bridge = np.zeros((n, 3), np.uint16)
        bridge[:, 0] = [2, 3, 4]
        bridge[:, 1] = [2, 3, 4]
        bridge[:, 2] = 1
        masks = np.ones((1, 10, 10), bool)
        seg_pred = np.array([2, 2, 2])
        conf = np.array([0.95, 0.95, 0.95])
        vote = np.zeros((n, C), np.int32)
        vote_masks_for_frame(masks, np.array([1]), bridge, seg_pred, conf, vote)
        assert vote.sum() == 0  # mode 2 != prompt class 1


@pytest.fixture
def real_workspace(tmp_path, rng):
    """Fabricate an S3DIS-like workspace: scenes, labels, bridges,
    embeddings, basket."""
    import jax
    import jax.numpy as jnp

    from ao_tpu.models.sam import SamConfig, SamModel, SamPredictor
    from ao_tpu.pp2s import compute_bridge, render_depth_map
    from tests.test_pp2s import make_camera

    area, rooms = "Area_T", ["room_1", "room_2"]
    n = 600
    data_root = tmp_path / "s3dis"
    labels_root = tmp_path / "sam_labels"
    bridge_root = tmp_path / "bridge"
    emb_root = tmp_path / "embeddings"

    cfg = SamConfig.tiny()
    model = SamModel(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 1, 1, 2)),
        jnp.zeros((1, 1, 1), jnp.int32), True,
    )
    predictor = SamPredictor(cfg, variables)

    basket = {}
    for room in rooms:
        coord = rng.uniform(1.0, 4.0, size=(n, 3)).astype(np.float32)
        color = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
        segment = rng.integers(0, 5, size=n).astype(np.int64)
        instance = rng.integers(0, 10, size=n).astype(np.int64)
        os.makedirs(data_root / area, exist_ok=True)
        np.savez(
            data_root / area / f"{room}.npz",
            coord=coord, color=color, semantic_gt=segment,
            instance_gt=instance,
        )
        os.makedirs(labels_root / area, exist_ok=True)
        # initial pseudo-labels: mostly -1 with some noise
        labels = -np.ones(n, np.int32)
        labels[::3] = segment[::3]
        np.save(labels_root / area / f"{room}.npy", labels.reshape(-1, 1))

        k, rt = make_camera([0, 2.5, 2.5], size=64)
        depth = render_depth_map(coord, k, rt, (64, 64))
        bridge = compute_bridge(coord, k, rt, depth)
        os.makedirs(bridge_root / area / room, exist_ok=True)
        np.save(bridge_root / area / room / "frame0.npy", bridge)

        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        feats = predictor.set_image(img)
        os.makedirs(emb_root / area / room, exist_ok=True)
        np.savez(
            emb_root / area / room / "frame0.npz",
            features=np.asarray(feats[0]),
        )
        basket[f"{area}/{room}"] = np.full((n, 5), -100.0, np.float32)

    basket_path = tmp_path / "basket.pickle"
    with open(basket_path, "wb") as f:
        pickle.dump(basket, f)
    return dict(
        tmp=tmp_path, area=area, rooms=rooms, n=n, predictor=predictor,
        basket_path=str(basket_path),
    )


@pytest.mark.slow
class TestRealEndToEnd:
    def test_one_epoch(self, real_workspace, tmp_path):
        from ao_tpu.utils.config import Config
        from ao_tpu.engines.train_real import RealTrainer

        ws = real_workspace
        save_path = str(tmp_path / "exp")
        cfg = Config(
            dict(
                save_path=save_path,
                seed=7,
                batch_size=2,
                num_worker=2,
                epoch=1,
                eval_epoch=1,
                evaluate=False,
                pad_multiple=512,
                mix_prob=0,
                model=dict(
                    type="DefaultSegmentor",
                    backbone=dict(
                        type="PT-v2m2", in_channels=6, num_classes=5,
                        patch_embed_depth=1, patch_embed_channels=8,
                        patch_embed_groups=2, patch_embed_neighbours=8,
                        enc_depths=(1,), enc_channels=(16,), enc_groups=(2,),
                        enc_neighbours=(8,), dec_depths=(1,),
                        dec_channels=(8,), dec_groups=(2,),
                        dec_neighbours=(8,), grid_sizes=(0.4,),
                        stage_cap_ratios=(1.0,), unpool_backend="map",
                    ),
                    criteria=[dict(type="CrossEntropyLoss", ignore_index=-1)],
                ),
                optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
                scheduler=dict(type="MultiStepLR", milestones=[0.8]),
                hooks=[
                    dict(type="IterationTimer"),
                    dict(type="InformationWriter"),
                ],
                real=dict(
                    initial_labels=str(ws["tmp"] / "sam_labels"),
                    basket=ws["basket_path"],
                    data_root=str(ws["tmp"] / "s3dis"),
                    bridge_root=str(ws["tmp"] / "bridge"),
                    embedding_root=str(ws["tmp"] / "embeddings"),
                    frame_size=(64, 64),
                    conf_thresh=0.05,  # tiny model: low bar so voting runs
                    eval_areas=("Area_T",),
                ),
                data=dict(
                    num_classes=5,
                    ignore_index=-1,
                    names=[f"c{i}" for i in range(5)],
                    train=dict(
                        type="S3DISDataset",
                        split=(ws["area"],),
                        data_root=str(ws["tmp"] / "s3dis"),
                        transform=[
                            dict(type="CenterShift", apply_z=True),
                            dict(type="NormalizeColor"),
                            dict(type="ToTensor"),
                            dict(
                                type="Collect",
                                keys=("coord", "segment", "instance", "name"),
                                feat_keys=["coord", "color"],
                            ),
                        ],
                        test_mode=False,
                    ),
                ),
            )
        )
        trainer = RealTrainer(cfg)
        trainer.set_predictor(ws["predictor"])
        trainer.train()

        # the basket was reset after refinement
        assert all((v == -100).all() for v in trainer.basket.values())
        # labels on the fly exist and are valid
        for room in ws["rooms"]:
            lab = np.load(
                os.path.join(save_path, "sam_labels_on_the_fly", ws["area"],
                             f"{room}.npy")
            ).reshape(-1)
            assert lab.shape[0] == ws["n"]
            assert set(np.unique(lab)).issubset(set(range(-1, 5)))
        # training log reports refinement metrics
        log = open(os.path.join(save_path, "train.log")).read()
        assert "REAL refinement" in log
