import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.engines.insseg_eval import (
    OVERLAPS,
    ap_scores,
    associate_instances,
    evaluate_matches,
)


def scene_with(pred_masks, pred_classes, pred_scores, segment, instance,
               num_classes=4, names=("wall", "floor", "chair", "table")):
    pred = dict(
        pred_masks=np.asarray(pred_masks, np.uint8),
        pred_classes=np.asarray(pred_classes),
        pred_scores=np.asarray(pred_scores, np.float32),
    )
    gt, pr = associate_instances(
        pred, np.asarray(segment), np.asarray(instance), num_classes, names,
        segment_ignore_index=(-1, 0), min_region_size=10,
    )
    return dict(gt=gt, pred=pr)


class TestInsSegAP:
    def test_perfect_prediction_gets_ap1(self):
        n = 200
        segment = np.full(n, 2)
        instance = np.zeros(n, np.int64)
        instance[100:] = 1
        masks = np.zeros((2, n), np.uint8)
        masks[0, :100] = 1
        masks[1, 100:] = 1
        scene = scene_with(masks, [2, 2], [0.9, 0.8], segment, instance)
        ap = evaluate_matches(
            [scene], ["floor", "chair", "table"], min_region_size=10
        )
        scores = ap_scores(ap, ["floor", "chair", "table"])
        assert scores["all_ap_50"] == pytest.approx(1.0)
        assert scores["classes"]["chair"]["ap"] == pytest.approx(1.0)

    def test_wrong_class_is_fp(self):
        n = 100
        segment = np.full(n, 2)
        instance = np.zeros(n, np.int64)
        masks = np.ones((1, n), np.uint8)
        scene = scene_with(masks, [3], [0.9], segment, instance)  # class wrong
        ap = evaluate_matches(
            [scene], ["floor", "chair", "table"], min_region_size=10
        )
        scores = ap_scores(ap, ["floor", "chair", "table"])
        assert scores["classes"]["chair"]["ap50"] == pytest.approx(0.0)

    def test_half_overlap_passes_25_fails_75(self):
        n = 100
        segment = np.full(n, 2)
        instance = np.zeros(n, np.int64)
        masks = np.zeros((1, n), np.uint8)
        masks[0, :60] = 1  # IoU 0.6 with the single GT instance
        scene = scene_with(masks, [2], [0.9], segment, instance)
        ap = evaluate_matches([scene], ["floor", "chair", "table"],
                              min_region_size=10)
        i25 = int(np.where(np.isclose(OVERLAPS, 0.25))[0][0])
        i50 = int(np.where(np.isclose(OVERLAPS, 0.5))[0][0])
        i75 = int(np.where(np.isclose(OVERLAPS, 0.75))[0][0])
        chair = 1  # index in valid class list
        assert ap[chair, i25] == pytest.approx(1.0)
        assert ap[chair, i50] == pytest.approx(1.0)
        assert ap[chair, i75] == pytest.approx(0.0)

    def test_missed_instance_halves_recall(self):
        n = 200
        segment = np.full(n, 2)
        instance = np.zeros(n, np.int64)
        instance[100:] = 1
        masks = np.zeros((1, n), np.uint8)
        masks[0, :100] = 1  # only predicts instance 0
        scene = scene_with(masks, [2], [0.9], segment, instance)
        ap = evaluate_matches([scene], ["floor", "chair", "table"],
                              min_region_size=10)
        i50 = int(np.where(np.isclose(OVERLAPS, 0.5))[0][0])
        assert 0.4 < ap[1, i50] < 0.6  # precision 1, recall 0.5

    def test_void_heavy_prediction_ignored(self):
        n = 100
        segment = np.full(n, -1)  # all void
        segment[:20] = 2
        instance = np.full(n, -1, np.int64)
        instance[:20] = 0
        masks = np.ones((1, n), np.uint8)  # mostly covers void
        scene = scene_with(masks, [2], [0.9], segment, instance)
        ap = evaluate_matches([scene], ["floor", "chair", "table"],
                              min_region_size=10)
        i25 = int(np.where(np.isclose(OVERLAPS, 0.25))[0][0])
        # prediction isn't an FP (80% void), and it matches GT at IoU 0.2 ->
        # fails 0.25 but is void-ignored, so AP@25 is 0 w/ hard FN... the GT
        # goes unmatched -> recall 0 -> ap 0
        assert ap[1, i25] == pytest.approx(0.0)


@pytest.mark.slow
class TestPartSegTesterTTA:
    """PartSegTester votes softmax over TTA views and conditions the
    forward on the shape category (reference test.py:316-410)."""

    def _make_fixture(self, root):
        import json

        os.makedirs(os.path.join(root, "train_test_split"), exist_ok=True)
        with open(os.path.join(root, "synsetoffset2category.txt"), "w") as f:
            f.write("Airplane\t02691156\nBag\t02773838\n")
        g = np.random.default_rng(0)
        rel = []
        for token, parts in (("02691156", [0, 1]), ("02773838", [4, 5])):
            os.makedirs(os.path.join(root, token), exist_ok=True)
            pts = np.concatenate(
                [
                    g.uniform(0, 1, (384, 3)),
                    g.normal(size=(384, 3)),
                    g.choice(parts, (384, 1)).astype(float),
                ],
                axis=1,
            )
            name = f"shape_{token}"
            np.savetxt(os.path.join(root, token, name + ".txt"), pts)
            rel.append(f"shape_data/{token}/{name}")
        with open(
            os.path.join(root, "train_test_split",
                         "shuffled_test_file_list.json"), "w"
        ) as f:
            json.dump(rel, f)

    def test_votes_over_views(self, tmp_path):
        from ao_tpu.engines.test import TEST
        from ao_tpu.models import build_model
        from ao_tpu.utils.config import Config

        root = str(tmp_path / "shapenet")
        self._make_fixture(root)
        cfg = Config(
            dict(
                save_path=str(tmp_path / "exp"),
                pad_multiple=128,
                data=dict(
                    num_classes=50,
                    ignore_index=-1,
                    test=dict(
                        type="ShapeNetPartDataset",
                        split="test",
                        data_root=root,
                        transform=[],
                        test_mode=True,
                        test_cfg=dict(
                            voxelize=None,
                            crop=None,
                            post_transform=[
                                dict(type="ToTensor"),
                                dict(type="Collect", keys=("coord", "index"),
                                     feat_keys=("coord", "normal")),
                            ],
                            aug_transform=[
                                [dict(type="RandomScale", scale=[0.9, 0.9])],
                                [dict(type="RandomScale", scale=[1.1, 1.1])],
                            ],
                        ),
                    ),
                ),
                model=dict(
                    type="DefaultSegmentor",
                    backbone=dict(type="PointTransformer-PartSeg26",
                                  in_channels=6, num_classes=50,
                                  num_shape_classes=16),
                ),
            )
        )
        os.makedirs(cfg.save_path, exist_ok=True)
        model = build_model(dict(cfg.model))
        coord = jnp.zeros((1, 512, 3))
        feat = jnp.zeros((1, 512, 6))
        mask = jnp.ones((1, 512), bool)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, coord, feat, mask,
            category=jnp.zeros((1,), jnp.int32),
        )

        tester = TEST.build(dict(type="PartSegTester", verbose=False))

        class _T:
            pass

        t = _T()
        t.model = model
        t.state = _T()
        t.state.params = variables["params"]
        t.state.batch_stats = variables.get("batch_stats", {})
        t.cfg = cfg
        tester.trainer = t
        res = tester()
        assert 0.0 <= res["ins_mIoU"] <= 1.0
        assert 0.0 <= res["cat_mIoU"] <= 1.0


def test_semseg_tester_batched_fragment_voting_matches_serial():
    """vote_fragments with fb>1 must produce exactly the same accumulator
    as fragment-at-a-time voting (fb=1) — batching is a pure perf change."""
    import jax
    import numpy as np

    from ao_tpu.engines.test import SemSegTester

    rng = np.random.RandomState(0)
    n, K = 300, 5
    frags = []
    for i in range(5):
        m = int(rng.randint(40, 80))
        idx = rng.choice(n, m, replace=False)
        frags.append(dict(
            index=idx,
            coord=rng.rand(m, 3).astype(np.float32),
            feat=rng.rand(m, 6).astype(np.float32),
        ))

    tester = SemSegTester.__new__(SemSegTester)

    def fake_forward(coord, feat, mask, category=None):
        # deterministic per-point pseudo-logits from the features
        w = np.arange(1, 6 * K + 1, dtype=np.float32).reshape(6, K) / 10.0
        return jax.numpy.asarray(np.asarray(feat) @ w)

    tester.forward = fake_forward
    serial = tester.vote_fragments(frags, n, K, pad_multiple=32, fb=1)
    batched = tester.vote_fragments(frags, n, K, pad_multiple=32, fb=3)
    np.testing.assert_allclose(serial, batched, rtol=0, atol=1e-6)
    assert np.abs(serial).sum() > 0
