import os

import numpy as np
import pytest

from ao_tpu.utils import Config, Registry, EventStorage
from ao_tpu.utils.config import DictAction
from ao_tpu.utils.registry import build_from_cfg


def test_registry_basic():
    reg = Registry("things")

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    assert "Foo" in reg
    obj = build_from_cfg({"type": "Foo", "a": 1}, reg)
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        reg.register_module(module=Foo)  # duplicate
    reg.register_module(name="Foo2", module=Foo)
    assert reg.get("Foo2") is Foo


def test_registry_parent():
    parent = Registry("parent")
    child = Registry("child", parent=parent)
    parent.register_module(name="P", module=dict)
    assert child.get("P") is dict


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("a = 1\nmodel = dict(type='M', depth=2, width=3)\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['base.py']\n"
        "model = dict(width=7)\n"
        "b = 'x'\n"
    )
    cfg = Config.fromfile(str(child))
    assert cfg.a == 1
    assert cfg.b == "x"
    assert cfg.model.type == "M" and cfg.model.depth == 2 and cfg.model.width == 7


def test_config_delete_semantics(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='M', depth=2)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\nmodel = dict(_delete_=True, type='N')\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model) == {
        "type": "N"
    }
    assert "depth" not in cfg.model


def test_config_merge_from_dict(tmp_path):
    f = tmp_path / "c.py"
    f.write_text("model = dict(lr=0.1, opt=dict(name='sgd'))\nsave_path = None\n")
    cfg = Config.fromfile(str(f))
    cfg.merge_from_dict({"model.opt.name": "adam", "save_path": "/tmp/x"})
    assert cfg.model.opt.name == "adam"
    assert cfg.save_path == "/tmp/x"


def test_config_dump_roundtrip(tmp_path):
    f = tmp_path / "c.py"
    f.write_text("a = dict(b=[1, 2], c=(3, 4))\nname = 'hello'\n")
    cfg = Config.fromfile(str(f))
    out = tmp_path / "dumped.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.a.b == [1, 2]
    assert cfg2.name == "hello"


def test_dict_action_parsing():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--options", nargs="+", action=DictAction)
    ns = p.parse_args(["--options", "a.b=3", "c=true", "d=hello", "e=[1,2]"])
    assert ns.options == {"a.b": 3, "c": True, "d": "hello", "e": [1, 2]}


def test_event_storage():
    with EventStorage(start_iter=5) as storage:
        storage.put_scalar("loss", 1.0)
        storage.step()
        storage.put_scalar("loss", 3.0)
        h = storage.history("loss")
        assert h.latest() == 3.0
        assert h.avg(2) == 2.0
        assert storage.iter == 6


def test_intersection_and_union():
    from ao_tpu.utils.misc import intersection_and_union, intersection_and_union_jax

    pred = np.array([0, 1, 2, 2, 1, 0])
    gt = np.array([0, 1, 1, 2, -1, 0])
    i, u, t = intersection_and_union(pred, gt, K=3, ignore_index=-1)
    assert i.tolist() == [2, 1, 1]
    assert t.tolist() == [2, 2, 1]

    ij, uj, tj = intersection_and_union_jax(
        np.asarray(pred), np.asarray(gt), K=3, ignore_index=-1
    )
    np.testing.assert_array_equal(np.asarray(ij), i)
    np.testing.assert_array_equal(np.asarray(uj), u)
    np.testing.assert_array_equal(np.asarray(tj), t)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from ao_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

    state = {"params": {"w": jnp.arange(4.0), "b": jnp.zeros(2)}, "step": 7}
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, meta={"epoch": 3})
    restored, meta = load_checkpoint(path, target_state=state)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(4.0))
    assert not os.path.exists(path + ".tmp")


def test_schedulers_finite_over_range():
    """Every registered scheduler must return finite lr at every step —
    including degenerate short runs (regression: OneCycleLR's warmup
    boundary floored to a zero-length interval -> nan lr)."""
    from ao_tpu.utils.scheduler import build_scheduler

    cfgs = [
        dict(type="MultiStepLR", milestones=[0.6, 0.8]),
        dict(type="MultiStepWithWarmupLR", milestones=[0.6, 0.8]),
        dict(type="PolyLR"),
        dict(type="ExpLR"),
        dict(type="CosineAnnealingLR"),
        dict(type="OneCycleLR", max_lr=0.1, pct_start=0.05),
    ]
    for total_steps in (1, 2, 4, 1000):
        for cfg in cfgs:
            sched = build_scheduler(dict(cfg), base_lr=0.01,
                                    total_steps=total_steps)
            lrs = np.asarray([sched(s) for s in range(total_steps)])
            assert np.all(np.isfinite(lrs)), (cfg["type"], total_steps, lrs)
            assert np.all(lrs > 0), (cfg["type"], total_steps, lrs)


def test_onecycle_shape():
    from ao_tpu.utils.scheduler import build_scheduler

    sched = build_scheduler(
        dict(type="OneCycleLR", max_lr=0.1, pct_start=0.1),
        base_lr=0.01, total_steps=100,
    )
    lrs = np.asarray([sched(s) for s in range(100)])
    peak = int(np.argmax(lrs))
    assert 5 <= peak <= 15  # warmup ends near pct_start * total_steps
    assert abs(lrs[peak] - 0.1) < 1e-3
    assert lrs[-1] < lrs[0]  # final lr far below initial


def test_all_configs_load_and_models_build():
    """Every shipped config must parse and its model must construct (the
    registry-level sanity the reference gets from full training runs)."""
    import glob
    import os

    from ao_tpu.models import build_model
    from ao_tpu.utils.config import Config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = sorted(glob.glob(os.path.join(repo, "configs", "*", "*.py")))
    configs = [c for c in configs if "_base_" not in c]
    assert len(configs) >= 30
    for path in configs:
        cfg = Config.fromfile(path)
        assert cfg.get("model") is not None, path
        assert cfg.get("data") is not None or cfg.get("evaluate") is False, path
        model = build_model(dict(cfg.model))
        assert model is not None, path
