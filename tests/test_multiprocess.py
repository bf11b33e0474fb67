"""Two-process distributed correctness (VERDICT r1 item #6).

Spawns two real OS processes connected via jax.distributed (CPU backend,
2 virtual devices each) and runs the full Trainer: sharded global batches
(put_batch's make_array_from_process_local_data path), the jitted global
metric reduction, the origin-coord host re-projection with cross-process
all-reduce, checkpointing, and a REAL-style basket gather. The reference
only ever exercised its distributed paths in full 4-GPU runs
(SURVEY.md §4.5); this is the fake-backend test it lacked.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_eval_gather(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"rank{r}.json") for r in range(2)]
    procs = []
    for r in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_COORDINATOR_ADDRESS"] = ""
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 str(r), "2", str(port), outs[r],
                 str(tmp_path / f"exp{r}")],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        logs.append(out.decode(errors="replace"))
    for r, p in enumerate(procs):
        assert p.returncode == 0, f"rank {r} failed:\n{logs[r][-4000:]}"

    results = [json.load(open(o)) for o in outs]
    # the loss and the evaluator's mIoU are global quantities: every
    # process must report the identical value
    assert results[0]["final_loss"] == pytest.approx(
        results[1]["final_loss"], rel=1e-5
    )
    assert results[0]["miou"] == pytest.approx(results[1]["miou"], rel=1e-5)
    assert results[0]["miou"] is not None
    # the basket gather merged both processes' scenes everywhere
    for r in results:
        assert r["merged_keys"] == ["scene_rank0", "scene_rank1"]
    # rank 0 checkpointed; rank 1 must not have (its own exp dir is empty)
    assert results[0]["ckpt_exists"]
    assert not results[1]["ckpt_exists"]
