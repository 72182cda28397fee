"""Checkpoint/resume + LR schedules (round-1 verdict next item #5):
kill-and-resume must reproduce the uninterrupted loss curve."""

import re

import numpy as np
import pytest

from boda_tpu.cli import main
from boda_tpu.parallel.checkpoint import load_checkpoint, save_checkpoint
from boda_tpu.parallel.schedules import make_lr_schedule

REC = "testdata/lmdb/cifar_mini.rec"


def test_lr_schedules():
    const = make_lr_schedule("const", 0.1)
    assert float(const(0)) == pytest.approx(0.1)
    assert float(const(100)) == pytest.approx(0.1)
    step = make_lr_schedule("step", 0.1, gamma=0.5, step_size=10)
    assert float(step(0)) == pytest.approx(0.1)
    assert float(step(10)) == pytest.approx(0.05)
    assert float(step(25)) == pytest.approx(0.025)
    cos = make_lr_schedule("cosine", 0.1, total_steps=100, warmup_steps=10)
    assert float(cos(0)) == pytest.approx(0.01)      # warmup: 0.1 * 1/10
    assert float(cos(9)) == pytest.approx(0.1)       # warmup done
    assert float(cos(10)) == pytest.approx(0.1)      # cosine start
    assert float(cos(55)) == pytest.approx(0.05, abs=5e-3)  # midpoint
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(ValueError):
        make_lr_schedule("nope", 0.1)
    with pytest.raises(ValueError):
        make_lr_schedule("cosine", 0.1)  # needs total_steps


def test_checkpoint_roundtrip_bf16(tmp_path):
    import jax.numpy as jnp
    fn = str(tmp_path / "ck.npz")
    w = {"a__filts": np.arange(6, dtype=np.float32).reshape(2, 3),
         "b__filts": np.asarray(jnp.asarray([1.5, 2.5], jnp.bfloat16))}
    m = {"a__filts": np.ones((2, 3), np.float32)}
    save_checkpoint(fn, 7, w, m)
    step, w2, m2 = load_checkpoint(fn)
    assert step == 7
    assert np.array_equal(w2["a__filts"], w["a__filts"])
    assert w2["b__filts"].dtype.name == "bfloat16"
    assert np.array_equal(w2["b__filts"].astype(np.float32), [1.5, 2.5])
    assert np.array_equal(m2["a__filts"], m["a__filts"])
    # no-momentum checkpoint
    save_checkpoint(fn, 3, w, None)
    step, _, m3 = load_checkpoint(fn)
    assert step == 3 and m3 is None


def _losses(out: str) -> dict[int, float]:
    return {int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"step (\d+): loss ([\d.eE+-]+)", out)}


def test_kill_and_resume_reproduces_loss_curve(tmp_path, capsys):
    common = [f"--rec-fn={REC}", "--model=mini_resnet", "--img=4",
              "--lr-schedule=cosine", "--warmup-steps=2"]
    # uninterrupted 6-step run
    rc = main(["train_lmdb", *common, "--n-steps=6",
               f"--boda-output-dir={tmp_path / 'full'}"])
    assert rc == 0
    full = _losses(capsys.readouterr().out)
    # interrupted: 3 steps with a checkpoint, then resume to 6
    d = tmp_path / "split"
    rc = main(["train_lmdb", *common, "--n-steps=3", "--ckpt-fn=ck.npz",
               f"--boda-output-dir={d}"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["train_lmdb", *common, "--n-steps=6", "--ckpt-fn=ck.npz",
               "--resume=1", f"--boda-output-dir={d}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from ck.npz at step 3" in out
    resumed = _losses(out)
    assert set(resumed) == {3, 4, 5}
    for i in (3, 4, 5):
        assert full[i] == pytest.approx(resumed[i], rel=1e-5), \
            (i, full[i], resumed[i])


def test_resume_past_end_keeps_checkpoint(tmp_path, capsys):
    """--resume with start >= n_steps must NOT rewrite the checkpoint with a
    smaller step label (that would double-train on the next resume)."""
    common = [f"--rec-fn={REC}", "--model=mini_resnet", "--img=4"]
    d = tmp_path / "run"
    rc = main(["train_lmdb", *common, "--n-steps=4", "--ckpt-fn=ck.npz",
               f"--boda-output-dir={d}"])
    assert rc == 0
    capsys.readouterr()
    step0, w0, _ = load_checkpoint(str(d / "ck.npz"))
    assert step0 == 4
    rc = main(["train_lmdb", *common, "--n-steps=2", "--ckpt-fn=ck.npz",
               "--resume=1", f"--boda-output-dir={d}"])
    assert rc == 0
    assert "nothing to do" in capsys.readouterr().out
    step1, w1, _ = load_checkpoint(str(d / "ck.npz"))
    assert step1 == 4
    assert all(np.array_equal(w0[k], w1[k]) for k in w0)


def test_test_lmdb_evaluates_checkpoint(tmp_path, capsys):
    """train_lmdb checkpoint -> test_lmdb --ckpt-fn: the train->eval loop."""
    d = tmp_path / "run"
    rc = main(["train_lmdb", f"--rec-fn={REC}", "--model=mini_resnet",
               "--img=4", "--n-steps=3", "--ckpt-fn=ck.npz",
               f"--boda-output-dir={d}"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["test_lmdb", f"--rec-fn={REC}", "--model=mini_resnet",
               "--img=4", f"--ckpt-fn={d}/ck.npz"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "weights from" in out and "(step 3)" in out
    assert "top1=" in out
