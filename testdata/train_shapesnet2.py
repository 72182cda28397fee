"""Train shapesnet2 IN-FRAMEWORK and commit its weights as a .caffemodel.

The second, non-trivial real-weights anchor (VERDICT r3 #4): a
mini_resnet-class net (residual Eltwise adds + BatchNorm/Scale pairs, see
nets/shapesnet2.prototxt) trained on the HARD 10-class shapes10 set
(gen_fixtures.gen_shapes10) via the train_lmdb mode (momentum + train-mode
BN + cosine schedule + warmup), weights serialized with
frontend.surgery.write_caffemodel — including the BatchNorm running
mean/var/scale-factor blobs the train loop maintains — to
nets/shapesnet2.caffemodel. tests/test_learning.py gates the committed
fixture at held-out top-1 >= 0.97 (measured 1.0000; 3-seed fresh-train
spread 0.990-1.000).

Run from the repo root (CPU, deterministic): python testdata/train_shapesnet2.py
"""

import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
TD = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    import numpy as np

    from boda_tpu.cli import main as boda_main
    from boda_tpu.frontend.surgery import write_caffemodel
    from boda_tpu.modes.cnet import load_net
    from boda_tpu.parallel.checkpoint import load_checkpoint
    from boda_tpu.utils.dims import NDA

    ptt = os.path.join(TD, "nets", "shapesnet2.prototxt")
    rec = os.path.join(TD, "lmdb", "shapes10_train.rec")
    with tempfile.TemporaryDirectory() as d:
        rc = boda_main(["train_lmdb", f"--ptt-fn={ptt}", f"--rec-fn={rec}",
                        "--img=16", "--n-steps=400", "--lr=0.02",
                        "--lr-schedule=cosine", "--warmup-steps=20",
                        "--log-every=50", "--ckpt-fn=ck.npz",
                        f"--boda-output-dir={d}"])
        if rc != 0:
            return rc
        step, w_np, _m = load_checkpoint(os.path.join(d, "ck.npz"))
    pipe, _ = load_net("", ptt, "", img=16, in_sz=0)
    for k, v in w_np.items():
        pipe.weights[k] = NDA(pipe.weights[k].dims, np.asarray(v, np.float32))
    out = os.path.join(TD, "nets", "shapesnet2.caffemodel")
    write_caffemodel(out, pipe)
    print(f"wrote {out} (step {step})")
    rc = boda_main(["test_lmdb", f"--ptt-fn={ptt}", f"--weights-fn={out}",
                    f"--rec-fn={os.path.join(TD, 'lmdb', 'shapes10_test.rec')}",
                    "--img=8"])
    return rc


if __name__ == "__main__":
    sys.exit(main())
