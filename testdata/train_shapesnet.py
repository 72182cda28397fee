"""Train shapesnet IN-FRAMEWORK and commit its weights as a .caffemodel.

VERDICT r2 item 5 (real-weights anchor): the reference validates against
real trained Caffe nets loaded from binary NetParameter files (ref
src/caffepb.cc:474 must_read_binary_proto). This script produces our
equivalent fixture: nets/shapesnet.prototxt trained on the synthetic
4-class shapes set (gen_fixtures.gen_shapes) via the train_lmdb mode, the
trained weights serialized with frontend.surgery.write_caffemodel to
nets/shapesnet.caffemodel. tests/test_learning.py then exercises the full
frontend wire decode -> engine -> above-chance top-1 path against it.

Run from the repo root (CPU, deterministic): python testdata/train_shapesnet.py
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

    ptt = os.path.join(TD, "nets", "shapesnet.prototxt")
    rec = os.path.join(TD, "lmdb", "shapes_train.rec")
    with tempfile.TemporaryDirectory() as d:
        rc = boda_main(["train_lmdb", f"--ptt-fn={ptt}", f"--rec-fn={rec}",
                        "--img=8", "--n-steps=300", "--lr=0.02",
                        "--lr-schedule=cosine", "--ckpt-fn=ck.npz",
                        f"--boda-output-dir={d}"])
        if rc != 0:
            return rc
        step, w_np, _m = load_checkpoint(os.path.join(d, "ck.npz"))
    pipe, _ = load_net("", ptt, "", img=8, in_sz=0)
    for k, v in w_np.items():
        pipe.weights[k] = NDA(pipe.weights[k].dims, np.asarray(v, np.float32))
    out = os.path.join(TD, "nets", "shapesnet.caffemodel")
    write_caffemodel(out, pipe)
    print(f"wrote {out} (step {step})")
    rc = boda_main(["test_lmdb", f"--ptt-fn={ptt}", f"--weights-fn={out}",
                    f"--rec-fn={os.path.join(TD, 'lmdb', 'shapes_test.rec')}",
                    "--img=8"])
    return rc


if __name__ == "__main__":
    sys.exit(main())
