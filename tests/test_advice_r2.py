"""Regression tests for the round-2 advisor findings (ADVICE.md r1) and the
round-1 verdict's dead-surface item:

1. cnet_detect with --img>1 must not duplicate detections (the single input
   is repeated across the batch; only batch index 0 counts).
2. BckDropout must lower with a single (grad-only) input — the reference's
   add_bck_ops builds it 1-bot (ref conv_util.cc:40).
3. Golden digest comparison uses a per-entry tolerance (default tight 1e-5).
4. Mixed-precision training derives BN running-stat EMAs from the f32
   masters, not bf16 round-trips.
5. Reduce has a real lowering in both engines (ref Reduce_coi,
   conv_util.cc:57 — N-ary elementwise sum).
"""

import numpy as np

import boda_tpu.graph  # noqa: F401
from boda_tpu.cli import main
from boda_tpu.config import make
from boda_tpu.graph.pipe import ConvOp
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.utils.dims import NDA, Dims


def _read_dets(fn):
    with open(fn) as f:
        return [l for l in f if not l.startswith("#") and l.strip()]


def test_detect_img_gt_1_no_duplicate_dets(tmp_path):
    ptt = "testdata/nets/tinyssd.prototxt"
    for sub, img in (("a", 1), ("b", 2)):
        d = tmp_path / sub
        d.mkdir()
        rc = main(["cnet_detect", f"--ptt-fn={ptt}", "--conf-thresh=0.3",
                   f"--img={img}", f"--boda-output-dir={d}"])
        assert rc == 0
    d1 = _read_dets(tmp_path / "a" / "dets.txt")
    d2 = _read_dets(tmp_path / "b" / "dets.txt")
    assert d1 and len(d1) == len(d2), (len(d1), len(d2))


def test_bck_dropout_single_input_lowering():
    from boda_tpu.graph.lowering import LowerCtx, lower_op
    from boda_tpu.graph.pipe import ConvPipe
    pipe = ConvPipe("t")
    op = pipe.add_op(ConvOp("drop__bck", "BckDropout",
                            {"dropout_ratio": 0.5}, bots=["g"], tops=["gi"]))
    x = np.ones((2, 4), np.float32)
    # inference ctx: identity
    fn = lower_op(pipe, op, LowerCtx(train=False))
    assert np.allclose(np.asarray(fn(x)[0]), x)
    # train ctx: deterministic mask, callable with ONE positional arg
    fn = lower_op(pipe, op, LowerCtx(train=True, det_drop_seed=7))
    out = np.asarray(fn(x)[0])
    assert out.shape == x.shape
    assert set(np.unique(out)).issubset({0.0, 2.0})


def test_digest_mrd_is_per_entry(tmp_path):
    from boda_tpu.modes.test_cmds import diff_file
    from boda_tpu.utils.digest import DigestStream
    a = DigestStream()
    a.add("n", np.ones(8, np.float32))
    b = DigestStream()
    b.add("n", np.ones(8, np.float32) * (1 + 3e-4))
    fa, fb = str(tmp_path / "a.boda"), str(tmp_path / "b.boda")
    a.save(fa)
    b.save(fb)
    assert diff_file(fa, fb) != ""                    # tight default catches it
    assert diff_file(fa, fb, digest_mrd=1e-3) == ""   # loose per-entry opt-in


def test_mixed_precision_bn_ema_reads_f32_masters():
    import jax.numpy as jnp

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import find_logits_node, make_train_step
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(0)
    x = {"data": rng.randn(*in_dims["data"].shape).astype(np.float32)}
    labels = np.array([1, 3], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}
    k = next(k for k in w0 if k.endswith("__means"))
    # 1.002 is NOT bf16-representable (nearest is 1.0, error 2e-3); with a
    # tiny EMA momentum the new value must stay within m*O(batch) of the f32
    # master — a bf16 round-trip would move it by the full 2e-3
    w0[k] = jnp.full_like(w0[k], 1.002)
    m = 1e-5
    step = make_train_step(pipe, logits, lr=1e-4, clip_norm=1.0,
                           bn_momentum=m, compute_dtype=jnp.bfloat16)
    _, w1 = step(w0, x, labels)
    drift = float(np.abs(np.asarray(w1[k]) - 1.002).max())
    assert drift < 1e-3, f"BN EMA drifted {drift}: read bf16 stats, not f32"


def test_reduce_lowering_both_engines():
    b = NetBuilder("r")
    t = b.input("data")
    c1 = b.conv("c1", t, 8, 3, pad=1, in_chans=4)
    c2 = b.conv("c2", t, 8, 3, pad=1, in_chans=4)
    b.pipe.add_op(ConvOp("red", "Reduce", {}, bots=[c1, c2], tops=["red"]))
    in_dims = {"data": Dims.of(img=1, chan=4, y=6, x=6)}
    pipe = b.done(in_dims)
    x = np.random.RandomState(0).randn(1, 4, 6, 6).astype(np.float32)
    res = {}
    for engine in ("xla", "pallas"):
        eng = make("conv_fwd", engine)
        eng.init(pipe)
        outs = eng.run_fwd({"data": NDA(in_dims["data"], x)},
                           ["c1", "c2", "red"])
        res[engine] = outs
    for engine, outs in res.items():
        want = outs["c1"].data + outs["c2"].data
        assert np.allclose(outs["red"].data, want, atol=1e-5), engine
