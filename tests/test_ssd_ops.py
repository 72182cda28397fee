"""SSD/detection op-set coverage: Permute/Flatten/Reshape/Normalize/PriorBox/
DetectionOutput (+ dilated conv, grouped deconv) — cross-engine (xla vs
pallas) and vs torch / hand-written caffe-semantics references.

Parity target: the layer set of ref nets/rrc/deploy.prototxt."""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.graph.pipe import ConvOp, ConvPipe
from boda_tpu.utils.dims import NDA, Dims


def _run_engines(pipe, in_dims, out, feeds, engines=("xla", "pallas")):
    res = {}
    for engine in engines:
        eng = make("conv_fwd", engine)
        eng.init(pipe)
        ins = {k: NDA(in_dims[k], v) for k, v in feeds.items()}
        res[engine] = eng.run_fwd(ins, [out])[out].data
    if len(engines) == 2:
        a, b = res[engines[0]], res[engines[1]]
        assert np.allclose(a, b, atol=1e-5), float(np.abs(a - b).max())
    return res[engines[0]]


def _mini_head_pipe():
    """conv -> permute(0,2,3,1) -> flatten -> reshape(0,-1,2) -> softmax(ax2)
    -> flatten: the SSD mbox_conf pattern."""
    pipe = ConvPipe("h")
    rng = np.random.RandomState(0)
    wd = Dims.of(out_chan=6, in_chan=4, y=3, x=3)
    pipe.weights["c__filts"] = NDA(wd, (rng.randn(*wd.shape) * 0.2).astype(np.float32))
    pipe.weights["c__biases"] = NDA(Dims.of(out_chan=6),
                                    rng.randn(6).astype(np.float32))
    for wn in ("c__filts", "c__biases"):
        pipe.get_or_make_node(wn).dims = pipe.weights[wn].dims
    pipe.add_op(ConvOp("c", "Convolution", {"kern_sz": (3, 3), "stride": (1, 1),
                                            "pad": (1, 1)},
                       bots=["data", "c__filts", "c__biases"], tops=["c"]))
    pipe.add_op(ConvOp("perm", "Permute", {"order": [0, 2, 3, 1]},
                       bots=["c"], tops=["perm"]))
    pipe.add_op(ConvOp("flat", "Flatten", {"axis": 1},
                       bots=["perm"], tops=["flat"]))
    pipe.add_op(ConvOp("resh", "Reshape", {"shape": [0, -1, 2]},
                       bots=["flat"], tops=["resh"]))
    pipe.add_op(ConvOp("sm", "Softmax", {"axis": 2},
                       bots=["resh"], tops=["sm"]))
    pipe.add_op(ConvOp("flat2", "Flatten", {"axis": 1},
                       bots=["sm"], tops=["flat2"]))
    in_dims = {"data": Dims.of(img=2, chan=4, y=5, x=5)}
    pipe.calc_dims(in_dims)
    return pipe, in_dims


def test_ssd_head_chain_vs_numpy():
    pipe, in_dims = _mini_head_pipe()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 5, 5).astype(np.float32)
    got = _run_engines(pipe, in_dims, "flat2", {"data": x})
    # numpy reference
    import torch
    import torch.nn.functional as F
    c = F.conv2d(torch.tensor(x), torch.tensor(pipe.weights["c__filts"].data),
                 torch.tensor(pipe.weights["c__biases"].data), padding=1).numpy()
    r = c.transpose(0, 2, 3, 1).reshape(2, -1).reshape(2, -1, 2)
    e = np.exp(r - r.max(axis=2, keepdims=True))
    sm = e / e.sum(axis=2, keepdims=True)
    ref = sm.reshape(2, -1)
    assert pipe.must_dims("flat2").shape == ref.shape
    assert np.allclose(got, ref, atol=1e-5), float(np.abs(got - ref).max())


def test_normalize_vs_torch():
    import torch
    import torch.nn.functional as F
    pipe = ConvPipe("n")
    scales = np.array([20.0, 10.0, 5.0], np.float32)
    pipe.weights["nrm__scales"] = NDA(Dims.of(out_chan=3), scales)
    pipe.get_or_make_node("nrm__scales").dims = Dims.of(out_chan=3)
    pipe.add_op(ConvOp("nrm", "Normalize",
                       {"across_spatial": False, "eps": 1e-10},
                       bots=["data", "nrm__scales"], tops=["nrm"]))
    in_dims = {"data": Dims.of(img=2, chan=3, y=4, x=4)}
    pipe.calc_dims(in_dims)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 4, 4).astype(np.float32)
    got = _run_engines(pipe, in_dims, "nrm", {"data": x})
    t = torch.tensor(x)
    ref = (F.normalize(t, p=2, dim=1, eps=1e-12) *
           torch.tensor(scales).view(1, 3, 1, 1)).numpy()
    assert np.allclose(got, ref, atol=1e-4), float(np.abs(got - ref).max())


def _priorbox_ref(lh, lw, ih, iw, mins, maxs, ars_in, flip, clip, variance,
                  offset=0.5, step=None):
    """Literal transcription of caffe SSD PriorBoxLayer::Forward_cpu."""
    ars = [1.0]
    for ar in ars_in:
        if any(abs(ar - a) < 1e-6 for a in ars):
            continue
        ars.append(ar)
        if flip:
            ars.append(1.0 / ar)
    sh = step or ih / lh
    sw = step or iw / lw
    out = []
    for h in range(lh):
        for w in range(lw):
            cx = (w + offset) * sw
            cy = (h + offset) * sh
            for mn in mins:
                bw = bh = mn
                out += [(cx - bw / 2) / iw, (cy - bh / 2) / ih,
                        (cx + bw / 2) / iw, (cy + bh / 2) / ih]
                for mx in maxs:
                    bw = bh = np.sqrt(mn * mx)
                    out += [(cx - bw / 2) / iw, (cy - bh / 2) / ih,
                            (cx + bw / 2) / iw, (cy + bh / 2) / ih]
                for ar in ars[1:]:
                    bw = mn * np.sqrt(ar)
                    bh = mn / np.sqrt(ar)
                    out += [(cx - bw / 2) / iw, (cy - bh / 2) / ih,
                            (cx + bw / 2) / iw, (cy + bh / 2) / ih]
    arr = np.asarray(out, np.float32)
    if clip:
        arr = np.clip(arr, 0.0, 1.0)
    var = np.tile(np.asarray(variance, np.float32), arr.size // 4)
    return np.stack([arr, var])[None]


def test_priorbox_vs_caffe_ref():
    pipe = ConvPipe("p")
    pipe.add_op(ConvOp("pb", "PriorBox",
                       {"min_sizes": [30.0], "max_sizes": [60.0],
                        "aspect_ratios": [2.0], "flip": True, "clip": True,
                        "variance": [0.1, 0.1, 0.2, 0.2], "offset": 0.5,
                        "step": 0.0, "step_h": 0.0, "step_w": 0.0},
                       bots=["feat", "data"], tops=["pb"]))
    in_dims = {"feat": Dims.of(img=1, chan=8, y=3, x=4),
               "data": Dims.of(img=1, chan=3, y=24, x=32)}
    pipe.calc_dims(in_dims)
    rng = np.random.RandomState(0)
    feeds = {"feat": rng.randn(1, 8, 3, 4).astype(np.float32),
             "data": rng.randn(1, 3, 24, 32).astype(np.float32)}
    got = _run_engines(pipe, in_dims, "pb", feeds)
    ref = _priorbox_ref(3, 4, 24, 32, [30.0], [60.0], [2.0], True, True,
                        [0.1, 0.1, 0.2, 0.2])
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.allclose(got, ref, atol=1e-6), float(np.abs(got - ref).max())


def _detout_ref(loc, conf, priors, n_classes, bg, nms_t, top_k, keep_top_k,
                conf_t):
    """Caffe DetectionOutputLayer semantics in plain numpy (CENTER_SIZE)."""
    n = loc.shape[0]
    pb = priors[0, 0].reshape(-1, 4)
    pv = priors[0, 1].reshape(-1, 4)
    p = pb.shape[0]
    locs = loc.reshape(n, p, 4)
    confs = conf.reshape(n, p, n_classes)
    pw, ph = pb[:, 2] - pb[:, 0], pb[:, 3] - pb[:, 1]
    pcx, pcy = (pb[:, 0] + pb[:, 2]) / 2, (pb[:, 1] + pb[:, 3]) / 2
    all_dets = []
    for i in range(n):
        cx = pv[:, 0] * locs[i, :, 0] * pw + pcx
        cy = pv[:, 1] * locs[i, :, 1] * ph + pcy
        w = np.exp(pv[:, 2] * locs[i, :, 2]) * pw
        h = np.exp(pv[:, 3] * locs[i, :, 3]) * ph
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        dets = []
        for c in range(n_classes):
            if c == bg:
                continue
            sc = confs[i, :, c]
            order = np.argsort(-sc)[:top_k]
            kept = []
            for j in order:
                if sc[j] <= conf_t:
                    continue
                ok = True
                for kj in kept:
                    b1, b2 = boxes[j], boxes[kj]
                    x0, y0 = max(b1[0], b2[0]), max(b1[1], b2[1])
                    x1, y1 = min(b1[2], b2[2]), min(b1[3], b2[3])
                    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
                    a1 = max(b1[2] - b1[0], 0) * max(b1[3] - b1[1], 0)
                    a2 = max(b2[2] - b2[0], 0) * max(b2[3] - b2[1], 0)
                    if a1 + a2 - inter > 0 and \
                            inter / (a1 + a2 - inter) > nms_t:
                        ok = False
                        break
                if ok:
                    kept.append(j)
            for j in kept:
                dets.append((i, c, sc[j], *boxes[j]))
        dets.sort(key=lambda d: -d[2])
        all_dets += dets[:keep_top_k]
    return all_dets


def test_detection_output_vs_caffe_ref():
    n, p, n_cls = 2, 24, 3
    rng = np.random.RandomState(3)
    # random but plausible priors in [0,1]
    pc = rng.rand(p, 2) * 0.8 + 0.1
    ps = rng.rand(p, 2) * 0.2 + 0.05
    pb = np.concatenate([pc - ps, pc + ps], axis=1).astype(np.float32)
    pv = np.tile(np.array([0.1, 0.1, 0.2, 0.2], np.float32), (p, 1))
    priors = np.stack([pb.reshape(-1), pv.reshape(-1)])[None]
    loc = (rng.randn(n, p * 4) * 0.3).astype(np.float32)
    conf = rng.rand(n, p * n_cls).astype(np.float32)
    conf /= conf.reshape(n, p, n_cls).sum(2, keepdims=True).reshape(n, -1).repeat(n_cls, 1).reshape(n, -1)

    pipe = ConvPipe("d")
    pipe.add_op(ConvOp("det", "DetectionOutput",
                       {"num_classes": n_cls, "share_location": True,
                        "background_label_id": 0, "nms_threshold": 0.45,
                        "top_k": 10, "keep_top_k": 8,
                        "confidence_threshold": 0.1,
                        "code_type": "CENTER_SIZE"},
                       bots=["loc", "conf", "priors"], tops=["det"]))
    in_dims = {"loc": Dims.of(img=n, chan=p * 4),
               "conf": Dims.of(img=n, chan=p * n_cls),
               "priors": Dims.make(("img", "pv", "pbox"), (1, 2, p * 4))}
    pipe.calc_dims(in_dims)
    got = _run_engines(pipe, in_dims, "det",
                       {"loc": loc, "conf": conf, "priors": priors})
    assert got.shape == (1, 1, n * 8, 7)
    ref = _detout_ref(loc, conf, priors, n_cls, 0, 0.45, 10, 8, 0.1)
    rows = got[0, 0]
    valid = rows[rows[:, 1] >= 0]
    assert len(valid) == len(ref), (len(valid), len(ref))
    # per-image ordering matches (ref rows grouped by image, score-desc)
    ref_arr = np.asarray([list(r) for r in ref], np.float32)
    vs = valid[np.lexsort((-valid[:, 2], valid[:, 0]))]
    rs = ref_arr[np.lexsort((-ref_arr[:, 2], ref_arr[:, 0]))]
    assert np.allclose(vs, rs, atol=1e-4), np.abs(vs - rs).max()


def test_dilated_conv_vs_torch():
    import torch
    import torch.nn.functional as F
    pipe = ConvPipe("a")
    rng = np.random.RandomState(4)
    wd = Dims.of(out_chan=5, in_chan=3, y=3, x=3)
    pipe.weights["c__filts"] = NDA(wd, rng.randn(*wd.shape).astype(np.float32))
    pipe.weights["c__biases"] = NDA(Dims.of(out_chan=5),
                                    rng.randn(5).astype(np.float32))
    for wn in ("c__filts", "c__biases"):
        pipe.get_or_make_node(wn).dims = pipe.weights[wn].dims
    pipe.add_op(ConvOp("c", "Convolution",
                       {"kern_sz": (3, 3), "stride": (1, 1), "pad": (2, 2),
                        "dilation": (2, 2)},
                       bots=["data", "c__filts", "c__biases"], tops=["c"]))
    in_dims = {"data": Dims.of(img=2, chan=3, y=8, x=8)}
    pipe.calc_dims(in_dims)
    assert pipe.must_dims("c").shape == (2, 5, 8, 8)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    got = _run_engines(pipe, in_dims, "c", {"data": x})
    ref = F.conv2d(torch.tensor(x), torch.tensor(pipe.weights["c__filts"].data),
                   torch.tensor(pipe.weights["c__biases"].data),
                   padding=2, dilation=2).numpy()
    assert np.allclose(got, ref, atol=1e-4), float(np.abs(got - ref).max())


def test_grouped_deconv_vs_torch():
    import torch
    import torch.nn.functional as F
    ic, oc, g, k = 4, 6, 2, 4
    pipe = ConvPipe("gd")
    rng = np.random.RandomState(5)
    wd = Dims.of(out_chan=oc, in_chan=ic // g, y=k, x=k)
    w = rng.randn(*wd.shape).astype(np.float32)
    pipe.weights["up__filts"] = NDA(wd, w)
    pipe.weights["up__biases"] = NDA(Dims.of(out_chan=oc),
                                     rng.randn(oc).astype(np.float32))
    for wn in ("up__filts", "up__biases"):
        pipe.get_or_make_node(wn).dims = pipe.weights[wn].dims
    pipe.add_op(ConvOp("up", "Deconvolution",
                       {"kern_sz": (k, k), "stride": (2, 2), "pad": (1, 1),
                        "groups": g},
                       bots=["data", "up__filts", "up__biases"], tops=["up"]))
    in_dims = {"data": Dims.of(img=2, chan=ic, y=5, x=5)}
    pipe.calc_dims(in_dims)
    x = rng.randn(2, ic, 5, 5).astype(np.float32)
    got = _run_engines(pipe, in_dims, "up", {"data": x})
    # torch ConvTranspose2d weight layout is (ic, oc/g, kh, kw); our logical
    # (oc, ic/g, kh, kw) maps tw[gi*icg+i, o] = ours[gi*ocg+o, i]
    icg, ocg = ic // g, oc // g
    tw = np.empty((ic, ocg, k, k), np.float32)
    for gi in range(g):
        for i in range(icg):
            for o in range(ocg):
                tw[gi * icg + i, o] = w[gi * ocg + o, i]
    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(tw),
                             torch.tensor(pipe.weights["up__biases"].data),
                             stride=2, padding=1, groups=g).numpy()
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=1e-4), float(np.abs(got - ref).max())


@pytest.mark.slow
def test_rrc_deploy_parses_and_runs():
    from boda_tpu.frontend.pipe_builder import pipe_from_prototxt
    pipe, in_dims = pipe_from_prototxt(
        "/root/reference/nets/rrc/deploy.prototxt", img=1, in_sz=128)
    outs = [o.tops[0] for o in pipe.ops.values() if o.type == "DetectionOutput"]
    assert outs
    rng = np.random.RandomState(0)
    x = (rng.randn(*in_dims["data"].shape) * 10).astype(np.float32)
    eng = make("conv_fwd", "xla")
    eng.init(pipe)
    res = eng.run_fwd({"data": NDA(in_dims["data"], x)}, outs[:1])
    d = res[outs[0]].data
    assert d.shape[3] == 7 and np.isfinite(d).all()


def test_greedy_nms_fixpoint_matches_loop():
    """The parallel fixpoint suppression (default) must reproduce the
    sequential greedy loop EXACTLY — including suppression chains where
    removing a suppressor resurrects a later box (a-b-c-d chains)."""
    import jax.numpy as jnp

    from boda_tpu.graph.ssd_ops import _greedy_nms
    rng = np.random.RandomState(0)
    for trial in range(8):
        p = 200
        scores = jnp.asarray(rng.rand(p).astype(np.float32))
        # clustered boxes: heavy overlap -> long suppression chains
        ctr = rng.rand(p, 2) * 0.5
        if trial % 2 == 0:  # chain regime: sliding boxes along a line
            ctr = np.stack([np.linspace(0, 1, p),
                            np.full(p, 0.5)], axis=1) \
                + rng.randn(p, 2) * 0.01
        wh = 0.1 + rng.rand(p, 2) * 0.1
        boxes = jnp.asarray(np.concatenate(
            [ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32))
        for k in (32, 128):
            sc_a, b_a, keep_a = _greedy_nms(scores, boxes, k, 0.45, 0.1,
                                            method="fixpoint")
            sc_b, b_b, keep_b = _greedy_nms(scores, boxes, k, 0.45, 0.1,
                                            method="loop")
            np.testing.assert_array_equal(np.asarray(keep_a),
                                          np.asarray(keep_b))
            np.testing.assert_array_equal(np.asarray(sc_a),
                                          np.asarray(sc_b))


def test_det_top_k_serving_knob():
    """tune.det_top_k: override == the prototxt top_k is exact; a smaller
    override still yields valid (possibly fewer) detections — the opt-in
    latency knob for the batch-invariant NMS head."""
    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    from boda_tpu.utils.dims import NDA
    from boda_tpu.utils.lexp import parse_lexp

    pipe, in_dims = build_model("ssd300", img=1, in_sz=300)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))

    def run(**kw):
        eng = make("conv_fwd", "pallas", **kw)
        eng.init(pipe)
        return np.asarray(
            eng.run_fwd({"data": x}, ["detection_out"])["detection_out"]
            .data, np.float32).reshape(-1, 7)

    base = run()
    same = run(per_op_tune={"detection_out": parse_lexp("(det_top_k=400)")})
    np.testing.assert_array_equal(base, same)
    small = run(per_op_tune={"detection_out": parse_lexp("(det_top_k=64)")})
    v_base = base[base[:, 1] >= 0]
    v_small = small[small[:, 1] >= 0]
    assert 0 < len(v_small) <= len(v_base)
    sc = v_small[:, 2]
    assert np.isfinite(sc).all() and (sc >= 0).all() and (sc <= 1).all()
    # the small-k detections are a subset-rank phenomenon: its top-scoring
    # detection must also be (near) the full run's top score
    assert abs(v_small[:, 2].max() - v_base[:, 2].max()) < 1e-6
