"""Explicit backward op types (Spreading, ZeroIfNonPos, BckDropout, BckLRN)
usable directly in hand-built graphs — ref conv_util.cc:40-64. The graph
autodiff path (Bck ops) is tested in test_autodiff; these check the
standalone declared op types actually lower and match jax.vjp numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from boda_tpu.config import make
from boda_tpu.graph.pipe import ConvOp, ConvPipe
from boda_tpu.utils.dims import NDA, Dims

rng = np.random.RandomState(5)


def _pipe_with(op_type, bots, tops, params, in_dims):
    pipe = ConvPipe(f"t_{op_type}")
    op = ConvOp(f"{op_type.lower()}0", op_type, params, list(bots), list(tops))
    pipe.add_op(op)
    pipe.calc_dims(in_dims)
    return pipe


def _run(pipe, ins, out):
    eng = make("conv_fwd", "xla", train="1")
    eng.init(pipe)
    return eng.run_fwd({k: NDA(pipe.nodes[k].dims, v) for k, v in ins.items()},
                       [out])[out].data


def test_spreading_matches_maxpool_vjp():
    x = rng.randn(1, 4, 8, 8).astype(np.float32)

    def pool(xi):
        return jax.lax.reduce_window(
            xi, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
            "VALID")
    out = np.asarray(pool(x))
    og = rng.randn(*out.shape).astype(np.float32)
    want = np.asarray(jax.vjp(pool, x)[1](og)[0])
    ind = {"out": Dims.of(img=1, chan=4, y=4, x=4),
           "out_grad": Dims.of(img=1, chan=4, y=4, x=4),
           "in": Dims.of(img=1, chan=4, y=8, x=8)}
    pipe = _pipe_with("Spreading", ["out", "out_grad", "in"], ["in_grad"],
                      {"kern_sz": (2, 2), "stride": (2, 2), "pad": (0, 0)},
                      ind)
    got = _run(pipe, {"out": out, "out_grad": og, "in": x}, "in_grad")
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_zero_if_non_pos():
    g = rng.randn(2, 3, 4, 4).astype(np.float32)
    cond = rng.randn(2, 3, 4, 4).astype(np.float32)
    ind = {"g": Dims.of(img=2, chan=3, y=4, x=4),
           "cond": Dims.of(img=2, chan=3, y=4, x=4)}
    pipe = _pipe_with("ZeroIfNonPos", ["g", "cond"], ["out"], {}, ind)
    got = _run(pipe, {"g": g, "cond": cond}, "out")
    assert np.array_equal(got, np.where(cond > 0, g, 0.0))


def test_bck_lrn_matches_vjp():
    x = (rng.rand(1, 8, 6, 6).astype(np.float32) + 0.1)
    ind = {"in": Dims.of(img=1, chan=8, y=6, x=6),
           "out": Dims.of(img=1, chan=8, y=6, x=6),
           "og": Dims.of(img=1, chan=8, y=6, x=6)}
    params = {"local_size": 5, "alpha": 1e-4, "beta": 0.75, "k": 1.0}
    # forward LRN via the engine to get `out`
    fpipe = _pipe_with("LRN", ["in"], ["out"], params,
                       {"in": ind["in"]})
    out = _run(fpipe, {"in": x}, "out")
    og = rng.randn(*out.shape).astype(np.float32)
    pipe = _pipe_with("BckLRN", ["in", "out", "og"], ["ig"], params, ind)
    got = _run(pipe, {"in": x, "out": out, "og": og}, "ig")
    # reference vjp through the engine's own LRN lowering
    from boda_tpu.graph.lowering import LowerCtx, lower_op
    lrn_op = ConvOp("l", "LRN", params, ["in"], ["out"])
    fn = lower_op(fpipe, lrn_op, LowerCtx())
    want = np.asarray(jax.vjp(lambda xi: fn(xi)[0], jnp.asarray(x))[1](
        jnp.asarray(og))[0])
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_bck_dropout_mask_alignment():
    """BckDropout named '<fwd>__bck' must use the forward op's mask."""
    x = np.ones((1, 4, 8, 8), np.float32)
    ind = {"in": Dims.of(img=1, chan=4, y=8, x=8)}
    fpipe = _pipe_with("Dropout", ["in"], ["out"], {"dropout_ratio": 0.5},
                       ind)
    fwd = _run(fpipe, {"in": x}, "out")
    g = np.ones_like(x)
    bpipe = ConvPipe("t_bckdrop")
    bpipe.add_op(ConvOp("dropout0__bck", "BckDropout",
                        {"dropout_ratio": 0.5}, ["g", "act"], ["ig"]))
    bpipe.calc_dims({"g": ind["in"], "act": ind["in"]})
    got = _run(bpipe, {"g": g, "act": fwd}, "ig")
    # same seed => same mask: grad nonzero exactly where fwd kept values
    assert np.array_equal(got != 0, fwd != 0)
