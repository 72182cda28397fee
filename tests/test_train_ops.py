"""The explicit training-side backward ops (graph/train_ops.py) must be
numerically exact against the stock autodiff adjoints they replace:
maxpool Spreading backward vs the reduce_window VJP (SelectAndScatter),
explicit 1x1 dgrad/wgrad vs the conv transpose rules, fused BN backward
vs autodiff through the batch-stat formula."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from boda_tpu.graph import train_ops


def _ref_maxpool(x, k, s, pad_y, pad_x):
    return lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, lax.max,
        window_dimensions=(1, 1, k[0], k[1]),
        window_strides=(1, 1, s[0], s[1]),
        padding=((0, 0), (0, 0), pad_y, pad_x)).astype(x.dtype)


def _pool_geom(iy, ix, k, s, p):
    # caffe ceil-mode output size + the asymmetric hi-pad the lowering uses
    oy = -(-(iy + 2 * p[0] - k[0]) // s[0]) + 1
    ox = -(-(ix + 2 * p[1] - k[1]) // s[1]) + 1
    pad_y = (p[0], max(0, (oy - 1) * s[0] + k[0] - iy - p[0]))
    pad_x = (p[1], max(0, (ox - 1) * s[1] + k[1] - ix - p[1]))
    return oy, ox, pad_y, pad_x


GEOMS = [  # (iy, ix, k, s, p) — covers pool1 3x3s2, 2x2s2, 3x3s1p1, ceil-mode
    (14, 14, (3, 3), (2, 2), (0, 0)),
    (13, 15, (3, 3), (2, 2), (0, 0)),   # ceil-mode hi-pad
    (8, 8, (2, 2), (2, 2), (0, 0)),
    (9, 9, (3, 3), (1, 1), (1, 1)),
    (7, 7, (7, 7), (1, 1), (0, 0)),     # global
    (12, 10, (3, 2), (2, 3), (1, 0)),   # asymmetric everything
]


def test_maxpool_vjp_matches_reduce_window():
    rng = np.random.RandomState(7)
    for iy, ix, k, s, p in GEOMS:
        oy, ox, pad_y, pad_x = _pool_geom(iy, ix, k, s, p)
        x = jnp.asarray(rng.randn(2, 3, iy, ix).astype(np.float32))
        pool = train_ops.make_maxpool_vjp(tuple(k), tuple(s),
                                          pad_y, pad_x, iy, ix, oy, ox)
        out = pool(x)
        ref = _ref_maxpool(x, k, s, pad_y, pad_x)
        assert out.shape == (2, 3, oy, ox)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # backward: cotangent-weighted sum; distinct values -> exact match
        ct = jnp.asarray(rng.randn(2, 3, oy, ox).astype(np.float32))
        g = jax.grad(lambda a: jnp.sum(pool(a) * ct))(x)
        g_ref = jax.grad(lambda a: jnp.sum(
            _ref_maxpool(a, k, s, pad_y, pad_x) * ct))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=0, atol=1e-6)


def test_maxpool_vjp_tie_break_first_max():
    # constant input: every window value ties; SelectAndScatter's >= select
    # routes the whole gradient to the FIRST window element — so must we
    iy = ix = 6
    k, s, p = (2, 2), (2, 2), (0, 0)
    oy, ox, pad_y, pad_x = _pool_geom(iy, ix, k, s, p)
    x = jnp.ones((1, 1, iy, ix), jnp.float32)
    pool = train_ops.make_maxpool_vjp(k, s, pad_y, pad_x, iy, ix, oy, ox)
    g = jax.grad(lambda a: jnp.sum(pool(a)))(x)
    g_ref = jax.grad(lambda a: jnp.sum(_ref_maxpool(a, k, s, pad_y, pad_x)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))


def test_conv1x1_explicit_grads():
    from boda_tpu.graph.lowering import conv_f32acc
    rng = np.random.RandomState(3)
    for s, iy, ix in [((1, 1), 8, 8), ((2, 2), 8, 8), ((2, 2), 9, 7),
                      ((3, 3), 10, 10)]:
        x = jnp.asarray(rng.randn(2, 5, iy, ix).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 5, 1, 1).astype(np.float32))
        ct_f = train_ops.conv1x1_explicit(s, lax.Precision.HIGHEST)
        ref_f = conv_f32acc(("NCHW", "OIHW", "NCHW"), s, ((0, 0), (0, 0)),
                            1, (1, 1), lax.Precision.HIGHEST)
        out, ref = ct_f(x, w), ref_f(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        ct = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
        gx, gw = jax.grad(lambda a, b: jnp.sum(ct_f(a, b) * ct),
                          argnums=(0, 1))(x, w)
        rx, rw = jax.grad(lambda a, b: jnp.sum(ref_f(a, b) * ct),
                          argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-5, atol=1e-5)


def test_bn_train_fused_backward():
    eps = 1e-5
    rng = np.random.RandomState(11)
    x = jnp.asarray((rng.randn(4, 6, 5, 5) * 2 + 1).astype(np.float32))

    def stock(a):
        xf = a.astype(jnp.float32)
        m = xf.mean(axis=(0, 2, 3))
        v = xf.var(axis=(0, 2, 3))
        out = ((xf - m.reshape(1, -1, 1, 1))
               * lax.rsqrt(v.reshape(1, -1, 1, 1) + eps))
        return out.astype(a.dtype), m, v

    f = train_ops.make_bn_train(eps)
    out, m, v = f(x)
    out_r, m_r, v_r = stock(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), atol=1e-6)
    ct = jnp.asarray(rng.randn(*out.shape).astype(np.float32))
    cm = jnp.asarray(rng.randn(6).astype(np.float32))
    cv = jnp.asarray(rng.randn(6).astype(np.float32))

    def loss(fn):
        def L(a):
            o, mm, vv = fn(a)
            return jnp.sum(o * ct) + jnp.sum(mm * cm) + jnp.sum(vv * cv)
        return L

    g = jax.grad(loss(f))(x)
    g_ref = jax.grad(loss(stock))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_train_step_matches_stock_lowering(monkeypatch):
    """End-to-end: one momentum+train-BN step on a BN net must produce the
    same loss and weights with the explicit-VJP ops on vs off."""
    from boda_tpu.models.zoo import build_model
    from boda_tpu.parallel.train import find_logits_node, make_train_step

    pipe, in_dims = build_model("mini_resnet", img=4)
    logits = find_logits_node(pipe)
    d = in_dims["data"]
    rng = np.random.RandomState(5)
    x = {"data": jnp.asarray(rng.rand(*d.shape).astype(np.float32))}
    labels = jnp.asarray((np.arange(4) % 10).astype(np.int32))
    results = {}
    for flag in (True, False):
        monkeypatch.setattr(train_ops, "_FLAG", flag)
        step = make_train_step(pipe, logits, lr=0.05, clip_norm=1.0,
                               momentum=0.9, bn_momentum=0.1,
                               precision="highest")
        w = {k: jnp.asarray(np.asarray(v.data, np.float32))
             for k, v in pipe.weights.items()}
        loss, nw, mom = step(w, x, labels)
        results[flag] = (float(loss), nw)
    assert abs(results[True][0] - results[False][0]) < 1e-5
    for k in results[True][1]:
        np.testing.assert_allclose(np.asarray(results[True][1][k]),
                                   np.asarray(results[False][1][k]),
                                   rtol=1e-4, atol=1e-5)


def test_train_vjp_env_gate(monkeypatch):
    monkeypatch.setenv("BODA_TRAIN_VJP", "0")
    assert not train_ops.enabled()
    monkeypatch.setenv("BODA_TRAIN_VJP", "1")
    assert train_ops.enabled()
    monkeypatch.delenv("BODA_TRAIN_VJP")
    assert train_ops.enabled() == train_ops._FLAG
