"""In-program A/B: the three explicit training-side VJPs (graph/train_ops)
vs the stock autodiff lowerings they replace, at resnet50 hot shapes.

Each comparison times fwd+bwd of ONE op (value_and_grad of a cotangent-
weighted sum) via prof/abtime.ab_compare — both variants compiled into the
same executable, so tunnel jitter cancels. Ledger rows being attacked
(docs/train_ceiling.md):

  pool1      maxpool 3x3s2 @112: fwd 392 + bwd 650 us vs ~220 us floor
             (SelectAndScatter emitter) -> argmax fwd + Spreading bwd
  k1s2       res3a_branch2a-shape 1x1 s2 dgrad: bwd/fwd 12.5x
             (gradient-dilated transpose-conv emitter) -> explicit
             small-spatial dgrad + one-dot wgrad
  k1s1       res2a_branch1-shape 1x1 @56: bwd/fwd 6.3x -> same design
  bn112      train-mode BN @112 fwd+bwd: autodiff ~6 HBM passes ->
             fused 2-phase hand backward

Usage (TPU host): python scripts/exp_train_vjp_ab.py [--img=32]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    img = int(os.environ.get("IMG", "32"))
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.graph import train_ops
    from boda_tpu.graph.lowering import conv_f32acc
    from boda_tpu.prof.abtime import ab_compare

    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    results = {}

    def put(a):
        return jax.device_put(jnp.asarray(a), dev)

    def run_case(name, raw_a, raw_b, weights, dev_ins, flops):
        sa, sb = ab_compare(raw_a, raw_b, weights, dev_ins)
        r = {"custom_us": round(sa * 1e6, 1), "stock_us": round(sb * 1e6, 1),
             "speedup": round(sb / sa, 3)}
        if flops:
            r["custom_TFs"] = round(flops / sa / 1e12, 1)
        results[name] = r
        print(name, json.dumps(r), flush=True)

    # -- pool1: maxpool 3x3 s2 @112, 64ch -----------------------------------
    x = put(rng.randn(img, 64, 112, 112).astype(np.float32)
            .astype(jnp.bfloat16))
    ct = put(rng.randn(img, 64, 56, 56).astype(np.float32)
             .astype(jnp.bfloat16))
    pool_c = train_ops.make_maxpool_vjp((3, 3), (2, 2), (0, 1), (0, 1),
                                        112, 112, 56, 56)

    def pool_s(a):
        return lax.reduce_window(
            a.astype(jnp.float32), -jnp.inf, lax.max,
            window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
            padding=((0, 0), (0, 0), (0, 1), (0, 1))).astype(a.dtype)

    def mk_pool(fn):
        def raw(w, ins):
            val, g = jax.value_and_grad(
                lambda a: jnp.sum((fn(a) * w["ct"]).astype(jnp.float32))
            )(ins["x"])
            return {"v": val, "g": g}
        return raw

    run_case("pool1", mk_pool(pool_c), mk_pool(pool_s),
             {"ct": ct}, {"x": x}, 0)

    # -- 1x1 convs: res3a_branch2a (256->128 s2 @56) and res2a_branch1
    # (64->256 s1 @56) — the two worst dgrad rows in train_ceiling.md
    for name, cin, cout, sp, s in [("k1s2", 256, 128, 56, 2),
                                   ("k1s1", 64, 256, 56, 1)]:
        xx = put(rng.randn(img, cin, sp, sp).astype(np.float32)
                 .astype(jnp.bfloat16))
        ww = put((rng.randn(cout, cin, 1, 1) * 0.05).astype(np.float32)
                 .astype(jnp.bfloat16))
        osp = (sp - 1) // s + 1
        cc = put(rng.randn(img, cout, osp, osp).astype(np.float32)
                 .astype(jnp.bfloat16))
        conv_c = train_ops.conv1x1_explicit((s, s), lax.Precision.DEFAULT)
        conv_s = conv_f32acc(("NCHW", "OIHW", "NCHW"), (s, s),
                             ((0, 0), (0, 0)), 1, (1, 1),
                             lax.Precision.DEFAULT)

        def mk_conv(fn):
            def raw(w, ins):
                def L(a, b):
                    return jnp.sum((fn(a, b).astype(jnp.bfloat16)
                                    * w["ct"]).astype(jnp.float32))
                val, (gx, gw) = jax.value_and_grad(L, argnums=(0, 1))(
                    ins["x"], w["w"])
                return {"v": val, "gx": gx, "gw": gw}
            return raw

        fl = 3 * 2 * img * cin * cout * osp * osp  # fwd+dgrad+wgrad MACs
        run_case(name, mk_conv(conv_c), mk_conv(conv_s),
                 {"ct": cc, "w": ww}, {"x": xx}, fl)

    # -- bn112: train-mode BN fwd+bwd @112, 64ch -----------------------------
    bn_c = train_ops.make_bn_train(1e-5)

    def bn_s(a):
        xf = a.astype(jnp.float32)
        m = xf.mean(axis=(0, 2, 3))
        v = xf.var(axis=(0, 2, 3))
        out = ((xf - m.reshape(1, -1, 1, 1))
               * lax.rsqrt(v.reshape(1, -1, 1, 1) + 1e-5))
        return out.astype(a.dtype), m, v

    def mk_bn(fn):
        def raw(w, ins):
            def L(a):
                o, m, v = fn(a)
                return jnp.sum((o * w["ct"]).astype(jnp.float32))
            val, g = jax.value_and_grad(L)(ins["x"])
            return {"v": val, "g": g}
        return raw

    ct2 = put(rng.randn(img, 64, 112, 112).astype(np.float32)
              .astype(jnp.bfloat16))
    run_case("bn112", mk_bn(bn_c), mk_bn(bn_s), {"ct": ct2}, {"x": x}, 0)

    print("ALL", json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
