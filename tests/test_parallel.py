"""Mesh sharding + training-step tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import boda_tpu.graph  # noqa: F401
from boda_tpu.models.zoo import build_mini_resnet
from boda_tpu.parallel.mesh import (input_shardings, make_mesh, named_sharding,
                                    weight_shardings)
from boda_tpu.parallel.train import (build_net_fn, find_logits_node,
                                     make_train_step)


def test_make_mesh():
    import jax
    assert len(jax.devices()) == 8
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh({"dp": 4, "tp": 4})


def test_find_logits():
    pipe, _ = build_mini_resnet(img=2)
    assert find_logits_node(pipe) == "fc"


def test_train_step_single_device():
    import jax
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=16)
    step = jax.jit(make_train_step(pipe, "fc", lr=0.01))
    weights = {k: w.data for k, w in pipe.weights.items()}
    rng = np.random.RandomState(0)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    labels = rng.randint(0, 8, size=(2,)).astype(np.int32)
    losses = []
    for _ in range(5):
        loss, weights = step(weights, {"data": x}, labels)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # learns on a fixed batch


@pytest.mark.parametrize("dp,tp", [(2, 4), (8, 1), (1, 8)])
def test_train_step_sharded_matches_single(dp, tp):
    """The sharded step must be numerically equivalent to the local step."""
    import jax
    pipe, in_dims = build_mini_resnet(img=4, num_cls=16, in_sz=16)
    step = make_train_step(pipe, "fc", lr=0.01, precision="highest")
    weights = {k: w.data for k, w in pipe.weights.items()}
    rng = np.random.RandomState(1)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    labels = rng.randint(0, 16, size=(4,)).astype(np.int32)

    loss_local, w_local = jax.jit(step)(weights, {"data": x}, labels)

    mesh = make_mesh({"dp": dp, "tp": tp})
    w_shard = weight_shardings(pipe, mesh)
    in_shard = input_shardings(in_dims, mesh)
    dw = {k: jax.device_put(v, w_shard[k]) for k, v in weights.items()}
    dx = jax.device_put(x, in_shard["data"])
    dl = jax.device_put(labels, named_sharding(mesh, "dp") if 4 % dp == 0
                        else named_sharding(mesh))
    jstep = jax.jit(step, in_shardings=(w_shard, {"data": in_shard["data"]},
                                        None),
                    out_shardings=(named_sharding(mesh), w_shard))
    with mesh:
        loss_sh, w_sh = jstep(dw, {"data": dx}, dl)
    assert abs(float(loss_sh) - float(loss_local)) < 1e-4
    for k in w_local:
        a = np.asarray(w_local[k])
        b = np.asarray(w_sh[k])
        assert np.allclose(a, b, atol=1e-4), f"weight {k} diverged"


def test_net_fn_train_vs_infer_dropout():
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=16)
    # mini_resnet has no dropout; just check build_net_fn runs and is pure
    fn = build_net_fn(pipe, ["prob"])
    weights = {k: w.data for k, w in pipe.weights.items()}
    rng = np.random.RandomState(0)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    o1 = fn(weights, {"data": x})["prob"]
    o2 = fn(weights, {"data": x})["prob"]
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_train_step_momentum_and_decay():
    """momentum: second step with the accumulated velocity moves farther
    than plain SGD; weight_decay shrinks weights with zero grads."""
    import jax.numpy as jnp
    import numpy as np

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import find_logits_node, make_train_step
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(0)
    x = {"data": rng.randn(*in_dims["data"].shape).astype(np.float32)}
    labels = np.array([1, 3], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}

    plain = make_train_step(pipe, logits, lr=0.1, clip_norm=1.0)
    mom = make_train_step(pipe, logits, lr=0.1, clip_norm=1.0, momentum=0.9)
    _, w_p = plain(w0, x, labels)
    _, w_p2 = plain(w_p, x, labels)
    _, w_m, ms = mom(w0, x, labels, None)
    _, w_m2, _ = mom(w_m, x, labels, ms)
    # first steps identical (zero velocity); second differs (velocity != 0)
    k = "fc__filts"
    assert np.allclose(np.asarray(w_p[k]), np.asarray(w_m[k]), atol=1e-6)
    assert not np.allclose(np.asarray(w_p2[k]), np.asarray(w_m2[k]),
                           atol=1e-6)
    # decay-only probe: with lr>0, wd>0 and a loss-irrelevant weight
    # (conv1 bias grad is nonzero, so just check norm shrinks vs plain)
    wd = make_train_step(pipe, logits, lr=0.1, clip_norm=1.0,
                         weight_decay=0.5)
    _, w_d = wd(w0, x, labels)
    assert float(jnp.linalg.norm(w_d[k])) < float(jnp.linalg.norm(w_p[k]))


def test_train_mode_batchnorm_updates_running_stats():
    """bn_momentum>0: BN normalizes with batch stats and EMA-updates the
    stored running stats toward them (sf re-pinned to 1)."""
    import jax.numpy as jnp
    import numpy as np

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import find_logits_node, make_train_step
    pipe, in_dims = build_mini_resnet(img=4, num_cls=8, in_sz=8)
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(1)
    x = {"data": (rng.randn(*in_dims["data"].shape) * 3 + 5).astype(np.float32)}
    labels = np.array([0, 1, 2, 3], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}
    step = make_train_step(pipe, logits, lr=0.01, clip_norm=1.0,
                           bn_momentum=0.1)
    _, w1 = step(w0, x, labels)
    k = next(k for k in w0 if k.endswith("__means"))
    old = np.asarray(w0[k])
    new = np.asarray(w1[k])
    assert not np.allclose(old, new)  # stats moved
    sf = k[: -len("__means")] + "__sf"
    assert float(np.asarray(w1[sf])[0]) == 1.0
    # EMA: new = 0.9*old + 0.1*batch => batch = (new - 0.9*old)/0.1 finite
    batch = (new - 0.9 * old) / 0.1
    assert np.isfinite(batch).all()
    # second step threads the updated stats without error
    loss2, w2 = step(w1, x, labels)
    assert np.isfinite(float(loss2))


def test_train_lmdb_mode(tmp_path, capsys):
    """End-to-end: datum records -> batches -> optimizer steps, loss falls."""
    from boda_tpu.cli import main
    rc = main(["train_lmdb", "--rec-fn=testdata/lmdb/cifar_mini.rec",
               "--model=mini_resnet", "--img=4", "--n-steps=5",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "improved" in out and "NOT improved" not in out


def test_master_f32_mixed_precision():
    """compute_dtype=bf16 with f32 masters: weights stay f32, updates are
    finer-grained than pure-bf16 steps can express."""
    import jax.numpy as jnp
    import numpy as np

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import find_logits_node, make_train_step
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(0)
    x = {"data": rng.randn(*in_dims["data"].shape).astype(np.float32)}
    labels = np.array([1, 3], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}
    step = make_train_step(pipe, logits, lr=1e-4, clip_norm=1.0,
                           compute_dtype=jnp.bfloat16)
    loss, w1 = step(w0, x, labels)
    k = "fc__filts"
    assert w1[k].dtype == jnp.float32          # masters stay f32
    assert not np.array_equal(np.asarray(w1[k]), np.asarray(w0[k]))
    assert np.isfinite(float(loss))


def test_remat_step_matches_plain():
    """jax.checkpoint remat ('full' and 'dots') changes memory, not math:
    loss and updated weights must match the non-remat step exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import find_logits_node, make_train_step
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(0)
    x = {"data": rng.randn(*in_dims["data"].shape).astype(np.float32)}
    labels = np.array([1, 3], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}
    loss0, w_p = jax.jit(make_train_step(pipe, logits, lr=0.1,
                                         clip_norm=1.0))(w0, x, labels)
    for mode in ("full", "dots", "seg"):
        step_r = jax.jit(make_train_step(pipe, logits, lr=0.1, clip_norm=1.0,
                                         remat=mode))
        loss_r, w_r = step_r(w0, x, labels)
        assert float(loss_r) == pytest.approx(float(loss0), rel=1e-6)
        for k in w_p:
            np.testing.assert_allclose(np.asarray(w_r[k]),
                                       np.asarray(w_p[k]),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
    with pytest.raises(ValueError, match="remat must be one of"):
        make_train_step(pipe, logits, remat="bogus")


def test_remat_seg_bn_stats_match_plain():
    """Segmented remat threads train-mode BN running stats across segment
    boundaries: the EMA'd stats and loss must match the unsegmented step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.train import (find_logits_node, make_train_step,
                                         spatial_segments)
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    assert len(spatial_segments(pipe)) > 1  # the net must actually segment
    logits = find_logits_node(pipe)
    rng = np.random.RandomState(2)
    x = {"data": rng.randn(*in_dims["data"].shape).astype(np.float32)}
    labels = np.array([0, 5], dtype=np.int32)
    w0 = {k: jnp.asarray(w.data) for k, w in pipe.weights.items()}
    kw = dict(lr=0.1, clip_norm=1.0, bn_momentum=0.1)
    loss0, w_p = jax.jit(make_train_step(pipe, logits, **kw))(w0, x, labels)
    loss_r, w_r = jax.jit(make_train_step(pipe, logits, remat="seg",
                                          **kw))(w0, x, labels)
    assert float(loss_r) == pytest.approx(float(loss0), rel=1e-6)
    stats = [k for k in w_p if k.endswith(("__means", "__vars"))]
    assert stats, "expected BN running-stat weights"
    for k in list(w_p):
        np.testing.assert_allclose(np.asarray(w_r[k]), np.asarray(w_p[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_remat_composes_with_sharding():
    """remat (jax.checkpoint) inside the pjit-sharded train step: compiles,
    runs, and matches the local non-remat step."""
    import jax
    import numpy as np
    import pytest

    from boda_tpu.models.zoo import build_mini_resnet
    from boda_tpu.parallel.mesh import (input_shardings, make_mesh,
                                        named_sharding, weight_shardings)
    from boda_tpu.parallel.train import make_train_step
    pipe, in_dims = build_mini_resnet(img=4, num_cls=16, in_sz=16)
    step = make_train_step(pipe, "fc", lr=0.01, precision="highest",
                           remat="dots")
    weights = {k: w.data for k, w in pipe.weights.items()}
    rng = np.random.RandomState(1)
    x = rng.randn(*in_dims["data"].shape).astype(np.float32)
    labels = rng.randint(0, 16, size=(4,)).astype(np.int32)
    plain = make_train_step(pipe, "fc", lr=0.01, precision="highest")
    loss_local, w_local = jax.jit(plain)(weights, {"data": x}, labels)

    mesh = make_mesh({"dp": 2, "tp": 4})
    w_shard = weight_shardings(pipe, mesh)
    in_shard = input_shardings(in_dims, mesh)
    dw = {k: jax.device_put(v, w_shard[k]) for k, v in weights.items()}
    dx = jax.device_put(x, in_shard["data"])
    dl = jax.device_put(labels, named_sharding(mesh, "dp"))
    jstep = jax.jit(step, in_shardings=(w_shard, {"data": in_shard["data"]},
                                        None),
                    out_shardings=(named_sharding(mesh), w_shard))
    with mesh:
        loss_sh, w_sh = jstep(dw, {"data": dx}, dl)
    assert float(loss_sh) == pytest.approx(float(loss_local), abs=1e-4)
    for k in w_local:
        assert np.allclose(np.asarray(w_local[k]), np.asarray(w_sh[k]),
                           atol=1e-4), f"weight {k} diverged"
