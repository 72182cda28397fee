"""In-program A/B timing harness (prof/abtime.py): both net variants live in
ONE executable; flags pick the branch per chained leg (round-1 verdict next
item #3 — jitter-immune tuning measurement)."""

import numpy as np

import boda_tpu.graph  # noqa: F401
from boda_tpu.config import make
from boda_tpu.models.zoo import build_model
from boda_tpu.prof.abtime import ab_compare, build_ab_prog


def _engine_raw(pipe, tune_s):
    import jax

    from boda_tpu.utils.lexp import parse_lexp
    eng = make("conv_fwd", "pallas", tune=parse_lexp(tune_s))
    eng.init(pipe)
    raw = eng.build_raw_fn(["prob"])
    dev = eng.device()
    return raw, {k: jax.device_put(v, dev) for k, v in eng._weights_dev.items()}


def test_ab_prog_runs_both_variants():
    import jax
    import jax.numpy as jnp
    pipe, in_dims = build_model("mini_resnet", img=2, num_cls=8, in_sz=8)
    raw_a, w_a = _engine_raw(pipe, "(use_xla=1)")
    raw_b, w_b = _engine_raw(pipe, "(use_xla=1,precision=highest)")
    n_legs = 4
    prog = build_ab_prog(lambda w, i: raw_a(w["a"], i),
                         lambda w, i: raw_b(w["b"], i),
                         n_legs=n_legs)
    x = np.random.RandomState(0).randn(*in_dims["data"].shape).astype(np.float32)
    dev_ins = {"data": jnp.asarray(x)}
    weights = {"a": w_a, "b": w_b}
    for flags in (jnp.ones((n_legs,), jnp.int32),
                  jnp.zeros((n_legs,), jnp.int32),
                  jnp.asarray([1, 0, 1, 0], jnp.int32)):
        out = prog(weights, dev_ins, flags)
        assert np.isfinite(float(out))
    ta, tb = ab_compare(lambda w, i: raw_a(w["a"], i),
                        lambda w, i: raw_b(w["b"], i),
                        weights, dev_ins, n_legs=n_legs, reps=2)
    assert ta > 0 and tb > 0


def test_net_tune_ab_mode_writes_wisdom(tmp_path, capsys):
    from boda_tpu.cli import main
    rc = main(["net_tune", "--model=mini_resnet", "--img=2", "--ab=1",
               "--ab-legs=2", "--n-iters=2", "--max-groups=1",
               "--margin=0.0",
               "--candidates=(hp=(use_xla=1,precision=highest))",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "in-program A/B" in out
    assert (tmp_path / "net-tuned.wis").exists()


def test_chain_cache_invalidated_on_reinit():
    """time_fwd's chained timing programs close over the lowered net; a
    re-init (net_tune applying a new per_op_tune) must drop them or every
    later measurement silently times the stale build."""
    pipe, _ = build_model("mini_resnet", img=2, num_cls=8, in_sz=8)
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    eng._chain_fns[("sentinel",)] = object()
    eng.init(pipe)
    assert eng._chain_fns == {}
