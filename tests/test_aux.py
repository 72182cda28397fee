"""Aux-parity tests: cnn_prof, var stats, quantization injection."""

import numpy as np

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.cli import main
from boda_tpu.config import make
from boda_tpu.models.zoo import build_mini_resnet
from boda_tpu.utils.dims import NDA


def test_cnn_prof_mode(capsys, tmp_path):
    rc = main(["cnn_prof", "--model=mini_resnet", "--img=2",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "conv1" in out and "total:" in out and "MF" in out


def test_cnn_prof_timed(capsys, tmp_path):
    rc = main(["cnn_prof", "--model=mini_resnet", "--img=1", "--time=1",
               "--be=(be=interp)", "--json-out=1",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"us"' in out and '"GF/s"' in out


def test_var_stats_and_quantize():
    pipe, in_dims = build_mini_resnet(img=1, num_cls=8, in_sz=16)
    rng = np.random.RandomState(0)
    x = NDA(in_dims["data"], rng.randn(*in_dims["data"].shape).astype(np.float32))

    eng = make("conv_fwd", "xla", per_layer_stats=True)
    eng.init(pipe)
    outs = eng.run_fwd({"data": x}, ["prob"])
    log = eng.get_info_log()
    assert "var_stats conv1:" in log and "min=" in log

    # quantization: clamps negatives to 0 and snaps to a coarse grid
    from boda_tpu.utils.lexp import parse_lexp
    q = parse_lexp("(conv1=(max_val=2,keep_bits=2))")
    eng2 = make("conv_fwd", "xla", quantize={k: v for k, v in q.kids})
    eng2.init(pipe)
    out_q = eng2.run_fwd({"data": x}, ["conv1"])["conv1"].data
    assert out_q.min() >= 0.0 and out_q.max() <= 2.0
    grid = np.unique(out_q)
    assert len(grid) <= 5  # 2 bits + clamp
    # and it changes downstream results vs unquantized
    base = eng.run_fwd({"data": x}, ["conv1"])["conv1"].data
    assert not np.array_equal(base, out_q)


def test_gen_src_dump(tmp_path):
    """gen_src analog (ref rtc_compute.H:39-40): compiled program sources."""
    import os

    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.kernels.gen_data import gen_data_pattern
    pipe, in_dims = build_model("mini_resnet", img=1)
    eng = make("conv_fwd", "pallas", gen_src_dir=str(tmp_path / "src"))
    eng.init(pipe)
    d = in_dims["data"]
    x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
    eng.run_fwd({"data": x}, ["prob"])
    files = os.listdir(tmp_path / "src")
    assert any(f.endswith(".stablehlo.txt") for f in files), files
    txt = open(tmp_path / "src" / [f for f in files
                                   if f.endswith(".stablehlo.txt")][0]).read()
    assert "stablehlo" in txt and "func.func" in txt
    assert "gen_src: wrote" in eng.get_info_log()


def test_net_decomp_mode(capsys):
    from boda_tpu.cli import main
    rc = main(["net_decomp", "--model=mini_resnet", "--img=2",
               "--conv_fwd=(mode=xla)", "--n_iters=2", "--chain=1",
               "--repeats=1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "net_decomp: full" in out
    assert "stage ->" in out
    # one suffix row per auto cut (CPU timing too noisy to assert ordering)
    import re
    times = [float(m) for m in re.findall(r"from \S+\s+([\d.]+) us", out)]
    assert len(times) >= 3 and all(t > 0 for t in times)
    assert "tail after" in out


def test_net_trace_mode(capsys, tmp_path):
    """net_trace dumps a jax.profiler device trace with >=1 trace file."""
    import glob
    import os
    rc = main(["net_trace", "--model=mini_resnet", "--img=2", "--n-iters=2",
               "--per-op=1", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trace files under trace/" in out
    # in-net per-op attribution: conv ops appear with us/fwd figures
    assert "per-op device time" in out
    assert "conv1" in out and "us/fwd" in out
    files = [f for f in glob.glob(str(tmp_path / "trace" / "**" / "*"),
                                  recursive=True) if os.path.isfile(f)]
    assert files, "no trace files written"


def test_scope_of_slash_named_ops():
    """Caffe-style op names contain '/' ('inception_3a/3x3'); scope
    extraction must attribute to the longest segment-join that names a real
    op, not truncate at the first segment (the googlenet conv_only
    ZeroDivisionError, round-4 census)."""
    from boda_tpu.modes.net_trace import _scope_of, instr_op_map
    ops = {"conv1/7x7_s2", "inception_3a/3x3", "inception_3a/output"}
    p = "jit(net_fn)/inception_3a/3x3/conv_general_dilated"
    assert _scope_of(p, ops) == "inception_3a/3x3"
    assert _scope_of(p) == "inception_3a"  # legacy no-op_names behavior
    assert _scope_of("jit(net_fn)/conv1/7x7_s2/add", ops) == "conv1/7x7_s2"
    # non-matching paths keep first-segment fallback
    assert _scope_of("jit(net_fn)/pool9/reduce_window", ops) == "pool9"
    hlo = ('ENTRY %main (p: bf16[2]) -> bf16[2] {\n'
           '  %c.1 = bf16[2] add(...), metadata={op_type="add" '
           'op_name="jit(net_fn)/inception_3a/3x3/add"}\n'
           '}\n')
    assert instr_op_map(hlo, ops)["c.1"] == "inception_3a/3x3"


def test_net_trace_wisdom_reconcile(capsys, tmp_path):
    """net_trace --per-op --wisdom-fn joins each op's best wisdom runtime
    (+ trust tier) against its in-net trace time (VERDICT r2 Weak #7)."""
    from boda_tpu.modes.cnet import load_net
    from boda_tpu.ops.sig_of import collect_net_sigs
    from boda_tpu.prof.wisdom import OpRun, OpWisdom, write_wisdom
    pipe, _ = load_net("mini_resnet", "", "", 2, 0)
    wis = []
    for sig in collect_net_sigs(pipe):
        sig.dims_vals = {k: d.with_tn("bfloat16")
                         for k, d in sig.dims_vals.items()}
        wis.append(OpWisdom(sig, runs=[
            OpRun("(use_xla=1)", "cpu:test", 1e-4, "ab"),
            OpRun("(kg=1)", "cpu:test", 5e-5, "")]))  # faster but chain-tier
    fn = str(tmp_path / "r.wis")
    write_wisdom(fn, wis)
    rc = main(["net_trace", "--model=mini_resnet", "--img=2", "--n-iters=1",
               "--per-op=1", f"--wisdom-fn={fn}",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    # ab-tier run preferred over the (faster) untagged chain-tier record
    assert "wis    100.0us [ab]" in out
    assert "wisdom reconciliation:" in out
    assert "0/" not in out.split("wisdom reconciliation:")[1].split()[0]


def test_net_trace_native_input(capsys, tmp_path):
    """net_trace --native feeds loader-layout (NHWC compute-dtype) input —
    the traced program matches the flagship bench configuration."""
    rc = main(["net_trace", "--model=mini_resnet", "--img=2", "--n-iters=1",
               "--native=1", "--per-op=1",
               "--conv-fwd=(mode=pallas,compute_tn=bfloat16,"
               "precision=default)",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "per-op device time" in out and "conv1" in out


def test_engine_compiler_options_parse():
    """compiler_options reach the jit wrapper as a str->str dict, from both
    the lexp config surface and programmatic make()."""
    from boda_tpu.config import make
    from boda_tpu.utils.lexp import parse_lexp
    eng = make("conv_fwd", "pallas",
               compiler_options=parse_lexp(
                   "(xla_tpu_scoped_vmem_limit_kib=65536)"))
    assert eng._copts == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    eng2 = make("conv_fwd", "pallas",
                compiler_options={"xla_flag": 7})
    assert eng2._copts == {"xla_flag": "7"}
    eng3 = make("conv_fwd", "pallas")
    assert eng3._copts is None


def test_named_scopes_in_lowering():
    """per-op jax.named_scope: graph op names appear in the lowered program's
    location metadata (what attributes profiler traces back to ops)."""
    import jax
    import numpy as np

    from boda_tpu.config import make
    from boda_tpu.models.zoo import build_mini_resnet
    pipe, in_dims = build_mini_resnet(img=2, num_cls=8, in_sz=8)
    eng = make("conv_fwd", "pallas")
    eng.init(pipe)
    raw = eng.build_raw_fn(["prob"])
    x = {"data": np.zeros(in_dims["data"].shape, np.float32)}
    txt = jax.jit(raw).lower(dict(eng._weights_dev), x).as_text(
        debug_info=True)
    assert 'loc("jit(net_fn)/s2b0_sc/' in txt


def test_train_scope_of_phases():
    """Train-step op_name paths wrap the scope in transform frames
    ('transpose(jvp(conv1))'); phase + op must be recovered."""
    from boda_tpu.modes.net_trace import _train_scope_of
    ops = {"conv1", "inception_3a/3x3"}
    assert _train_scope_of(
        "jit(<lambda>)/jvp(conv1)/conv_general_dilated", ops) == "conv1 [fwd]"
    assert _train_scope_of(
        "jit(<lambda>)/transpose(jvp(conv1))/conv_general_dilated",
        ops) == "conv1 [bwd]"
    assert _train_scope_of(
        "jit(<lambda>)/transpose(jvp(inception_3a/3x3))/add",
        ops) == "inception_3a/3x3 [bwd]"
    assert _train_scope_of("jit(<lambda>)/__update__/add", ops) == "__update__"
    assert _train_scope_of(
        "jit(<lambda>)/jvp(__loss__)/reduce_sum", ops) == "__loss__ [fwd]"
    assert _train_scope_of(
        "jit(<lambda>)/transpose(jvp(__loss__))/mul", ops) == "__loss__ [bwd]"
    assert _train_scope_of(
        "jit(<lambda>)/jvp(whatever)/mul", ops) == "(non-op) [fwd]"


def test_train_trace_mode(capsys, tmp_path):
    """train_trace attributes per-op fwd AND bwd device time of a real
    momentum+train-BN step (the train-side net_trace; VERDICT r3 #2)."""
    rc = main(["train_trace", "--model=mini_resnet", "--img=2",
               "--n-iters=2", "--compute-tn=", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "train-step phase rollup" in out
    assert "__update__" in out
    assert "per-op fwd/bwd" in out and "conv" in out
    # both phases captured (the in-window D2H sync guarantees completion)
    import re
    m = re.search(r"bwd\s+([\d.]+) us/step", out)
    assert m and float(m.group(1)) > 0, out
