"""Wisdom store + ops_prof tests (interp backend; fast shapes)."""

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.config import make
from boda_tpu.ops.op_base import Op
from boda_tpu.ops.registry import Codegen
from boda_tpu.ops.tune import OpTune
from boda_tpu.prof.opsprof import profile_op
from boda_tpu.prof.wisdom import (OpRun, OpWisdom, merge_wisdom, read_wisdom,
                                  write_wisdom)
from boda_tpu.utils.digest import NdaDigest


def _op(m=64, k=64, n=64):
    from boda_tpu.utils.dims import Dims
    return Op("sgemm", {}, {"a": Dims.of(M=m, K=k), "b": Dims.of(K=k, N=n),
                            "c": Dims.of(M=m, N=n)})


def test_wisdom_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    w = OpWisdom(_op())
    w.kg_digests["c"] = NdaDigest.make(rng.randn(4, 4).astype(np.float32))
    w.runs.append(OpRun("(bm=64)", "tpu:v5e", 1.5e-4, "ab"))
    w.runs.append(OpRun("()", "interp:cpu", 2.5e-3))  # legacy, no method
    fn = str(tmp_path / "w.wis")
    write_wisdom(fn, [w])
    w2 = read_wisdom(fn)[0]
    assert w2.op == w.op
    assert w2.kg_digests["c"].exact_eq(w.kg_digests["c"])
    assert [r.line() for r in w2.runs] == [r.line() for r in w.runs]
    assert w2.best("tpu:v5e").tune == "(bm=64)"
    assert w2.best().plat == "tpu:v5e"
    # the method tag survives the roundtrip; legacy records stay untagged
    assert w2.runs[0].method == "ab" and w2.runs[1].method == ""


def test_wisdom_merge_method_tiers():
    """'ab'-tier records are never displaced by faster 'chain' readings
    (min-aggregation over the jittery tier reads low); a faster ab read
    still wins over a slower ab one."""
    w1 = OpWisdom(_op())
    w1.runs.append(OpRun("(bm=64)", "p1", 2.0, "ab"))
    w2 = OpWisdom(_op())
    w2.runs.append(OpRun("(bm=64)", "p1", 1.0, "chain"))  # faster but jittery
    m = merge_wisdom([[w1], [w2]])
    assert m[0].runs[0].secs == 2.0 and m[0].runs[0].method == "ab"
    w3 = OpWisdom(_op())
    w3.runs.append(OpRun("(bm=64)", "p1", 1.5, "ab"))
    m = merge_wisdom([[w1], [w3]])
    assert m[0].runs[0].secs == 1.5 and m[0].runs[0].method == "ab"
    # and an ab record upgrades a legacy one even when slower
    w4 = OpWisdom(_op())
    w4.runs.append(OpRun("(bm=64)", "p1", 3.0, "ab"))
    w5 = OpWisdom(_op())
    w5.runs.append(OpRun("(bm=64)", "p1", 0.5))
    m = merge_wisdom([[w5], [w4]])
    assert m[0].runs[0].method == "ab" and m[0].runs[0].secs == 3.0


def test_wisdom_merge():
    w1 = OpWisdom(_op())
    w1.runs.append(OpRun("(bm=64)", "p1", 2.0))
    w2 = OpWisdom(_op())
    w2.runs.append(OpRun("(bm=64)", "p1", 1.0))  # better time, same key
    w2.runs.append(OpRun("(bm=8)", "p2", 3.0))
    m = merge_wisdom([[w1], [w2]])
    assert len(m) == 1
    assert len(m[0].runs) == 2
    assert m[0].best("p1").secs == 1.0


def test_profile_op_and_digest_anchor(tmp_path):
    be = make("be", "interp")
    op = _op()
    tunes = [OpTune(), OpTune(bm=8, bn=128, bk=128), OpTune(use_xla=True)]
    wis = profile_op(be, Codegen(be), op, tunes, n_iters=2, log=lambda *a: None)
    assert len(wis.runs) == 3  # all tunes numerically agree with kg
    assert all(r.method == "ab" for r in wis.runs)  # paired in-program tier
    assert "c" in wis.kg_digests
    # explicit chain method keeps the standalone tier and tags it
    be_c = make("be", "interp")
    wis_c = profile_op(be_c, Codegen(be_c), op, tunes[:2], n_iters=2,
                       method="chain", log=lambda *a: None)
    assert all(r.method == "chain" for r in wis_c.runs)
    # anchor a second profile run against the stored digests
    fn = str(tmp_path / "kg.wis")
    write_wisdom(fn, [wis])
    kg = read_wisdom(fn)[0]
    be2 = make("be", "tpu")  # pallas-interpret on CPU test host
    wis2 = profile_op(be2, Codegen(be2), op, [OpTune()], n_iters=2,
                      kg_wisdom=kg, log=lambda *a: None)
    assert len(wis2.runs) == 1  # digest anchor passed across backends


def test_ops_prof_mode(tmp_path):
    from boda_tpu.cli import main
    ops_fn = tmp_path / "ops.txt"
    ops_fn.write_text("(type=sgemm,a=(M=32,K=32),b=(K=32,N=32),c=(M=32,N=32))\n")
    out_fn = tmp_path / "out.wis"
    rc = main(["ops_prof", f"--ops-fn={ops_fn}", "--be=(be=interp)",
               "--n-iters=1", f"--wisdom-out-fn={out_fn}",
               "--op-tunes=(kg=(),t2=(bm=8))"])
    assert rc == 0
    wis = read_wisdom(str(out_fn))
    assert len(wis) == 1 and len(wis[0].runs) == 2


def test_wis_merge_and_ana_modes(tmp_path, capsys):
    from boda_tpu.cli import main
    w = OpWisdom(_op())
    w.runs.append(OpRun("()", "p1", 1.0))
    f1, f2, fo = (str(tmp_path / x) for x in ("a.wis", "b.wis", "m.wis"))
    write_wisdom(f1, [w])
    write_wisdom(f2, [w])
    rc = main(["wis_merge", f"--srcs=(a={f1},b={f2})", f"--out-fn={fo}"])
    assert rc == 0
    rc = main(["wis_ana", f"--wisdom-fn={fo}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "best" in out and "sgemm" in out


def test_wisdom_best_prefers_ab_tier():
    """OpWisdom.best ranks by trust tier first: a faster chain/legacy
    reading must not out-rank an ab (in-program A/B) record — the engine's
    _wisdom_tune and wis_ana both consume this ranking."""
    w = OpWisdom(_op())
    w.runs.append(OpRun("(bm=64)", "p1", 2.0, "ab"))
    w.runs.append(OpRun("(bm=128)", "p1", 1.0, "chain"))  # faster, jittery
    w.runs.append(OpRun("(bm=32)", "p1", 1.5, "ab"))
    assert w.best("p1").tune == "(bm=32)"   # best among ab only
    assert w.best().tune == "(bm=32)"
    # with no ab records, plain min over the legacy tier still works
    w2 = OpWisdom(_op())
    w2.runs.append(OpRun("(bm=64)", "p1", 2.0))
    w2.runs.append(OpRun("(bm=128)", "p1", 1.0, "chain"))
    assert w2.best("p1").tune == "(bm=128)"
