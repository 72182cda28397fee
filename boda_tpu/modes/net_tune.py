"""net_tune: in-context whole-net autotuning (coordinate descent).

Standalone per-op times (ops_prof) don't always transfer into the fused
whole-net program (see NOTES_ROUND2.md): this mode optimizes per-signature
tunes with the NET-level steady-state forward time as the objective —
signature groups are swept one at a time, keeping each winner (coordinate
descent), and the result is written as a wisdom file the engine consumes
via ``wisdom_fn``.
"""

from __future__ import annotations

import numpy as np

from .. import graph  # noqa: F401
from ..config import ConfigError, Field, Mode, register
from ..utils.dims import NDA
from .cnet import load_net


@register("mode", "net_tune", help="whole-net coordinate-descent autotuner")
class NetTune(Mode):
    model = Field(str, default="", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="32", help="batch size")
    conv_fwd = Field("conv_fwd",
                     default="(mode=pallas,compute_tn=bfloat16,precision=default)",
                     help="engine template (per_op_tune is overridden)")
    candidates = Field((dict, "lexp"),
                       default="(lib=(use_xla=1),kg=(use_xla=0),"
                               "big=(use_xla=0,bm=512,bn=512,bk=256),"
                               "nohalo=(use_xla=0,use_halo=0),"
                               "ch8=(use_xla=0,chunk=8),"
                               "tcat=(use_xla=0,tap_cat=1),"
                               "stem=(use_xla=1,stem_s2d=1))",
                       help="tune candidates per signature group")
    max_groups = Field(int, default="0", help="limit swept groups (0=all, hottest first)")
    # restrict the sweep to groups containing an op whose name contains this
    # substring (e.g. --op-filter=conv1 to A/B just the stem rewrite without
    # paying a dual-whole-net compile per group on the slow remote path)
    op_filter = Field(str, default="", help="only sweep groups with ops matching substring")
    n_iters = Field(int, default="10", help="timing iterations per config")
    chain = Field(int, default="8", help="forwards chained per dispatch (see time_fwd)")
    wisdom_out_fn = Field(str, default="net-tuned.wis", help="output wisdom file")
    # accept margin: a candidate must beat a FRESH same-batch re-measurement
    # of the incumbent by this fraction. Run-to-run net timing over a remote
    # dispatch path jitters by several %; comparing against a stale minimum
    # (a lucky draw from an earlier group) locks in noise instead of signal.
    margin = Field(float, default="0.08",
                   help="required fractional win vs incumbent (the A/B "
                        "harness repeats within ~±6%; sub-noise margins "
                        "accept jitter as wins)")
    # in-program A/B: candidate and incumbent nets compiled into ONE
    # executable (lax.cond legs picked by a runtime flags array) so the
    # comparison dispatches the SAME program — tunnel jitter cancels (the
    # cross-program 2x jitter made the legacy path reject everything;
    # see prof/abtime.py and round-1 verdict Weak #3)
    ab = Field(bool, default="1", help="jitter-immune in-program A/B comparison")
    ab_legs = Field(int, default="6", help="chained forwards per A/B program")

    def main(self) -> None:
        from ..ops.kernels.gen_data import gen_data_pattern
        from ..prof.wisdom import OpRun, OpWisdom, write_wisdom
        from ..utils.lexp import Lexp
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        eng = self.conv_fwd
        eng.init(pipe)
        # group ops by the ENGINE's wisdom signature (compute-dtype-typed
        # keys — writing raw-pipe keys makes engine lookups silently miss);
        # order groups by FLOPs (hottest first)
        groups: dict[str, list[str]] = {}
        flops: dict[str, float] = {}
        for op_name in pipe.topo_op_order():
            sig = eng.wisdom_sig(op_name)
            if sig is None:
                continue
            k = sig.key()
            groups.setdefault(k, []).append(op_name)
            flops[k] = flops.get(k, 0.0) + pipe.op_flops(op_name)
        order = sorted(groups, key=lambda k: -flops[k])
        if self.op_filter:
            order = [k for k in order
                     if any(self.op_filter in n for n in groups[k])]
        if self.max_groups:
            order = order[: self.max_groups]
        d = in_dims["data"]
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))
        chosen: dict[str, str] = {}  # sig key -> tune key string

        def measure() -> float:
            per_op = {}
            for k, tune_s in chosen.items():
                for op_name in groups[k]:
                    from ..utils.lexp import parse_lexp
                    per_op[op_name] = parse_lexp(tune_s)
            eng.per_op_tune = per_op
            eng._fn_key = None  # force recompile with the new tunes
            eng.init(pipe)
            return eng.time_fwd({"data": x}, ["prob"], n_iters=self.n_iters,
                                chain=self.chain)

        base = measure()
        print(f"net_tune {pipe.name}: baseline {self.img / base:.1f} img/s "
              f"over {len(order)} signature groups "
              f"({'in-program A/B' if self.ab else 'cross-program'})")
        cands = {k: str(v) for k, v in self.candidates.items()}

        def raw_with(sel: dict) -> tuple:
            """(raw_fn, weights_dev, dev_ins) for a per-sig tune selection."""
            import jax

            from ..utils.lexp import parse_lexp
            per_op = {op_name: parse_lexp(tune_s)
                      for kk, tune_s in sel.items() for op_name in groups[kk]}
            eng.per_op_tune = per_op
            eng._fn_key = None
            eng.init(pipe)
            raw = eng.build_raw_fn(["prob"])
            dev = eng.device()
            ins = {"data": jax.device_put(x.data, dev)}
            return raw, dict(eng._weights_dev), ins

        def ab_pick(k: str, tune_s: str, inc: tuple) -> tuple[float, float]:
            """(cand_secs, incumbent_secs) via one dual-net program. Each
            variant gets its OWN weights dict (tunes may change weight prep),
            selected inside the wrapped raw fns. `inc` is the incumbent build
            (constant within a group — built once, not per candidate)."""
            from ..prof.abtime import ab_compare
            raw_b, w_b, ins = inc
            raw_a, w_a, _ = raw_with({**chosen, k: tune_s})
            return ab_compare(lambda w, i: raw_a(w["a"], i),
                              lambda w, i: raw_b(w["b"], i),
                              {"a": w_a, "b": w_b}, ins,
                              n_legs=self.ab_legs)

        for gi, k in enumerate(order):
            results = {}
            if self.ab:
                inc_ts = []
                inc = None
                for cname, tune_s in cands.items():
                    if chosen.get(k) == tune_s:
                        continue  # candidate IS the incumbent
                    if inc is None:
                        inc = raw_with(chosen)
                    ta, tb = ab_pick(k, tune_s, inc)
                    results[cname] = ta
                    inc_ts.append(tb)
                if not inc_ts:
                    continue
                import statistics
                results["(incumbent)"] = statistics.median(inc_ts)
            else:
                # legacy cross-program path: fresh incumbent measurement in
                # the same batch (comparing vs a stale minimum locks in jitter)
                results["(incumbent)"] = measure()
                for cname, tune_s in cands.items():
                    chosen[k] = tune_s
                    results[cname] = measure()
                chosen.pop(k, None)
            winner = min(results, key=results.get)
            inc_t = results["(incumbent)"]
            if winner != "(incumbent)" and \
                    results[winner] < inc_t * (1.0 - self.margin):
                chosen[k] = cands[winner]
            else:
                winner = "(incumbent)"
            print(f"group {gi} ({flops[k] / 1e9:.2f}GF x{len(groups[k])} ops): "
                  f"{ {c: round(self.img / t, 1) for c, t in results.items()} } "
                  f"-> {winner}")
        # final paired validation: tuned vs baseline. In A/B mode the
        # validation itself is in-program (the cross-program median-of-3 can
        # reject a real few-% win purely on tunnel jitter — the same failure
        # the per-group A/B exists to avoid).
        tuned_sel = dict(chosen)
        if self.ab and tuned_sel:
            from ..prof.abtime import ab_compare
            raw_b, w_b, ins = raw_with({})
            raw_a, w_a, _ = raw_with(tuned_sel)
            best_t, base3 = ab_compare(lambda w, i: raw_a(w["a"], i),
                                       lambda w, i: raw_b(w["b"], i),
                                       {"a": w_a, "b": w_b}, ins,
                                       n_legs=self.ab_legs)
            chosen.clear()
            chosen.update(tuned_sel)
        else:
            chosen.clear()
            base3 = sorted(measure() for _ in range(3))[1]
            chosen.update(tuned_sel)
            best_t = sorted(measure() for _ in range(3))[1]
        if best_t >= base3 * (1.0 - self.margin):
            print(f"net_tune: tuned config NOT reliably faster "
                  f"({self.img / best_t:.1f} vs baseline {self.img / base3:.1f}"
                  f" img/s, margin {self.margin:.0%}) — writing empty wisdom")
            chosen.clear()
            best_t = base3
        # write winners as wisdom (net-level objective runs)
        from ..ops.op_base import Op
        wis = []
        net_plat = eng.wisdom_plats()[0]  # fusion-fingerprinted tag: these
        # tunes are only valid for the engine configuration they were swept in
        for k, tune_s in chosen.items():
            w = OpWisdom(Op.parse(k))
            w.runs.append(OpRun(tune_s if tune_s != "()" else "()",
                                net_plat, best_t,
                                "ab" if self.ab else "chain"))
            wis.append(w)
        fn = self.out_path(self.wisdom_out_fn)
        write_wisdom(fn, wis)
        print(f"net_tune: {self.img / base:.1f} -> {self.img / best_t:.1f} "
              f"img/s; wrote {len(wis)} tuned sigs to {self.wisdom_out_fn}")


@register("mode", "net_ab",
          help="jitter-immune whole-net A/B of two engine configs")
class NetAB(Mode):
    """Compare two ENGINE configurations (layout, fusion flags, batch_split
    regions, kernel policy ...) with the in-program A/B harness: both whole
    nets compile into ONE executable (prof/abtime.py), so tunnel dispatch
    jitter cancels. net_tune sweeps per-op tunes; this is the net-level
    axis — e.g. ``--b='(mode=pallas,...,batch_split=(r=pool1:res2c_relu:2))'``
    to validate a batch-split region. Parity: the measurement role of the
    reference's tune comparisons (op-tuner.cc) at whole-program scope."""

    model = Field(str, default="", help="zoo model")
    ptt_fn = Field("filename", default="", help="caffe prototxt")
    img = Field(int, default="32", help="batch size")
    a = Field("conv_fwd",
              default="(mode=pallas,compute_tn=bfloat16,precision=default)",
              help="engine config A (incumbent)")
    b = Field("conv_fwd",
              default="(mode=pallas,compute_tn=bfloat16,precision=default)",
              help="engine config B (candidate)")
    out_node = Field(str, default="prob", help="output node")
    ab_legs = Field(int, default="6", help="chained forwards per A/B program")

    def main(self) -> None:
        import jax

        from ..ops.kernels.gen_data import gen_data_pattern
        from ..prof.abtime import ab_compare
        pipe, in_dims = load_net(self.model, self.ptt_fn, "", self.img, 0)
        d = in_dims["data"]
        x = NDA(d, np.asarray(gen_data_pattern(d.shape, d.tn)))

        def prep(eng):
            eng.init(pipe)
            raw = eng.build_raw_fn([self.out_node])
            return raw, dict(eng._weights_dev)

        raw_a, w_a = prep(self.a)
        raw_b, w_b = prep(self.b)
        ins = {"data": jax.device_put(x.data, self.a.device())}
        ta, tb = ab_compare(lambda w, i: raw_a(w["a"], i),
                            lambda w, i: raw_b(w["b"], i),
                            {"a": w_a, "b": w_b}, ins,
                            n_legs=self.ab_legs)
        print(f"net_ab {pipe.name} img={self.img}: "
              f"A {ta*1e6:.1f} us/fwd ({self.img/ta:.1f} img/s)  "
              f"B {tb*1e6:.1f} us/fwd ({self.img/tb:.1f} img/s)  "
              f"B/A speedup {ta/tb:.3f}x "
              f"({'B wins' if tb < ta * 0.9 else 'A wins' if ta < tb * 0.9 else 'parity (within noise)'})")
