"""Forward-computation engines: compile a ConvPipe into one XLA program.

Parity target: ``has_conv_fwd_t`` (ref src/has_conv_fwd.H:16) and its two
implementations — ``conv_pipe_fwd_t`` (mode=rtc, the generated-kernel engine,
rtc_fwd.cc:43) and ``caffe_fwd_t`` (the oracle, caffe_fwd.cc:40). Here:

  * ``xla``   — whole-net jit using stock XLA ops only (library path; on CPU
                in f32/highest precision it plays the Caffe-oracle role).
  * ``pallas``— same graph but matmul-like hot ops (Convolution/InnerProduct)
                lower to generated Pallas kernels chosen by the
                variant-selection policy (ref add_cnn_codegen_annotations,
                cnn_op.cc:16); everything else stays XLA and fuses around.

TPU-first difference from the reference: instead of a recorded list of
per-kernel launches replayed one by one (rtc_fwd.cc:547), the whole net is ONE
jit program — XLA owns scheduling, fusion, and layout. Per-layer outputs for
regression tests are produced by requesting intermediate nodes as outputs
(which disables fusion across those nodes only for that run).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..config import ConfigError, Field, register, register_base
from ..utils.dims import NDA, Dims, np_dtype
from ..utils.timers import timer
from .lowering import LowerCtx, lower_op
from .pipe import ConvPipe, PipeError


def _jnp_dt(tn: str):
    from ..rtc.backends import _jnp_dtype
    return _jnp_dtype(tn)


@register_base("conv_fwd", tid_vn="mode")
class FwdEngine:
    """Abstract engine: init(pipe) then run_fwd(ins, out_names)."""

    precision = Field(str, default="highest", help="MXU precision: default/high/highest")
    # compute dtype override: 'bfloat16' casts weights at upload and inputs at
    # entry, computes the whole net in bf16 (native MXU rate), and returns
    # outputs in each node's logical dtype. '' = keep input dtypes (f32).
    compute_tn = Field(str, default="", help="compute dtype: '' | bfloat16 | float32")
    platform = Field(str, default="", help="jax platform override ('' = default)")
    train = Field(bool, default="0", help="training mode (dropout active)")
    det_drop_seed = Field(int, default="0", help="deterministic dropout seed")
    # per-node activation statistics computed on-device (ref var_stats.cucl /
    # gen_op_stats, rtc_fwd.cc:163); surfaced via get_info_log()
    per_layer_stats = Field(bool, default="0", help="collect per-node var stats")
    # fixed-point quantization injection (ref gen_op_quantize, rtc_fwd.cc:212):
    # node name -> (max_val=...,keep_bits=...) clamps + drops mantissa bits
    quantize = Field((dict, "lexp"), default="()",
                     help="per-node quantization: (node=(max_val=8,keep_bits=6),...)")
    # multi-chip mesh, e.g. (dp=2,tp=4): dp shards the img dim of inputs;
    # tp shards conv/fc weights over out_chan (XLA engine: GSPMD inserts the
    # collectives; Pallas engine: dp only, via shard_map around the net fn)
    mesh = Field("lexp", default="()", help="device mesh axes, e.g. (dp=2,tp=4)")
    # gen_src analog (ref rtc_compute.H:39-40): dump each compiled program's
    # lowered StableHLO + backend-optimized HLO text
    gen_src_dir = Field(str, default="", help="dump compiled program sources here")
    # backend compiler flags for every whole-net jit, e.g.
    # (xla_tpu_scoped_vmem_limit_kib=65536). XLA_FLAGS cannot carry TPU
    # backend flags on remote-compile platforms (the client-side env parser
    # rejects them); jit(compiler_options=...) ships them with the program
    # and the backend validates them (unknown flags are a compile error).
    compiler_options = Field((dict, "lexp"), default="()",
                             help="per-program backend flags, e.g. "
                                  "(xla_tpu_scoped_vmem_limit_kib=65536)")

    def base_setup(self) -> None:
        self.pipe: Optional[ConvPipe] = None
        self._fn: Optional[Callable] = None
        self._out_names: list[str] = []
        self._info_log: list[str] = []
        self._weights_dev: dict = {}
        co = self.compiler_options
        if isinstance(co, dict):  # programmatic make(compiler_options={...})
            self._copts = {k: str(v) for k, v in co.items()} or None
        else:
            self._copts = {k: str(v.leaf_val)
                           for k, v in (co.kids if co else [])} or None
        self._mesh = None
        axes = {k: int(v.leaf_val) for k, v in (self.mesh.kids if self.mesh else [])}
        if axes:
            from ..parallel.mesh import make_mesh
            self._mesh = make_mesh(axes)

    # -- mesh helpers -------------------------------------------------------------
    def _weight_sharding(self, name: str):
        from jax.sharding import NamedSharding, PartitionSpec
        w = self.pipe.weights[name]
        spec = [None] * len(w.dims)
        if "tp" in self._mesh.axis_names and self._mesh.shape["tp"] > 1 and \
                "out_chan" in w.dims.names and len(w.dims) > 1 and \
                w.dims["out_chan"] % self._mesh.shape["tp"] == 0:
            spec[w.dims.index("out_chan")] = "tp"
        return NamedSharding(self._mesh, PartitionSpec(*spec))

    def _input_sharding(self, dims: Dims):
        from jax.sharding import NamedSharding, PartitionSpec
        spec = [None] * len(dims)
        if "dp" in self._mesh.axis_names and "img" in dims.names and \
                dims["img"] % self._mesh.shape["dp"] == 0:
            spec[dims.index("img")] = "dp"
        return NamedSharding(self._mesh, PartitionSpec(*spec))

    # -- interface (ref has_conv_fwd.H:16-24) -----------------------------------
    def init(self, pipe: ConvPipe) -> None:
        self.pipe = pipe
        self._lowered = {}
        # timing chains close over the lowered program; a re-init (e.g.
        # net_tune applying a new per_op_tune) must invalidate them or
        # time_fwd keeps timing the stale build
        self._chain_fns = {}
        ctx = self.lower_ctx()
        for op_name in pipe.topo_op_order():
            op = pipe.ops[op_name]
            self._lowered[op_name] = self.lower_one(pipe, op, ctx)
        self._upload_weights()

    def lower_ctx(self) -> LowerCtx:
        amax = None
        if getattr(self, "calib_fn", ""):
            from ..prof.calib import read_calib
            amax = read_calib(self.calib_fn)
        return LowerCtx(precision=self.precision, train=self.train,
                        det_drop_seed=self.det_drop_seed, act_amax=amax)

    def lower_one(self, pipe: ConvPipe, op, ctx: LowerCtx) -> Callable:
        return lower_op(pipe, op, ctx)

    def device(self):
        import jax
        if self.platform:
            return jax.devices(self.platform)[0]
        return jax.devices()[0]

    def _cast_w(self, data):
        if self.compute_tn:
            data = data.astype(np_dtype(self.compute_tn))
        return data

    def _upload_weights(self) -> None:
        import jax
        if self._mesh is not None:
            self._weights_dev = {
                k: jax.device_put(self._cast_w(w.data), self._weight_sharding(k))
                for k, w in self.pipe.weights.items()}
            return
        dev = self.device()
        self._weights_dev = {k: jax.device_put(self._cast_w(w.data), dev)
                             for k, w in self.pipe.weights.items()}

    def example_weights(self) -> dict:
        """Host-side weights in the engine's expected (cast+prepped) form —
        what build_raw_fn's `weights` argument must look like."""
        return {k: self._cast_w(w.data) for k, w in self.pipe.weights.items()}

    def set_det_drop_seed(self, seed: int) -> None:
        self.det_drop_seed = seed
        if self.pipe is not None:
            self._fn = None
            self._fn_key = None  # force _build_fn on next run (compile_for caches by key)
            self.init(self.pipe)

    def get_info_log(self) -> str:
        return "\n".join(self._info_log)

    # -- compilation ----------------------------------------------------------------
    def build_raw_fn(self, out_names: list[str]) -> Callable:
        """The un-jitted pure net function fn(weights, inputs) -> {name: arr}."""
        import jax
        import jax.numpy as jnp
        pipe = self.pipe
        topo = pipe.topo_op_order()
        lowered = self._lowered
        quant = {}
        for node, q in (self.quantize or {}).items():
            qv = {k: float(v.leaf_val) for k, v in q.kids}
            quant[node] = (qv.get("max_val", 8.0), int(qv.get("keep_bits", 8)))
        stats = self.per_layer_stats

        def _quantize(x, max_val, keep_bits):
            # clamp + fixed-point bit-drop (ref quantize.cucl semantics)
            levels = float(2 ** keep_bits)
            q = jnp.clip(x, 0.0, max_val)
            return jnp.floor(q * (levels / max_val)) * (max_val / levels)

        cdt = _jnp_dt(self.compute_tn) if self.compute_tn else None

        def net_fn(weights: dict, inputs: dict):
            vals = {k: (v.astype(cdt) if cdt is not None and
                        jnp.issubdtype(v.dtype, jnp.floating) else v)
                    for k, v in inputs.items()}
            vals.update(weights)
            stat_out = {}
            # prune to the subgraph reaching out_names from the provided
            # inputs: ops whose tops are all available (given) or not needed
            # are skipped, so mid-graph nodes (e.g. pool1) work as inputs
            # (ref conv_pipe run-from-node subsets, conv_util.cc:660+).
            needed = set(out_names)
            run_ops = []
            for op_name in reversed(topo):
                op = pipe.ops[op_name]
                if any(t in needed and t not in vals for t in op.tops):
                    run_ops.append(op_name)
                    needed.update(b for b in op.bots if b not in vals)
            run_ops.reverse()
            for op_name in run_ops:
                op = pipe.ops[op_name]
                try:
                    bot_vals = [vals[b] for b in op.bots]
                except KeyError as e:
                    raise PipeError(f"op {op_name!r}: missing input {e}") from None
                with jax.named_scope(op_name):  # see nhwc engine note
                    outs = lowered[op_name](*bot_vals)
                for t, v in zip(op.tops, outs):
                    if t in quant:
                        v = _quantize(v, *quant[t])
                    vals[t] = v
                    if stats:
                        v32 = v.astype(jnp.float32)
                        stat_out[t] = jnp.stack(
                            [jnp.min(v32), jnp.max(v32), jnp.sum(v32),
                             jnp.sum(v32 * v32)])
            res = {}
            for n in out_names:
                v = vals[n]
                if cdt is not None:
                    v = v.astype(_jnp_dt(pipe.must_dims(n).tn))
                res[n] = v
            if stats:
                res["__stats__"] = stat_out
            return res

        return net_fn

    def _jit(self, fn, **kw):
        """jax.jit with the engine's compiler_options applied (if any)."""
        import jax
        if self._copts:
            kw["compiler_options"] = self._copts
        return jax.jit(fn, **kw)

    def _build_fn(self, in_names: list[str], out_names: list[str]) -> Callable:
        raw = self.build_raw_fn(out_names)
        if self._mesh is None:
            return self._jit(raw)
        return self._build_sharded_fn(raw, in_names, out_names)

    def _build_sharded_fn(self, raw, in_names, out_names) -> Callable:
        """GSPMD path: jit with explicit in/out shardings over the mesh; XLA
        propagates activation shardings and inserts collectives over ICI."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec
        # shard map over the ACTUAL uploaded dict: prefolded entries
        # (X__folded) inherit their source weight X's sharding
        w_sh = {k: self._weight_sharding(k.removesuffix("__folded"))
                for k in self._weights_dev}
        in_sh = {n: self._input_sharding(self.pipe.must_dims(n))
                 for n in in_names}
        out_sh = {n: self._input_sharding(self.pipe.must_dims(n))
                  for n in out_names}
        jitted = self._jit(raw, in_shardings=(w_sh, in_sh),
                           out_shardings=out_sh)

        def fn(weights, inputs):
            with self._mesh:
                return jitted(weights, inputs)
        return fn

    def compile_for(self, in_names: list[str], out_names: list[str]) -> None:
        key = (tuple(in_names), tuple(out_names))
        if getattr(self, "_fn_key", None) != key:
            with timer("fwd_compile"):
                self._fn = self._build_fn(in_names, out_names)
                self._fn_key = key

    def _dump_src(self, dev_ins) -> None:
        """gen_src analog (ref rtc_compute.H:39-40, nvrtc_util.cc:223-230:
        gen_src=1 dumps each generated .cu/.cl + PTX): write the lowered
        StableHLO and the backend-optimized HLO of the compiled whole-net
        program to gen_src_dir."""
        import os

        import jax

        from ..config import get_env
        from ..utils.dims import stable_hash
        d = self.gen_src_dir
        if not os.path.isabs(d):  # relative: under the running mode's out dir
            d = os.path.join(get_env().get("boda_output_dir", "."), d)
        os.makedirs(d, exist_ok=True)
        raw = self.build_raw_fn(list(self._fn_key[1]))
        lowered = jax.jit(raw).lower(self._weights_dev, dev_ins)
        tag = f"{self.pipe.name}_{stable_hash(repr(self._fn_key)) & 0xFFFF:04x}"
        with open(os.path.join(d, f"{tag}.stablehlo.txt"), "w") as f:
            f.write(lowered.as_text())
        wrote = [f"{tag}.stablehlo.txt"]
        try:
            import re as _re
            comp = lowered.compile()
            # strip source-location metadata (file/line/call-stack tables
            # shift with any edit or different call context and would churn
            # the gen_src goldens)
            hlo = comp.as_text()
            hlo = _re.sub(r", metadata=\{[^}]*\}", "", hlo)
            hlo = _re.sub(
                r"(?ms)^(FileNames|FunctionNames|FileLocations|StackFrames)"
                r"\n(^\d+ .*\n)*", "", hlo)
            hlo = _re.sub(r"\n{3,}", "\n\n", hlo)
            with open(os.path.join(d, f"{tag}.opt_hlo.txt"), "w") as f:
                f.write(hlo)
            wrote.append(f"{tag}.opt_hlo.txt")
        except Exception as e:  # optimized-HLO text is backend-best-effort
            self._info_log.append(f"gen_src: opt-HLO unavailable ({e})")
        self._dumped_key = self._fn_key
        self._info_log.append(f"gen_src: wrote {', '.join(wrote)}")

    def run_fwd(self, ins: dict[str, NDA], out_names: list[str]) -> dict[str, NDA]:
        import jax
        dev = self.device()
        in_names = sorted(ins)
        self.compile_for(in_names, out_names)
        with timer("fwd_h2d"):
            if self._mesh is not None:
                dev_ins = {k: jax.device_put(v.data, self._input_sharding(v.dims))
                           for k, v in ins.items()}
            else:
                dev_ins = {k: jax.device_put(v.data, dev) for k, v in ins.items()}
        if self.gen_src_dir and getattr(self, "_dumped_key", None) != self._fn_key:
            self._dump_src(dev_ins)
        with timer("fwd_run"):
            outs = self._fn(self._weights_dev, dev_ins)
            jax.tree_util.tree_map(
                lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
                outs)
        stats = outs.pop("__stats__", None) if isinstance(outs, dict) else None
        if stats is not None:
            self._last_stats = {n: np.asarray(s) for n, s in stats.items()}
            for n, s in self._last_stats.items():
                cnt = self.pipe.must_dims(n).num_elems()
                self._info_log.append(
                    f"var_stats {n}: min={s[0]:.6g} max={s[1]:.6g} "
                    f"avg={s[2] / cnt:.6g} sum_sq={s[3]:.6g} cnt={cnt}")
        with timer("fwd_d2h"):
            res = {}
            for n, arr in outs.items():
                d = self.pipe.must_dims(n)
                res[n] = NDA(d, np.asarray(arr, dtype=np_dtype(d.tn)))
        return res

    def per_layer_times(self, ins: dict[str, NDA], n_iters: int = 10) -> dict[str, float]:
        """Per-op runtimes: each op's lowered fn jitted standalone and timed on
        the activations from a real forward pass (ref per_layer_time dumps,
        rtc_fwd.cc:560-572; with a whole-net XLA program, standalone per-op
        timing is the honest decomposition — fusion effects excluded)."""
        import jax

        from ..rtc.backends import time_diff_method
        pipe = self.pipe
        # materialize every op input via a full forward
        all_nodes = [n for n, node in pipe.nodes.items()
                     if node.dims is not None and n not in pipe.weights]
        acts = self.run_fwd(ins, [n for n in all_nodes
                                  if pipe.nodes[n].top_for or n in ins])
        dev = self.device()
        vals = {k: jax.device_put(self._to_internal(k, v.data), dev)
                for k, v in acts.items()}
        vals.update(self._weights_dev)
        out: dict[str, float] = {}
        for op_name in pipe.topo_op_order():
            op = pipe.ops[op_name]
            try:
                bots = [vals[b] for b in op.bots]
            except KeyError:
                continue
            fn = jax.jit(self._lowered[op_name])
            try:
                secs = time_diff_method(
                    lambda fn=fn, bots=bots: fn(*bots),
                    lambda outs: jax.tree_util.tree_map(
                        lambda a: a.block_until_ready()
                        if hasattr(a, "block_until_ready") else a, outs),
                    n_iters=n_iters, warmup=2)
            except Exception as e:  # per-op lowering may need engine prep
                self._info_log.append(f"per_layer_times: {op_name} skipped ({e})")
                continue
            out[op_name] = secs
        return out

    def _to_internal(self, node: str, arr):
        """Convert a logical (NCHW) activation to the engine's internal layout."""
        return arr

    def time_fwd(self, ins: dict[str, NDA], out_names: list[str],
                 n_iters: int = 20, warmup: int = 3, chain: int = 1) -> float:
        """Steady-state secs per whole-net forward (difference method — see
        rtc/backends.time_diff_method: cancels fixed dispatch/sync latency).

        chain > 1 runs the repeat loop ON DEVICE: `n_iters` (and `2*n_iters`)
        data-dependent forwards inside ONE compiled program (lax.scan with a
        carried ~0 perturbation that defeats CSE), each timed as a single
        dispatch. Over a high-latency dispatch path (the remote-TPU tunnel's
        ~26ms RTT dwarfs a ~2ms forward) host-side repeat loops measure
        dispatch batching and jitter, not device time — readings above the
        hardware roofline were observed that way. With the loop on device the
        iteration count is exact; the N vs 2N scan-length slope cancels the
        per-dispatch RTT; and min-aggregation over reps is sound because RTT
        noise is additive-positive. The batched analog of the reference's
        single-stream launch replay (rtc_fwd.cc:547) + its double-run warm
        timing (enable_double_run, rtc_fwd.cc:51)."""
        import time as _time

        import jax

        from ..rtc.backends import time_diff_method
        dev = self.device()
        self.compile_for(sorted(ins), out_names)
        dev_ins = {k: jax.device_put(v.data, dev) for k, v in ins.items()}
        if chain <= 1 or self._mesh is not None:
            return time_diff_method(
                lambda: self._fn(self._weights_dev, dev_ins),
                lambda outs: _block_tree(outs), n_iters, warmup)
        import jax.numpy as jnp
        from jax import lax
        raw = self.build_raw_fn(out_names)

        def chained(weights, xins, length):
            def step(carry, _):
                pins = {}
                for k, v in xins.items():
                    if jnp.issubdtype(v.dtype, jnp.floating):
                        pins[k] = v + carry.astype(v.dtype)
                    else:
                        pins[k] = v
                outs = raw(weights, pins)
                # full reduction, not out[0]: a lone slice can be pushed back
                # through dots/convs by XLA, DCE-ing most of the leg (see
                # prof/abtime.py); the sum forces every element to exist
                tot = jnp.float32(0.0)
                for leaf in jax.tree_util.tree_leaves(outs):
                    if jnp.issubdtype(leaf.dtype, jnp.floating):
                        # abs: a LINEAR full reduction of a matmul can be
                        # strength-reduced by XLA to O(N^2) (sum(XW) =
                        # sum_k rowsum(X)_k * colsum(W)_k — observed 290
                        # "TF/s" on a 197 TF/s part); abs blocks the rewrite
                        tot = tot + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                return tot * 1e-30, None
            return lax.scan(step, jnp.float32(0.0), None, length=length)[0]

        n = max(4, n_iters)
        cache = getattr(self, "_chain_fns", None)
        if cache is None:
            cache = self._chain_fns = {}
        fns = {}
        for length in (n, 2 * n):
            key = (tuple(sorted(ins)), tuple(out_names), length)
            if key not in cache:
                cache[key] = self._jit(
                    lambda w, x, length=length: chained(w, x, length))
            fns[length] = cache[key]

        def run(length):
            t0 = _time.perf_counter()
            # scalar D2H read: block_until_ready has been observed returning
            # before device completion on the tunneled platform (abtime.py)
            float(fns[length](self._weights_dev, dev_ins))
            return _time.perf_counter() - t0

        for length in fns:  # compile + warm
            for _ in range(max(1, warmup - 1)):
                run(length)
        # median of 3 paired slope passes (each pass: best-of-4 per length,
        # interleaved). Independent min-per-length lets ONE anomalous read
        # collapse the whole slope: observed a 10x-too-fast t_2n over the
        # tunnel that turned a 2ms forward into an impossible 188us (6.7x
        # the hardware peak). A median needs the anomaly in 2 of 3 passes.
        # best-of-4 endpoints: RTT noise is additive-positive, so each min
        # converges to the true endpoint FROM ABOVE — with only 2 reads the
        # residual ms-scale inflation divided by n read ~10% high vs the
        # abtime harness's 4-read endpoints on the identical program.
        import statistics
        diffs = []
        for _ in range(3):
            t_n = min(run(n) for _ in range(4))
            t_2n = min(run(2 * n) for _ in range(4))
            diffs.append(t_2n - t_n)
        return max(statistics.median(diffs) / n, 1e-12)


def _block_tree(tree) -> None:
    import jax
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, tree)


@register("conv_fwd", "xla", help="whole-net XLA engine (library path / CPU oracle)")
class XlaFwd(FwdEngine):
    pass


@register("conv_fwd", "pallas", help="generated-Pallas-kernel engine for hot ops")
class PallasFwd(FwdEngine):
    tune = Field("lexp", default="()", help="default op_tune for generated kernels")
    per_op_tune = Field((dict, "lexp"), default="()", help="per-op-name tune overrides")
    # layout=nhwc runs the whole net channels-last (no transposes between
    # layers; the TPU-native answer to the reference's xpose-var machinery)
    layout = Field(str, default="nhwc", help="internal layout: nhwc | nchw")
    # conv+ReLU fusion (ref rtc_fwd.cc:490): applied per-compile, only when
    # the pre-ReLU node is not a requested output (per-layer tests still work)
    fuse_relu = Field(bool, default="1", help="fuse ReLU into conv/fc stores")
    # residual fusion: fold Eltwise(sum)+ReLU tails (ResNet blocks) into the
    # producing conv kernel's store epilogue (saves one HBM round trip of the
    # conv output per residual block; no reference analog — the reference
    # never fused across eltwise)
    fuse_eltwise = Field(bool, default="1", help="fuse residual add into conv stores")
    # whole-block fusion: lower an entire residual bottleneck (1x1 -> 3x3 ->
    # 1x1 + skip, ResNet identity blocks) to ONE Pallas kernel holding every
    # intermediate plane in VMEM (ops/kernels/block.py). Motivated by
    # net_decomp: large-spatial 1x1 convs are HBM-bound unfused (~51 FLOP/B
    # vs the ~240 FLOP/B v5e ridge); the block kernel cuts activation
    # traffic from ~8 plane transfers to 2. Orthogonal to kernel_policy
    # (XLA cannot fuse across its conv calls — this is a generated-kernel
    # capability, applied even under the lib policy when it wins).
    fuse_block = Field(bool, default="0", help="fuse residual bottleneck blocks")
    # constant-fold BN/Scale into conv weights ONCE at weight upload (one
    # jitted fold over the uploaded weights — numerically identical to the
    # in-jit fold it replaces) instead of re-folding inside every forward.
    # The in-jit fold costs a full read+scale+write of every fused conv's
    # weights per dispatch — batch-INDEPENDENT device time (~25M weights on
    # resnet50; net_trace attributed ~110us/fwd of bare convert_element_type
    # plus the scale multiplies at b32 on v5e). Inference weights are frozen,
    # so the fold is a constant of the engine build. Disabled automatically
    # for backward graphs (gradients must flow through the unfolded params).
    prefold = Field(bool, default="1", help="fold BN/Scale at upload, not per-forward")
    # host-side stem space-to-depth: the data loader feeds the net input
    # ALREADY in the stem_s2d folded layout (N, oy+m-1, ox+m-1, s*s*C), so
    # the starved-C stem conv (7x7s2 C=3 -> MXU wastes the 128-deep contract
    # dim) becomes a stride-1 conv over s*s*C channels with NO per-forward
    # device-side rearrange (the in-jit fold's pad+minor-dim transpose is
    # what erased stem_s2d's standalone 1.35x win whole-net). The fold is a
    # pure relayout the loader performs at decode time (host_input_s2d).
    # Forces tune.stem_s2d=1 on the qualifying input conv; logical-layout
    # and plain-NHWC inputs remain accepted (the fold then runs in-jit).
    input_s2d = Field(bool, default="0",
                      help="accept net input pre-folded to the stem_s2d layout")
    # entry channel pad on top of input_s2d: the loader emits the folded
    # input with channels zero-padded to this lane-aligned count (and the
    # stem weights pad to match at upload), so XLA's entry-layout pad copy
    # (the 108us/fwd inputs['data'] row, docs/mfu_ceiling.md) never runs.
    # 0 = exact folded channels. Requires input_s2d.
    input_pad_c = Field(int, default="0",
                        help="pad the pre-folded entry channels to this count")
    # int8 MXU inference: dynamic symmetric quantization of conv/fc compute
    # (per-tensor act scales, per-out-channel weight scales, int32 acc).
    # See OpTune.int8 — this sets the engine-wide default; per-op tunes can
    # override (e.g. keep a sensitive layer in bf16 via per_op_tune).
    int8 = Field(bool, default="0", help="int8 MXU conv/fc compute")
    # static int8 calibration sidecar (net_calib mode): per-node act amax.
    # When set, int8 conv/fc use the persisted per-tensor scales instead of
    # computing a runtime amax reduce every forward (prof/calib.py).
    calib_fn = Field("filename", default="", help="activation-amax calibration file")
    # selective int8 ACTIVATION STORAGE (distinct from int8 compute): the
    # listed nodes (names or glob patterns) are stored in HBM as int8
    # (uint8 when provably non-negative — ReLU/pool outputs) with static
    # per-tensor scales from calib_fn; every consumer dequantizes on read
    # and compute stays in compute_tn. Targets the HBM-roofline stages
    # (docs/mfu_ceiling.md prices r50's res2 branch2c chains AT the bf16
    # roofline at b32 — 115.6 MB min traffic/op; halving the activation
    # byte width moves that roofline). The quantize fuses into the
    # producing fusion's store and the dequant into each consumer, so the
    # bf16 value never exists in HBM. Reference semantics analog: per-node
    # quantization injection (ref test/rtc/quantize.cucl, rtc_fwd.cc:212)
    # — making it a bandwidth tool is the TPU-native extension. Requires
    # calib_fn amax entries for every matched node; inference-only (the
    # rounding has zero gradient). NHWC layout only.
    act_int8 = Field((list, str), default="()",
                     help="store these activation nodes as int8 (glob ok)")
    # default conv/fc variant family. Measured on v5e (r50 bf16 b32, chained
    # difference timing): the XLA conv lowering inside our fused NHWC program
    # reaches 127 TF/s (64% MXU peak) vs 53 TF/s for the generated Pallas
    # kernels — XLA's conv emitter IS the speed of light at inference batch
    # sizes, so the library path is the default (the reference reached the
    # opposite conclusion on Maxwell vs cuDNN; on TPU the tpu-first rule
    # "don't hand-schedule what the compiler does better" wins). 'gen' forces
    # the generated-kernel policy chain (k1conv/halo/direct/s2d) — used by
    # the kernel-fidelity gates; explicit per-op/wisdom tunes always win.
    kernel_policy = Field(str, default="lib",
                          help="conv variant default: lib (XLA) | gen (generated kernels)")
    # autotuning wisdom: best recorded tune per op signature + platform
    # (ref: per-op tune selection from wisdom files, op-tuner.cc)
    wisdom_fn = Field("filename", default="", help="wisdom file for per-op tunes")
    # net-level tune: run the subgraph in_node->out_node as k batch chunks
    # compiled inside the one jit (entries "in_node:out_node:k"). XLA's
    # conv emitter occasionally compiles a stage pathologically at large
    # batch (measured: r50 res2@b64 in-net costs 2.35x its b32 time while
    # every other stage scales ~linearly); chunking restores the
    # small-batch compilation for that stage only, leaving the rest at
    # full batch. Inference ops are per-sample along img, so the split is
    # semantics-exact. The reference tunes work decomposition per op
    # (gbt_tile.H:24, op_tune_t cnn_op.H:10); on TPU the decomposition
    # belongs to XLA, and THIS is the remaining externally-tunable axis.
    batch_split = Field((list, str), default="()",
                        help="batch-split regions 'in_node:out_node:k'")

    def fusion_fingerprint(self) -> str:
        """Stable tag of the engine configuration that shapes what a 'good'
        per-op tune is (fusion structure + layout + dtype). Wisdom recorded
        under one fingerprint must not be applied under another: standalone
        tunes measured pre-BN-folding actively regressed the folded engine
        (see NOTES_ROUND2 / round-1 verdict)."""
        from ..utils.dims import stable_hash
        cfg = (self.layout, bool(self.fuse_relu), bool(self.fuse_eltwise),
               self.compute_tn, self.precision, bool(self.int8),
               self.kernel_policy) + \
            ((("block",) if self.fuse_block else ())) + \
            ((("prefold",) if self.prefold else ())) + \
            ((("input_s2d",) if self.input_s2d else ())) + \
            (((f"pad_c{self.input_pad_c}",) if self.input_pad_c else ())) + \
            (tuple(sorted(map(str, self.batch_split)))
             if self.batch_split else ()) + \
            (("act_int8",) + tuple(sorted(map(str, self.act_int8)))
             if self.act_int8 else ())
        return f"{stable_hash(repr(cfg)) & 0xFFFFFFFF:08x}"

    def wisdom_plats(self) -> tuple[str, str]:
        """(net-context plat tag, standalone plat tag) for wisdom records."""
        plat = f"tpu:{getattr(self.device(), 'device_kind', '?')}".replace(" ", "_")
        return f"net:{plat}:{self.fusion_fingerprint()}", plat

    def wisdom_sig(self, op_name: str):
        """The signature THIS engine uses for wisdom lookup of op_name:
        rtc sig with dims re-typed to the engine's compute dtype. Writers
        (net_tune, ops_prof wisdom emit) must key records the same way or
        lookups silently miss."""
        from ..ops.sig_of import rtc_sig_of
        sig = rtc_sig_of(self.pipe, self.pipe.ops[op_name]) \
            if self.pipe is not None and op_name in self.pipe.ops else None
        if sig is None:
            return None
        if self.compute_tn:  # wisdom keys carry the compute dtype
            sig.dims_vals = {k: d.with_tn(self.compute_tn)
                             for k, d in sig.dims_vals.items()}
        return sig

    def _wisdom_tune(self, op_name: str):
        """Best recorded tune for this op's signature on this platform.
        Preference order: net-level runs with OUR fusion fingerprint, then
        standalone runs for this device. Net runs from a different
        fingerprint are ignored entirely (they tuned a different program)."""
        if not self.wisdom_fn:
            return None
        if not hasattr(self, "_wisdom"):
            from ..prof.wisdom import read_wisdom
            self._wisdom = {w.op.key(): w for w in read_wisdom(self.wisdom_fn)}
        sig = self.wisdom_sig(op_name)
        if sig is None:
            return None
        w = self._wisdom.get(sig.key())
        if w is None:
            return None
        net_plat, plat = self.wisdom_plats()
        best = w.best(net_plat) or w.best(plat)
        if best is None:
            # last resort: standalone runs from other platforms transfer
            # imperfectly but harmlessly; net-tuned runs from a DIFFERENT
            # fusion fingerprint are excluded (they tuned a different program
            # and have been observed to regress this one)
            standalone = [r for r in w.runs if not r.plat.startswith("net:")]
            ab = [r for r in standalone if r.method == "ab"]  # trust tiers
            standalone = ab or standalone
            best = min(standalone, key=lambda r: r.secs) if standalone else None
        if best is None:
            return None
        self._info_log.append(f"{op_name}: wisdom tune {best.tune} "
                              f"({best.secs * 1e6:.1f}us on {best.plat})")
        from ..utils.lexp import parse_lexp
        return parse_lexp(best.tune)

    def op_tune(self, op_name: str):
        import dataclasses

        from ..ops.tune import OpTune
        t = self.per_op_tune.get(op_name)
        if t is None:
            t = self._wisdom_tune(op_name)
        tune = OpTune.from_lexp(t) if t is not None else OpTune.from_lexp(self.tune)
        # the engine's precision is the default for generated kernels unless
        # the tune overrides it; bf16 compute forces bf16-native MXU passes
        # (Mosaic rejects fp32 contract precision on bf16 operands)
        if (t is None or t.get_kid("precision") is None) and \
                "precision" not in str(self.tune):
            prec = self.precision
            if self.compute_tn == "bfloat16":
                prec = "default"
            tune = dataclasses.replace(tune, precision=prec)
        if self.int8 and (t is None or t.get_kid("int8") is None):
            tune = dataclasses.replace(tune, int8=True)
        # library-default policy: only when no explicit per-op/wisdom tune
        # exists (an explicit tune is a full variant choice — e.g. wisdom
        # naming kernel blocks implies the generated family) and the
        # engine-level tune doesn't mention use_xla
        explicit = t is not None and bool(
            t.leaf_val if t.is_leaf else t.kids)
        if self.kernel_policy == "lib" and not explicit \
                and "use_xla" not in str(self.tune):
            tune = dataclasses.replace(tune, use_xla=True)
        # tp sharding runs the GSPMD path, which cannot partition pallas_call
        # custom calls: a wisdom/per-op tune naming a generated kernel would
        # silently change the sharding story (XLA either rejects or fully
        # replicates the op). Force the library lowering per op under tp —
        # gen tunes apply to unsharded and dp-only runs. The engine-level
        # kernel_policy=gen case keeps its hard error in _build_sharded_fn.
        if (not tune.use_xla and self.kernel_policy == "lib"
                and self._mesh is not None
                and "tp" in self._mesh.axis_names
                and self._mesh.shape["tp"] > 1):
            self._info_log.append(
                f"{op_name}: tp>1 forces use_xla (gen tune deferred)")
            tune = dataclasses.replace(tune, use_xla=True)
        # input_s2d stems MUST lower via the stem_s2d rule (the pre-folded
        # input shape only matches that rule's conv) — wins over wisdom/policy
        if op_name in getattr(self, "_input_s2d_ops", ()):
            tune = dataclasses.replace(tune, stem_s2d=1,
                                       pad_c=self.input_pad_c)
        return tune

    def _build_sharded_fn(self, raw, in_names, out_names) -> Callable:
        """Pallas kernels are opaque to GSPMD; shard the batch (dp) via
        shard_map — each device runs the full Pallas net on its img slice.
        tp>1: under the library kernel policy the program contains no
        Pallas calls, so the plain GSPMD path (explicit weight/input
        shardings, XLA-inserted collectives) applies; with generated
        kernels forced, tp still requires the xla engine."""
        import jax
        from jax.sharding import PartitionSpec as P
        if "tp" in self._mesh.axis_names and self._mesh.shape["tp"] > 1:
            if self.kernel_policy == "lib":
                return FwdEngine._build_sharded_fn(self, raw, in_names,
                                                   out_names)
            raise PipeError("pallas engine shards dp only with generated "
                            "kernels; use kernel_policy=lib or mode=xla for tp")
        import inspect
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:
            from jax.experimental.shard_map import shard_map
        # the replication-check kwarg was renamed check_rep -> check_vma;
        # key off the actual signature, not the import location (jax ~0.6
        # exports jax.shard_map still taking check_rep)
        params = inspect.signature(shard_map).parameters
        rep_kw = {"check_vma": False} if "check_vma" in params \
            else {"check_rep": False}
        # specs over the ACTUAL uploaded dict (prefolded entries included —
        # all weights are replicated under dp-only shard_map)
        w_specs = {k: P() for k in self._weights_dev}
        in_specs = {n: P("dp") for n in in_names}
        out_specs = {n: P("dp") for n in out_names}
        smapped = shard_map(raw, mesh=self._mesh, in_specs=(w_specs, in_specs),
                            out_specs=out_specs, **rep_kw)
        jitted = self._jit(smapped)

        def fn(weights, inputs):
            with self._mesh:
                return jitted(weights, inputs)
        return fn

    def _weight_sharding(self, name: str):
        """tp weight sharding in the engine's PHYSICAL layout: the NHWC
        engine pre-transposes weights at upload (e.g. conv OIHW -> HWIO,
        out_chan moves axis 0 -> 3), so the logical-dims spec of the base
        engine would shard the wrong axis. The prep's axis mapping is
        recovered by tracing an out_chan-indexed marker array through it."""
        from jax.sharding import NamedSharding, PartitionSpec
        base = super()._weight_sharding(name)
        prep = getattr(self, "_weight_preps", {}).get(name)
        if prep is None or all(s is None for s in base.spec):
            return base
        import numpy as np
        w = self.pipe.weights[name]
        oc_ix = w.dims.index("out_chan")
        oc = w.dims.shape[oc_ix]
        shape = [1] * len(w.dims)
        shape[oc_ix] = oc
        marker = np.broadcast_to(
            np.arange(oc, dtype=np.int32).reshape(shape), w.dims.shape)
        p = np.asarray(prep[0](marker) if isinstance(prep, tuple) else
                       prep(marker))
        spec = [None] * p.ndim
        for a in range(p.ndim):
            if p.shape[a] == oc and \
                    all(bool(np.all(np.take(p, i, axis=a) == i))
                        for i in (0, p.shape[a] - 1)):
                spec[a] = "tp"
                break
        return NamedSharding(self._mesh, PartitionSpec(*spec))

    def init(self, pipe: ConvPipe) -> None:
        self.pipe = pipe
        self._weight_preps: dict[str, Callable] = {}
        self._lowered = {}
        self._lowered_fused = {}
        self._chain_fns = {}  # see base init: stale-timing invalidation
        ctx = self.lower_ctx()
        if self.int8 and not self.calib_fn:
            # measured on v5e (docs/mfu_ceiling.md): DYNAMIC int8 is a
            # 0.80x regression vs bf16 (the per-forward amax reduces eat
            # the TOPS win) while STATIC-calib int8 is 1.15x — engine-wide
            # int8 without a calib sidecar silently picks the slow config
            # (VERDICT r4 weak #8), so say so at init
            import sys as _sys
            print("conv_fwd: int8=1 without calib_fn uses DYNAMIC "
                  "per-forward act scales — measured SLOWER than bf16 on "
                  "v5e (0.80x); run net_calib and pass --calib-fn for the "
                  "static-scale serving config (1.15x)", file=_sys.stderr)
            self._info_log.append("int8 dynamic (no calib_fn): expect a "
                                  "throughput REGRESSION vs bf16")
        # fusion chains (ref conv+relu fusion, rtc_fwd.cc:490, generalized):
        # conv/fc -> [BatchNorm] -> [Scale] -> [ReLU], each link single-consumer.
        # BN/Scale fold into the conv's weights/bias inside the jit (Pallas
        # calls are opaque to XLA epilogue fusion, so unfused BN costs an
        # extra HBM round trip per conv); ReLU fuses into the kernel store.
        self._chains: dict[str, list[str]] = {}
        if self.fuse_relu:
            topo = pipe.topo_op_order()
            topo_ix = {n: i for i, n in enumerate(topo)}

            def single_next(cur):
                consumers = pipe.nodes[cur.tops[0]].bot_for
                if len(consumers) != 1:
                    return None
                return pipe.ops[consumers[0]]

            elt_claim: dict[str, str] = {}  # eltwise op -> claiming conv
            for op_name in topo:
                op = pipe.ops[op_name]
                if op.type not in ("Convolution", "InnerProduct"):
                    continue
                chain = []
                cur = op
                for want in ("BatchNorm", "Scale", "ReLU"):
                    nxt = single_next(cur)
                    if nxt is None:
                        break
                    if nxt.type != want:
                        if want == "ReLU":
                            break
                        continue
                    if nxt.bots[0] != cur.tops[0]:
                        break
                    chain.append(nxt.name)
                    cur = nxt
                # residual extension (ResNet tail): conv[->BN][->Scale] ->
                # Eltwise(sum, this + skip) [-> ReLU]. The skip value must
                # already be computed at this conv's topo slot; when both
                # eltwise inputs end in fusable convs, the later conv wins.
                if self.fuse_eltwise and \
                        (not chain or pipe.ops[chain[-1]].type != "ReLU"):
                    nxt = single_next(cur)
                    if nxt is not None and nxt.type == "Eltwise" and \
                            nxt.p("eltwise_op", "sum") == "sum" and \
                            not nxt.p("coeffs", None) and \
                            len(nxt.bots) == 2 and nxt.bots[0] != nxt.bots[1] and \
                            cur.tops[0] in nxt.bots:
                        skip = next(b for b in nxt.bots if b != cur.tops[0])
                        prods = pipe.nodes[skip].top_for
                        if not prods or all(topo_ix[pr] < topo_ix[op_name]
                                            for pr in prods):
                            prev = elt_claim.get(nxt.name)
                            if prev is None or topo_ix[prev] < topo_ix[op_name]:
                                if prev is not None:  # un-claim the earlier conv
                                    pc = self._chains.get(prev, [])
                                    self._chains[prev] = pc[:pc.index(nxt.name)]
                                    if not self._chains[prev]:
                                        del self._chains[prev]
                                elt_claim[nxt.name] = op_name
                                chain.append(nxt.name)
                                cur = nxt
                                nxt2 = single_next(cur)
                                if nxt2 is not None and nxt2.type == "ReLU" \
                                        and nxt2.bots[0] == cur.tops[0]:
                                    chain.append(nxt2.name)
                                    cur = nxt2
                if chain:
                    self._chains[op_name] = chain
        self._blocks: dict[str, dict] = {}
        # no block fusion under training/backward graphs: pallas_call has no
        # auto-VJP (gradients flow through the unfused per-op lowerings).
        # no block fusion under tp>1 either: _lower_block emits
        # pallas_bottleneck, which GSPMD cannot partition (same constraint
        # the per-op use_xla forcing in _op_tune protects)
        tp_sharded = (self._mesh is not None
                      and "tp" in self._mesh.axis_names
                      and self._mesh.shape["tp"] > 1)
        if self.fuse_block and self.fuse_relu and self.fuse_eltwise and \
                self.layout == "nhwc" and not pipe.bck_added and \
                not self.train and not tp_sharded:
            self._detect_blocks(pipe)
        # prefold (see the Field doc): folds become upload-time constants.
        # bck graphs keep the in-jit fold — BN/Scale grads flow through it.
        self._prefold_on = bool(self.prefold) and not pipe.bck_added
        self._prefold_plan = {}   # folded-w key -> (w_key, b_key, param_keys, fold)
        self._prefold_keys = {}   # conv op name -> (folded w key, folded b key)
        # input_s2d (see the Field doc): net input node -> stem fold geometry
        self._input_s2d: dict[str, dict] = {}
        self._input_s2d_ops: set[str] = set()
        if self.input_pad_c and not self.input_s2d:
            raise ConfigError("input_pad_c requires input_s2d=1 (the pad is "
                              "part of the host-folded entry layout)")
        if self.input_s2d and self.layout == "nhwc" and not pipe.bck_added:
            self._detect_input_s2d(pipe)
        # act_int8 (see the Field doc): resolve patterns -> per-node static
        # scales now, so a typo or a missing calib entry fails at init
        self._act_q: dict[str, tuple] = {}
        if self.act_int8:
            self._resolve_act_int8(pipe, ctx)
            # plumb the resolved SIGNED storage scales into the lowering
            # ctx: int8-conv consumers dequantize stored inputs with the
            # exact storage scale (ADVICE r4; lowering.LowerCtx doc)
            import dataclasses as _dc
            ctx = _dc.replace(ctx, act_store_scale={
                n: sc for n, (uns, sc) in self._act_q.items() if not uns})
        for op_name in pipe.topo_op_order():
            op = pipe.ops[op_name]
            self._lowered[op_name] = self._lower(pipe, op, ctx, fused=False)
            if op_name in self._blocks:
                self._lowered_fused[op_name] = self._lower_block(
                    pipe, op, self._blocks[op_name], ctx)
            elif op_name in self._chains:
                self._lowered_fused[op_name] = self._lower_chain(
                    pipe, op, self._chains[op_name], ctx)
        self._upload_weights()

    def _detect_input_s2d(self, pipe: ConvPipe) -> None:
        """Find net inputs whose single consumer is a stem conv qualifying
        for the space-to-depth fold (stem_s2d_geom); those inputs may then
        arrive pre-folded from the host loader (see the input_s2d Field)."""
        from .lowering_nhwc import stem_s2d_geom
        for n in pipe.bots():
            consumers = list(pipe.nodes[n].bot_for)
            if len(consumers) != 1:
                continue
            op = pipe.ops[consumers[0]]
            if op.type != "Convolution" or op.bots[0] != n:
                continue
            geom = stem_s2d_geom(pipe.must_dims(n),
                                 pipe.must_dims(op.tops[0]), op.stride(),
                                 op.pad(), op.kern_sz(), op.dilation(),
                                 int(op.p("groups", 1)))
            if geom is None:
                continue
            c_fold = geom["sb"] ** 2 * geom["cin"]
            if self.input_pad_c and self.input_pad_c < c_fold:
                raise ConfigError(
                    f"input_pad_c={self.input_pad_c} < folded channels "
                    f"{c_fold} for input {n!r}")
            geom["c_eff"] = max(self.input_pad_c, c_fold) \
                if self.input_pad_c else c_fold
            self._input_s2d[n] = geom
            self._input_s2d_ops.add(op.name)
            self._info_log.append(
                f"{op.name}: input_s2d on {n!r} -> "
                f"(*, {geom['xs_h']}, {geom['xs_w']}, {geom['c_eff']})")

    def host_input_s2d(self, node: str, x_nhwc):
        """Host-side (numpy) fold of an NHWC batch into the pre-folded
        stem_s2d layout the engine accepts for `node` under input_s2d=1 —
        what the production loader runs at decode time."""
        from .lowering_nhwc import host_stem_s2d
        geom = self._input_s2d.get(node)
        if geom is None:
            raise PipeError(f"input {node!r} has no input_s2d fold "
                            f"(have {sorted(self._input_s2d)})")
        xs = host_stem_s2d(x_nhwc, geom)
        c_fold = xs.shape[-1]
        if geom.get("c_eff", c_fold) > c_fold:
            import numpy as _np
            xs = _np.pad(xs, ((0, 0), (0, 0), (0, 0),
                              (0, geom["c_eff"] - c_fold)))
        return xs

    def _resolve_act_int8(self, pipe: ConvPipe, ctx: LowerCtx) -> None:
        """Resolve act_int8 patterns into self._act_q: node -> (unsigned,
        scale). Scales come from calib_fn amax (static — a runtime amax
        would re-read the tensor it exists to shrink); unsigned storage
        (uint8, scale=amax/255) when the producer provably emits >= 0
        (ReLU, or max/avg pooling over such), else int8 (amax/127)."""
        import fnmatch
        if self.layout != "nhwc":
            raise ConfigError("act_int8 requires the NHWC engine layout")
        if self.pipe.bck_added or self.train:
            raise ConfigError("act_int8 is inference-only (the storage "
                              "rounding has zero gradient)")
        amax = getattr(ctx, "act_amax", None)
        if amax is None:
            raise ConfigError("act_int8 needs calib_fn (net_calib amax "
                              "sidecar) for the static scales")
        nodes = [n for n, node in pipe.nodes.items()
                 if node.dims is not None and n not in pipe.weights
                 and node.top_for]
        # non-negativity: fixed-point over producers (ReLU -> yes; Pooling/
        # Dropout/Concat propagate; everything else unknown)
        nonneg: set[str] = set()
        changed = True
        while changed:
            changed = False
            for n in nodes:
                if n in nonneg:
                    continue
                prod = pipe.ops[pipe.nodes[n].top_for[0]]
                ok = prod.type == "ReLU" or (
                    prod.type in ("Pooling", "Dropout", "Concat")
                    and all(b in nonneg for b in prod.bots))
                if ok:
                    nonneg.add(n)
                    changed = True
        matched: set[str] = set()
        for pat in map(str, self.act_int8):
            hits = fnmatch.filter(nodes, pat)
            if not hits:
                raise ConfigError(
                    f"act_int8 pattern {pat!r} matches no activation node")
            matched.update(hits)
        missing = sorted(n for n in matched if n not in amax)
        if missing:
            raise ConfigError(
                f"act_int8: calib file {self.calib_fn!r} has no amax for "
                f"{missing} (re-run net_calib on this net)")
        for n in sorted(matched):
            a = max(float(amax[n]), 1e-12)
            # engine-wide int8 compute: store SIGNED (scale amax/127) even
            # for provably non-negative tensors, so int8-conv consumers can
            # feed the stored value STRAIGHT into the int8 dot (same
            # symmetric scale the conv's quantizer would have produced) —
            # the per-conv round/clip quantize disappears entirely. Costs
            # one bit of range on ReLU outputs; the accuracy gates
            # (tests/test_int8.py, test_act_int8.py) bound the effect.
            uns = n in nonneg and not self.int8
            self._act_q[n] = (uns, a / (255.0 if uns else 127.0))
            self._info_log.append(
                f"act_int8 {n}: {'uint8' if uns else 'int8'} "
                f"scale={self._act_q[n][1]:.4g}"
                + (" (signed for direct int8-conv feed)"
                   if n in nonneg and not uns else ""))

    def _detect_blocks(self, pipe: ConvPipe) -> None:
        """Find residual bottlenecks: convA(1x1 s1)+BN/Sc+ReLU ->
        convB(3x3 s1 p1)+BN/Sc+ReLU -> convC(1x1 s1)+BN/Sc + Eltwise(skip=x)
        + ReLU, every link single-consumer (already enforced by the chain
        walk). Each found block merges the three chains into one mega-chain
        on convA — build_raw_fn's generic chain plumbing (extras collection,
        skip set, per-compile fuse decision) then applies unchanged — and
        _lower_block lowers it to the single fused Pallas kernel."""
        from ..ops.kernels.block import block_fuse_ok

        def pure_relu_chain(conv_name):
            ch = self._chains.get(conv_name)
            if not ch:
                return None
            ops = [pipe.ops[c] for c in ch]
            if ops[-1].type != "ReLU" or any(o.type == "Eltwise" for o in ops):
                return None
            return ch

        def is_conv(op, k, s, p):
            return (op is not None and op.type == "Convolution"
                    and len(op.bots) == 3 and op.kern_sz() == (k, k)
                    and op.stride() == (s, s) and op.pad() == (p, p)
                    and op.p("groups", 1) == 1 and op.dilation() == (1, 1))

        for a_name in list(self._chains):
            opA = pipe.ops[a_name]
            chA = pure_relu_chain(a_name)
            if chA is None or not is_conv(opA, 1, 1, 0):
                continue
            tailA = pipe.ops[chA[-1]].tops[0]
            cons = pipe.nodes[tailA].bot_for
            if len(cons) != 1:
                continue
            b_name = cons[0]
            opB = pipe.ops.get(b_name)
            chB = pure_relu_chain(b_name)
            if chB is None or not is_conv(opB, 3, 1, 1) or opB.bots[0] != tailA:
                continue
            tailB = pipe.ops[chB[-1]].tops[0]
            cons = pipe.nodes[tailB].bot_for
            if len(cons) != 1:
                continue
            c_name = cons[0]
            opC = pipe.ops.get(c_name)
            chC = self._chains.get(c_name)
            if chC is None or not is_conv(opC, 1, 1, 0) \
                    or opC.bots[0] != tailB:
                continue
            copsC = [pipe.ops[c] for c in chC]
            elt = next((o for o in copsC if o.type == "Eltwise"), None)
            if elt is None or copsC[-1].type != "ReLU":
                continue
            x_node = opA.bots[0]
            if x_node not in elt.bots:
                continue
            xd = pipe.must_dims(x_node)
            if self.compute_tn:
                xd = xd.with_tn(self.compute_tn)
            k_mid = pipe.must_dims(opA.tops[0])["chan"]
            if pipe.must_dims(tailB)["chan"] != k_mid or \
                    not block_fuse_ok(xd, 3, k_mid, (1, 1), (1, 1), 1):
                continue
            self._blocks[a_name] = {"a_chain": chA, "b": b_name,
                                    "b_chain": chB, "c": c_name,
                                    "c_chain": chC}
            self._chains[a_name] = chA + [b_name] + chB + [c_name] + chC
            self._info_log.append(
                f"{a_name}: block-fused bottleneck (+{b_name},{c_name})")

    def _lower_block(self, pipe: ConvPipe, opA, block: dict,
                     ctx: LowerCtx) -> Callable:
        """One fused Pallas kernel for a residual bottleneck block; BN/Scale
        params of all three convs fold into (w, b) in-jit (same math as
        _lower_chain). Extras arrive in mega-chain order: A-chain folds,
        (wB, bB), B-chain folds, (wC, bC), C-chain folds, eltwise skip."""
        from ..ops.cnn_variants import ctx_interp
        from ..ops.kernels.block import pallas_bottleneck
        opB, opC = pipe.ops[block["b"]], pipe.ops[block["c"]]
        foldA, nA, fkA = self._make_fold(pipe, opA, block["a_chain"])
        foldB, nB, fkB = self._make_fold(pipe, opB, block["b_chain"])
        foldC, nC, fkC = self._make_fold(pipe, opC, block["c_chain"])
        if self._register_prefold(opA, foldA, fkA):
            foldA, nA = None, 0
        if self._register_prefold(opB, foldB, fkB):
            foldB, nB = None, 0
        if self._register_prefold(opC, foldC, fkC):
            foldC, nC = None, 0
        prec = "default" if self.compute_tn == "bfloat16" else self.precision

        def fn(x, wA, bA, *rest):
            i = 0
            wA2, bA2 = (foldA(wA, bA, rest[i:i + nA])
                        if foldA is not None else (wA, bA))
            i += nA
            wB, bB = rest[i], rest[i + 1]
            i += 2
            wB2, bB2 = (foldB(wB, bB, rest[i:i + nB])
                        if foldB is not None else (wB, bB))
            i += nB
            wC, bC = rest[i], rest[i + 1]
            i += 2
            wC2, bC2 = (foldC(wC, bC, rest[i:i + nC])
                        if foldC is not None else (wC, bC))
            # any remaining extra is the Eltwise skip node == x itself
            c = x.shape[-1]
            k = wA2.shape[-1]
            out = pallas_bottleneck(
                x, wA2.reshape(c, k), bA2, wB2, bB2, wC2.reshape(k, c), bC2,
                precision=prec, relu_out=True, interpret=ctx_interp())
            return (out,)
        return fn

    def _make_fold(self, pipe: ConvPipe, conv_op, chain: list[str]):
        """BN/Scale weight-folding for a conv's chain: returns
        (fold(w, b, extras) -> (w2, b2), n_extras, param_keys) where extras
        are the BN/Scale parameter values in chain order (Eltwise/ReLU take
        none) and param_keys their weight-node names. A chain with neither
        BN nor Scale returns (None, 0, []) — conv weights pass through
        untouched (an identity fold would still cost a full per-forward
        read+write of the weights)."""
        import jax.numpy as jnp
        from jax import lax as _lax
        ops = [pipe.ops[c] for c in chain]
        bn = next((o for o in ops if o.type == "BatchNorm"), None)
        sc = next((o for o in ops if o.type == "Scale"), None)
        if bn is None and sc is None:
            return None, 0, []
        param_keys = (list(bn.bots[1:]) if bn is not None else []) + \
            (list(sc.bots[1:]) if sc is not None else [])
        eps = float(bn.p("eps", 1e-5)) if bn is not None else 0.0
        n_bn = (len(bn.bots) - 1) if bn is not None else 0
        n_sc = (len(sc.bots) - 1) if sc is not None else 0
        # NHWC conv weights are (kh,kw,ic,oc): scale broadcasts on the last
        # axis; fc weights are (oc, in): scale on the first axis.
        scale_on_last = self.layout == "nhwc" and conv_op.type == "Convolution"

        def fold(w, b, extras):
            i = 0
            scale_eff = jnp.float32(1.0)
            shift = jnp.float32(0.0)
            if bn is not None:
                mean, var = extras[i], extras[i + 1]
                sf = extras[i + 2] if n_bn == 3 else None
                i += n_bn
                sfv = jnp.where(sf[0] != 0, 1.0 / sf[0], 1.0) \
                    if sf is not None else 1.0
                inv = _lax.rsqrt(var * sfv + eps)
                scale_eff = scale_eff * inv
                shift = shift - (mean * sfv) * inv
            if sc is not None:
                gamma = extras[i]
                beta = extras[i + 1] if n_sc == 2 else None
                i += n_sc
                scale_eff = scale_eff * gamma
                shift = shift * gamma
                if beta is not None:
                    shift = shift + beta
            if scale_on_last:
                w2 = (w * scale_eff.astype(jnp.float32)).astype(w.dtype)
            else:
                sh = (-1,) + (1,) * (w.ndim - 1)
                w2 = (w * scale_eff.reshape(sh).astype(jnp.float32)).astype(w.dtype)
            b2 = (b * scale_eff + shift).astype(b.dtype)
            return w2, b2
        return fold, n_bn + n_sc, param_keys

    def _register_prefold(self, conv_op, fold, param_keys):
        """Queue this conv's fold for the one-shot upload-time computation
        and map the conv to its folded weight keys. Returns True when the
        fold will be prefolded (the in-jit fold must then be skipped)."""
        if not self._prefold_on or fold is None:
            return False
        w_key, b_key = conv_op.bots[1], conv_op.bots[2]
        wf, bf = w_key + "__folded", b_key + "__folded"
        # a conv can be registered twice (its own chain + a block mega-chain
        # that subsumes it); the fold is identical — first registration wins
        self._prefold_plan.setdefault(wf, (w_key, b_key, param_keys, fold))
        self._prefold_keys[conv_op.name] = (wf, bf)
        return True

    def _lower_chain(self, pipe: ConvPipe, conv_op, chain: list[str],
                     ctx: LowerCtx) -> Callable:
        """Fused lowering for conv(+bias) -> [BN] -> [Scale] -> [Eltwise-sum]
        -> [ReLU]: computes folded weights/bias in-jit, runs one kernel with
        a fused bias(+residual)(+ReLU) store epilogue. When the selected conv
        variant cannot take an in-kernel residual, the add+ReLU run as plain
        XLA ops after the kernel (still one compile unit)."""
        import jax.numpy as jnp
        ops = [pipe.ops[c] for c in chain]
        has_relu = any(o.type == "ReLU" for o in ops)
        elt = next((o for o in ops if o.type == "Eltwise"), None)
        fused_conv_fn = self._lower(pipe, conv_op, ctx, fused=has_relu)
        res_in_kernel = elt is not None and \
            getattr(fused_conv_fn, "supports_residual", False)
        if elt is not None and not res_in_kernel:
            # kernel can't fuse the residual: take an activation-free lowering
            # and apply add(+ReLU) as XLA epilogue ops instead
            fused_conv_fn = self._lower(pipe, conv_op, ctx, fused=False)
        fold, n_fold, fkeys = self._make_fold(pipe, conv_op, chain)
        if self._register_prefold(conv_op, fold, fkeys):
            fold, n_fold = None, 0  # w/b arrive already folded; no extras

        def fn(x, w, b, *rest):
            if fold is not None:
                w, b = fold(w, b, rest[:n_fold])
            if elt is None:
                return fused_conv_fn(x, w, b)
            res = rest[n_fold]
            if res_in_kernel:
                return fused_conv_fn(x, w, b, residual=res)
            out = fused_conv_fn(x, w, b)[0] + res
            if has_relu:
                out = jnp.maximum(out, 0.0)
            odt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
                else out.dtype
            return (out.astype(odt),)
        # int8-stored-input capability rides through the chain wrapper (the
        # head conv consumes x; epilogue ops never see it)
        fn.q8_input_ok = getattr(fused_conv_fn, "q8_input_ok", False)
        return fn

    def _lower(self, pipe: ConvPipe, op, ctx: LowerCtx, fused: bool) -> Callable:
        from copy import copy as _copy
        if fused:
            op = _copy(op)
            op.params = dict(op.params, fused_relu=True)
        if self.layout == "nhwc":
            return self._lower_nhwc(pipe, op, ctx)
        from ..ops.cnn_variants import lower_op_pallas
        fn = lower_op_pallas(pipe, op, ctx, self.op_tune(op.name), self._info_log)
        return fn if fn is not None else lower_op(pipe, op, ctx)

    def _lower_nhwc(self, pipe: ConvPipe, op, ctx: LowerCtx) -> Callable:
        from .autodiff import _wants_grad
        from .lowering_nhwc import lower_op_nhwc
        if op.type == "Bck":
            # backward = vjp of the (NHWC) forward lowering. Pallas kernels
            # have no reverse-AD rule, so the vjp differentiates the stock-XLA
            # NHWC lowering of the same op (identical math; custom-VJP Pallas
            # backward kernels are a future optimization).
            import dataclasses

            import jax
            import jax.numpy as jnp
            fwd = pipe.ops[op.p("fwd_op")]
            from .lowering_nhwc import lower_op_nhwc
            bck_fn = self._lower_bck_conv_pallas(pipe, op, fwd, ctx)
            if bck_fn is not None:
                return bck_fn
            # int8=False: quantized compute rounds (zero-gradient); training
            # always differentiates the f32/bf16 math (int8 is inference-only)
            xla_tune = dataclasses.replace(self.op_tune(fwd.name),
                                           use_xla=True, int8=False)
            r = lower_op_nhwc(pipe, fwd, ctx, xla_tune, self._info_log)
            if r is None:
                raise PipeError(f"no NHWC lowering for {fwd.type!r}")
            fwd_fn, _ = r
            n_fwd_bots = len(fwd.bots)
            grad_pos = [i for i, b in enumerate(fwd.bots)
                        if _wants_grad(pipe, op, b)]
            top_has_grad = set(op.p("top_has_grad") or [])
            loss_node = op.p("loss_node")
            is_loss = fwd.type == "SoftmaxWithLoss"

            def fn(*args):
                fwd_ins = list(args[:n_fwd_bots])
                gs = list(args[n_fwd_bots:])

                def f(*grad_ins):
                    full = list(fwd_ins)
                    for pos, gi in zip(grad_pos, grad_ins):
                        full[pos] = gi
                    return fwd_fn(*full)

                primals = [fwd_ins[p] for p in grad_pos]
                outs, vjp = jax.vjp(f, *primals)
                cts = []
                gi = 0
                for t, out in zip(fwd.tops, outs):
                    if is_loss and t == loss_node:
                        cts.append(jnp.ones_like(out))
                    elif t in top_has_grad:
                        cts.append(gs[gi].astype(out.dtype))
                        gi += 1
                    else:
                        cts.append(jnp.zeros_like(out))
                grads = vjp(tuple(cts))
                return tuple(g.astype(p.dtype) for g, p in zip(grads, primals))
            return fn
        r = lower_op_nhwc(pipe, op, ctx, self.op_tune(op.name), self._info_log)
        if r is None:
            raise PipeError(f"no NHWC lowering for op type {op.type!r} "
                            f"(op {op.name!r})")
        fn, preps = r
        self._weight_preps.update(preps)
        return fn

    def _lower_bck_conv_pallas(self, pipe: ConvPipe, op, fwd, ctx):
        """Explicit generated backward conv kernels (the BckConv analog, ref
        test/rtc/bconv.cucl + cnn_codegen.cc:44-136) for the eligible
        stride-1/groups-1/no-dilation case. Returns None to fall back to the
        vjp-of-the-XLA-lowering path."""
        if fwd.type != "Convolution" or fwd.p("fused_relu", False):
            return None
        tune = self.op_tune(fwd.name)
        if tune.use_xla or fwd.stride() != (1, 1) or \
                fwd.dilation() != (1, 1) or int(fwd.p("groups", 1)) != 1:
            return None
        if op.p("top_has_grad") != [fwd.tops[0]]:
            return None
        import jax.numpy as jnp

        from .autodiff import _wants_grad
        from ..ops.cnn_variants import ctx_interp
        from ..ops.kernels.bconv import (bck_in_blocks, pallas_conv2d_bck_in,
                                         pallas_conv2d_bck_filts)
        xd = pipe.must_dims(fwd.bots[0])
        fd = pipe.must_dims(fwd.bots[1])
        dyd = pipe.must_dims(fwd.tops[0])
        grad_pos = [i for i, b in enumerate(fwd.bots)
                    if _wants_grad(pipe, op, b)]
        blocks = bck_in_blocks(dyd, fd, xd, tune)
        if blocks is None and 0 in grad_pos:
            return None  # in-grad shape infeasible for the Pallas conv
        pad = fwd.pad()
        n_fwd_bots = len(fwd.bots)
        prec = tune.precision
        self._info_log.append(f"{op.name}: pallas-bck-conv {blocks}")

        def fn(*args):
            x, w = args[0], args[1]  # NHWC activation, HWIO prepped weights
            dy = args[n_fwd_bots].astype(x.dtype)
            outs = []
            for pos in grad_pos:
                if pos == 0:
                    outs.append(pallas_conv2d_bck_in(
                        dy, w, pad=pad, blocks=blocks, precision=prec,
                        interpret=ctx_interp()).astype(x.dtype))
                elif pos == 1:
                    outs.append(pallas_conv2d_bck_filts(
                        x, dy, pad=pad, tune=tune, precision=prec,
                        interpret=ctx_interp()).astype(w.dtype))
                else:
                    outs.append(jnp.sum(dy.astype(jnp.float32),
                                        axis=(0, 1, 2)).astype(args[pos].dtype))
            return tuple(outs)
        return fn

    def _upload_weights(self) -> None:
        import jax
        dev = self.device()
        self._weights_dev = {}
        for k, w in self.pipe.weights.items():
            data = self._cast_w(w.data)
            prep = self._weight_preps.get(k)
            if prep is not None:
                data = prep[0](data)
            tgt = self._weight_sharding(k) if self._mesh is not None else dev
            self._weights_dev[k] = jax.device_put(data, tgt)
        if self._prefold_plan:
            # one-shot fold of every fused chain's BN/Scale into its conv's
            # (prepped, cast) weights — the exact fold fns _lower_chain/_block
            # would otherwise run per forward, so results are numerically
            # identical to the in-jit fold. One small jit; under a mesh GSPMD
            # propagates each folded weight's sharding from its source.
            plan = dict(self._prefold_plan)

            def _fold_all(wd):
                out = {}
                for wf, (wk, bk, fkeys, fold) in plan.items():
                    w2, b2 = fold(wd[wk], wd[bk], [wd[k] for k in fkeys])
                    out[wf] = w2
                    out[bk + "__folded"] = b2
                return out
            if self._mesh is not None:
                # pin each folded output to its SOURCE weight's sharding —
                # left free, GSPMD may pick a different spec than the one
                # _build_sharded_fn declares for the folded key (mismatch
                # error at dispatch)
                out_sh = {}
                for wf, (wk, bk, _fk, _f) in plan.items():
                    out_sh[wf] = self._weight_sharding(wk)
                    out_sh[bk + "__folded"] = self._weight_sharding(bk)
                folded = jax.jit(_fold_all, out_shardings=out_sh)(
                    self._weights_dev)
            else:
                folded = jax.jit(_fold_all)(self._weights_dev)
            self._weights_dev.update(folded)

    def _to_internal(self, node: str, arr):
        if self.layout == "nhwc" and self._is_4d(node) and arr.ndim == 4:
            return arr.transpose(0, 2, 3, 1)
        return arr

    def example_weights(self) -> dict:
        import numpy as np
        out = {}
        for k, w in self.pipe.weights.items():
            data = self._cast_w(w.data)
            prep = self._weight_preps.get(k)
            if prep is not None:
                data = prep[0](data)
            out[k] = data
        # prefolded entries: pull the upload-time folded values back to host
        # (init computed them on-device; see _upload_weights) so consumers
        # feeding build_raw_fn have every key net_fn reads
        for wf, (wk, bk, _fk, _fold) in getattr(self, "_prefold_plan", {}).items():
            out[wf] = np.asarray(self._weights_dev[wf])
            out[bk + "__folded"] = np.asarray(self._weights_dev[bk + "__folded"])
        return out

    def _is_4d(self, node: str) -> bool:
        # canonical NCHW name ORDER required: permuted/detection nodes keep
        # logical layout and must not be NHWC-transposed at the boundaries
        d = self.pipe.nodes[node].dims
        return d is not None and d.names == ("img", "chan", "y", "x")

    def build_raw_fn(self, out_names: list[str]) -> Callable:
        if self.layout != "nhwc":
            return super().build_raw_fn(out_names)
        import jax
        import jax.numpy as jnp
        pipe = self.pipe
        topo = pipe.topo_op_order()
        out_set = set(out_names)
        # per-compile fusion decision: fuse a chain only when none of its
        # intermediate values are requested outputs
        fused_now = {}
        for conv_name, chain in self._chains.items():
            inter = [pipe.ops[conv_name].tops[0]] + \
                [pipe.ops[c].tops[0] for c in chain[:-1]]
            if not (set(inter) & out_set):
                fused_now[conv_name] = chain
        skip_ops = {}
        for conv_name, chain in fused_now.items():
            for c in chain:
                skip_ops[c] = conv_name
        # extra inputs of each chain op = all bots except the link value
        # (prev op's top); for BN/Scale that's bots[1:], for Eltwise it's
        # the skip-connection activation (either bot position). Prefolded
        # convs (see _register_prefold): their BN/Scale params are upload-
        # time constants — dropped here — and mid-chain conv weights (block
        # mega-chains) substitute their __folded keys.
        def _extras(conv_name, chain):
            link, out = pipe.ops[conv_name].tops[0], []
            cur_pf = self._prefold_keys.get(conv_name)  # fold owner's keys
            for cn in chain:
                cop = pipe.ops[cn]
                if cop.type in ("Convolution", "InnerProduct"):
                    cur_pf = self._prefold_keys.get(cn)
                    if cur_pf is not None:  # mid-chain conv (block mega-chain)
                        out += [cur_pf[0], cur_pf[1]]
                    else:
                        out += [b for b in cop.bots if b != link]
                elif cop.type in ("BatchNorm", "Scale") and cur_pf is not None:
                    pass  # folded at upload into the owning conv's weights
                else:
                    out += [b for b in cop.bots if b != link]
                link = cop.tops[0]
            return out
        chain_args = {c: _extras(c, chain) for c, chain in fused_now.items()}
        chain_final_top = {c: pipe.ops[chain[-1]].tops[0]
                           for c, chain in fused_now.items()}
        lowered = {}
        for op_name in topo:
            if op_name in fused_now:
                lowered[op_name] = self._lowered_fused[op_name]
            else:
                lowered[op_name] = self._lowered[op_name]
        is4d = {n: self._is_4d(n) for n in pipe.nodes}

        # batch-split regions (see the batch_split Field doc): resolve each
        # spec to its execution-unit slice now; whether a region applies is
        # decided per trace inside net_fn (mid-region inputs/outputs — e.g.
        # net_decomp suffix runs or per-layer tests — deactivate it).
        regions = []
        exec_units = [o for o in topo if o not in skip_ops]
        for spec in (self.batch_split or []):
            try:
                a_node, b_node, k_str = str(spec).split(":")
                k = int(k_str)
            except ValueError:
                raise ConfigError(
                    f"batch_split entry {spec!r} is not 'in_node:out_node:k'")
            units, needed = [], {b_node}
            for op_name in reversed(exec_units):
                op = pipe.ops[op_name]
                tops = ([chain_final_top[op_name]] if op_name in fused_now
                        else list(op.tops))
                if any(t in needed for t in tops):
                    units.append(op_name)
                    deps = list(op.bots) + chain_args.get(op_name, [])
                    needed.difference_update(tops)
                    needed.update(d for d in deps if d != a_node)
            units.reverse()
            ext = [n for n in needed if n not in pipe.weights
                   and not n.endswith("__folded")]
            if not units or ext:
                raise ConfigError(
                    f"batch_split region {spec!r}: external data deps {ext} "
                    f"(region must be closed between its in and out nodes)")
            internal = set()
            for u in units:
                internal.update([chain_final_top[u]] if u in fused_now
                                else pipe.ops[u].tops)
            internal.discard(b_node)
            uset = set(units)
            for op_name in exec_units:
                if op_name in uset:
                    continue
                deps = list(pipe.ops[op_name].bots) + \
                    chain_args.get(op_name, [])
                leak = internal.intersection(deps)
                if leak:
                    raise ConfigError(
                        f"batch_split region {spec!r}: node(s) {sorted(leak)} "
                        f"consumed outside the region")
            img = pipe.must_dims(a_node)["img"]
            if img % k != 0:
                raise ConfigError(
                    f"batch_split region {spec!r}: k={k} does not divide "
                    f"batch {img}")
            regions.append({"a": a_node, "b": b_node, "k": k, "units": units,
                            "internal": internal})

        cdt = _jnp_dt(self.compute_tn) if self.compute_tn else None
        stats = self.per_layer_stats

        # act_int8 storage (see the Field doc): _qstore quantizes a node's
        # value as it enters the activation store (fuses into the producing
        # fusion — the bf16 value never reaches HBM); _qload dequantizes on
        # every read (fuses into each consumer). Float-typed values pass
        # through untouched, so mid-graph runs that FEED a quantized node as
        # an input (per-layer tests, net_decomp suffixes) stay exact.
        actq = getattr(self, "_act_q", None) or {}

        def _qstore(n, v):
            q = actq.get(n)
            if q is None or not jnp.issubdtype(v.dtype, jnp.floating):
                return v
            uns, scale = q
            vq = jnp.round(v.astype(jnp.float32) * (1.0 / scale))
            if uns:
                return jnp.clip(vq, 0.0, 255.0).astype(jnp.uint8)
            return jnp.clip(vq, -127.0, 127.0).astype(jnp.int8)

        def _qload(n, v):
            q = actq.get(n)
            if q is None or jnp.issubdtype(v.dtype, jnp.floating):
                return v
            return (v.astype(jnp.float32) * q[1]).astype(
                cdt if cdt is not None else jnp.float32)

        def net_fn(weights: dict, inputs: dict):
            stat_out = {}

            def _stat(n, v):
                if stats and jnp.issubdtype(v.dtype, jnp.floating):
                    v32 = v.astype(jnp.float32)
                    stat_out[n] = jnp.stack(
                        [jnp.min(v32), jnp.max(v32), jnp.sum(v32),
                         jnp.sum(v32 * v32)])
            vals = dict(weights)
            for k, v in inputs.items():
                if cdt is not None and jnp.issubdtype(v.dtype, jnp.floating):
                    v = v.astype(cdt)
                if is4d.get(k):
                    # native-layout ingestion: a 4D input whose shape is the
                    # NHWC permutation of the logical NCHW dims (and NOT the
                    # logical shape itself) is already in the engine's
                    # internal layout — the production loader emits decoded
                    # images as NHWC batches directly (HWC is the natural
                    # decode layout), skipping the per-forward transpose.
                    # Ambiguous shapes (logical == permuted) stay logical.
                    # batch dim wildcarded: under shard_map the raw fn sees
                    # the per-device img slice, not the global batch
                    ld = pipe.must_dims(k).shape
                    nhwc = (ld[2], ld[3], ld[1])
                    g = self._input_s2d.get(k) if hasattr(self, "_input_s2d") \
                        else None
                    if g is not None and v.ndim == 4 and v.shape[1:3] == \
                            (g["xs_h"], g["xs_w"]) and v.shape[3] in (
                            g["sb"] ** 2 * g["cin"],
                            g.get("c_eff", g["sb"] ** 2 * g["cin"])):
                        # pre-folded stem_s2d layout from the host loader —
                        # the stem conv's lowering consumes it directly
                        vals[k] = v
                        continue
                    if tuple(v.shape[1:]) == ld[1:]:
                        v = v.transpose(0, 2, 3, 1)
                    elif tuple(v.shape[1:]) != nhwc:
                        raise PipeError(
                            f"input {k!r}: shape {tuple(v.shape)} is neither "
                            f"logical NCHW (*, {ld[1]}, {ld[2]}, {ld[3]}) "
                            f"nor native NHWC (*, {nhwc[0]}, {nhwc[1]}, "
                            f"{nhwc[2]})")
                vals[k] = v
            # prune to the subgraph reaching out_names from the provided
            # inputs (mid-graph inputs like pool1 supported; chain tops count
            # as the chain's only produced value)
            needed = set(out_names)
            run_ops = set()
            for op_name in reversed(topo):
                if op_name in skip_ops:
                    continue
                op = pipe.ops[op_name]
                tops = ([chain_final_top[op_name]] if op_name in fused_now
                        else list(op.tops))
                if any(t in needed and t not in vals for t in tops):
                    run_ops.add(op_name)
                    needed.update(op.bots)
                    if op_name in fused_now:
                        needed.update(chain_args[op_name])
            # batch-split regions apply only when intact for this trace: all
            # units scheduled, and no mid-region node crossing the boundary
            # as a provided input or requested output (reg["a"] itself MAY be
            # a provided input — e.g. the net input — the region just splits
            # whatever value sits at its entry)
            unit_region = {}
            for reg in regions:
                if all(u in run_ops for u in reg["units"]) and \
                        not reg["internal"].intersection(vals) and \
                        not reg["internal"].intersection(out_names):
                    for u in reg["units"]:
                        unit_region[u] = reg
            # trace-time introspection (tests assert activation)
            self._bs_applied = sorted(
                {(r["a"], r["b"]) for r in unit_region.values()})
            self._q8_direct = set()

            def _exec_one(op_name, look):
                op = pipe.ops[op_name]
                bots = op.bots
                pf = self._prefold_keys.get(op_name) \
                    if op_name in fused_now else None
                if pf is not None:  # head conv reads its upload-folded w/b
                    bots = [op.bots[0], pf[0], pf[1]] + list(op.bots[3:])
                try:
                    # int8-direct feed: a conv whose lowering accepts the
                    # signed act_int8 storage dtype reads the stored value
                    # raw — the dequant (and the conv's own re-quantize)
                    # both vanish from the program
                    q8ok = getattr(lowered[op_name], "q8_input_ok", False)
                    bot_vals = []
                    for bi, bname in enumerate(bots):
                        v = look(bname)
                        if (bi == 0 and q8ok and hasattr(v, "dtype")
                                and v.dtype == jnp.int8):
                            self._q8_direct.add(op_name)
                        else:
                            v = _qload(bname, v)
                        bot_vals.append(v)
                    if op_name in fused_now:
                        bot_vals += [_qload(b, look(b))
                                     for b in chain_args[op_name]]
                except KeyError as e:
                    raise PipeError(
                        f"op {op_name!r}: missing input {e}") from None
                # named_scope: op names survive into HLO metadata, so
                # profiler traces (net_trace) and gen_src dumps attribute
                # fused regions back to graph ops
                with jax.named_scope(op_name):
                    outs = lowered[op_name](*bot_vals)
                if op_name in fused_now:
                    return [(chain_final_top[op_name], outs[0])]
                return list(zip(op.tops, outs))

            done_regions = set()
            for op_name in topo:
                if op_name not in run_ops:
                    continue
                reg = unit_region.get(op_name)
                if reg is not None:
                    if id(reg) in done_regions:
                        continue
                    done_regions.add(id(reg))
                    xa = vals[reg["a"]]

                    def piece(xc, reg=reg):
                        rv = {reg["a"]: xc}
                        for u in reg["units"]:
                            for t, v in _exec_one(
                                    u, lambda n: rv[n] if n in rv
                                    else vals[n]):
                                rv[t] = _qstore(t, v)
                        return rv[reg["b"]]
                    chunks = jnp.split(xa, reg["k"], axis=0)
                    out_b = jnp.concatenate([piece(c) for c in chunks],
                                            axis=0)
                    vals[reg["b"]] = out_b
                    _stat(reg["b"], out_b)
                    continue
                for t, v in _exec_one(op_name, vals.__getitem__):
                    vals[t] = _qstore(t, v)
                    _stat(t, v)
            res = {}
            for n in out_names:
                v = _qload(n, vals[n])
                if is4d.get(n) and v.ndim == 4:
                    v = v.transpose(0, 3, 1, 2)
                else:
                    # weight gradients come out in prepped layout; invert
                    for wname, (prep, inv) in self._weight_preps.items():
                        if n.startswith(wname + "__grad"):
                            v = inv(v)
                            break
                if cdt is not None:
                    v = v.astype(_jnp_dt(pipe.must_dims(n).tn))
                res[n] = v
            if stats:
                res["__stats__"] = stat_out
            return res

        return net_fn
