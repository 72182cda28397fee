"""The tuning-parameter space for generated kernels.

Parity target: ``op_tune_t`` (ref src/cnn_op.H:10). The reference's knobs were
CUDA-shaped (thread blocks, register tiles, smem); the TPU-native knobs are
MXU/VMEM-shaped: block (tile) sizes feeding BlockSpecs, grid layouts, fusion
and precision choices, and a "use the stock XLA op" escape hatch (the analog
of the reference's ``use_culibs`` cuDNN/cuBLAS path).
"""

from __future__ import annotations

from dataclasses import dataclass, fields

from ..utils.lexp import Lexp, parse_lexp


@dataclass(frozen=True)
class OpTune:
    # blocking: output tile sizes for matmul-like kernels (MXU-aligned).
    bm: int = 256          # rows of output per grid step (sublane dim)
    bn: int = 256          # cols of output per grid step (lane dim)
    bk: int = 512          # contraction-dim block per inner step
    # conv-specific
    chunk: int = 0         # spatial/pixel chunking for conv kernels (0=auto)
    # variant enables (the k1conv/tconv/ipconv analog switches)
    use_k1conv: bool = True
    use_iconv: bool = True
    # strided conv via space-to-depth fold. STANDALONE-op timing says 1.5x
    # (stem 7x7s2) to 4.6x (3x3s2) faster than XLA on v5e for k>1 — but the
    # fused whole-net measures SLOWER with it on everywhere (7.46 vs 5.56
    # ms/fwd resnet50 bf16: the fold's pad/reshape/transpose steals fusion
    # from neighbors). Default off; net_tune selects it per-op where it wins
    # in context. The variant policy only allows it for k>1 (1x1 stride-2 is
    # a pure subsample — XLA wins there standalone too).
    use_s2d: bool = False
    # stem conv (large kernel, stride>1, tiny in_chan — e.g. 7x7s2 C=3) via an
    # XLA-native space-to-depth fold: the kernel is zero-padded to a multiple
    # of the stride and folded to a stride-1 conv on C*s*s channels, lifting
    # the MXU contraction depth from k*k*C to (k_pad/s)^2*C*s*s at the cost of
    # ~(k_pad/k)^2 padding FLOPs. Unlike use_s2d (Pallas kernel, all strided
    # convs) this targets only the stem shape, where C=3 starves the MXU.
    # In-program A/B on v5e (scripts/exp_stem_ab.py): +4.3% whole-net on
    # resnet50, but -11/-12% on alexnet/googlenet — SAME stem shape as
    # resnet on googlenet, opposite sign, so the win is context-dependent
    # (consumer fusion structure), not shape-predictable. Default off;
    # net_tune/wisdom turn it on per-op where the A/B harness validates it.
    # 0 = off (default), 1 = force where legal.
    stem_s2d: int = 0
    # with stem_s2d: lower the folded stride-1 stem conv as im2col
    # (m*m shifted slices concat on channel -> ONE MXU dot) instead of
    # conv_general_dilated — the one formulation the conv1 ledger hasn't
    # tried (VERDICT r3 #3); identical math, different emitter
    stem_im2col: int = 0
    # stem_s2d entry channel pad: treat the folded input as having this many
    # channels (>= sb*sb*cin, zero-filled), with the folded weights padded to
    # match. Lets the host loader emit a lane-aligned entry layout so XLA's
    # entry pad copy (the 108us/fwd inputs['data'] row in the r50 per-op
    # trace, docs/mfu_ceiling.md) never runs. 0 = exact channels (default).
    pad_c: int = 0
    # halo-conv tap concatenation: gather all kh*kw shifted views into one
    # (boy*owp, kh*kw*c) operand and run ONE deep-K matmul instead of kh*kw
    # separate K=c dots (amortizes MXU pipeline fill + per-tap shift/adds).
    # stride-1 only; costs kh*kw x VMEM for the gathered operand.
    tap_cat: bool = False
    # halo-conv image-batch blocking: stack nb images into one grid step so
    # the per-tap matmul M dim is nb*boy*wp rows instead of boy*wp. At small
    # spatial extents (e.g. 7x7: M=56) a single image starves the 128-row MXU
    # pass; batching restores M — but it also shrinks the feasible oc block,
    # and on v5e the full-width oc block wins (measured null result,
    # scripts/exp_nb.py: nb_auto loses ~5-10% vs nb=1 at 14x14x256/7x7x512).
    # 0/1 = off (default), >1 = force that many images per block (r==1
    # stride-1 shapes only; ignored elsewhere).
    nb: int = 0
    # v2 direct conv: element-window halo reads (no host-side gather), any
    # stride handled in-kernel. -1 = auto (on for compiled runs, off in
    # interpreter mode where emulated DMA is very slow); 1 = force on;
    # 0 = v1 gather kernel / s2d / XLA policy chain.
    use_halo: int = -1
    # int8 MXU inference: symmetric dynamic quantization (per-tensor
    # activation scale, per-out-channel weight scales) with int32
    # accumulation. The TPU-native transcend of the reference's fixed-point
    # keep_bits experiments (ref doc/quant-notes.txt, test/rtc/quantize.cucl):
    # instead of emulating bit-drop in f32, actually run the MXU in int8
    # (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16).
    int8: bool = False
    # pooling via shifted strided slices (k*k slice+max/add tree) instead of
    # lax.reduce_window. The b64 per-op trace (docs/mfu_ceiling.md) shows
    # XLA's reduce_window emitter going 4x over its linear-scaling time on
    # r50 pool1 at batch 64 (325 vs 80 us/fwd) while every conv scales
    # linearly; the slice form expresses the same max/avg as plain
    # elementwise ops XLA fuses normally. 0 = reduce_window (default),
    # 1 = shifted slices.
    pool_shift: int = 0
    # pool over a reshaped (k, N/k, H, W, C) batch VIEW: same values, same
    # windows, but a different shape for XLA's reduce_window emitter tiling
    # choice. The b64 pool1 pathology is b64-SHAPE-specific (b32 and b128
    # both scale linearly, mfu_ceiling.md) — this dodges the shape without
    # changing semantics. 0 = off; k>0 must divide the batch.
    pool_bview: int = 0
    # pooling via the direct Pallas kernel (ops/kernels/pool.py): one grid
    # cell per image, full plane in VMEM, k*k register-side shifted-slice
    # accumulation — HBM-floor traffic regardless of the reduce_window
    # emitter's per-shape choices (the googlenet pool2 7x-floor and b64
    # pool1 pathologies; VERDICT r4 #5 — both source-level escapes above
    # measured null, this is the kernel-level answer). Declines planes
    # that exceed the VMEM budget (falls back to reduce_window).
    pool_pallas: int = 0
    # DetectionOutput NMS candidate count override (0 = the prototxt's
    # top_k). The suppression loop + IoU matrix scale with it and are
    # batch-invariant — the latency knob for detection serving (ssd300
    # b4: head ~66% of 5.8 ms at the caffe-parity 400). Opt-in accuracy/
    # latency trade; see graph/ssd_ops._detection_output_fn.
    det_top_k: int = 0
    # precision / layout
    acc_tn: str = "float32"   # accumulation dtype (always f32 on MXU)
    in_tn: str = ""           # compute dtype override ('' = keep input dtype)
    # MXU pass precision: 'highest' = full f32 (bf16x6 passes; needed for the
    # <=1e-5 fidelity gate), 'high' = bf16x3, 'default' = plain bf16 inputs.
    precision: str = "highest"
    # escape hatch: lower to the stock XLA op instead of a Pallas kernel
    # (the TPU analog of use_culibs -> cuDNN/cuBLAS, ref cnn_op.H:19)
    use_xla: bool = False
    # pallas pipelining
    dimension_semantics: str = "arbitrary"  # last grid dim semantics

    def key(self) -> str:
        parts = []
        for f in fields(self):
            v = getattr(self, f.name)
            if v != f.default:
                parts.append(f"{f.name}={Lexp(leaf_val=str(int(v) if isinstance(v, bool) else v))}")
        return "(" + ",".join(parts) + ")"

    def __str__(self) -> str:
        return self.key()

    @staticmethod
    def parse(s: str) -> "OpTune":
        return OpTune.from_lexp(parse_lexp(s))

    @staticmethod
    def from_lexp(l: Lexp) -> "OpTune":
        if l.is_leaf and not l.leaf_val:
            return OpTune()
        l.deep_inc_use_cnt()
        kw = {}
        ftypes = {f.name: f.type for f in fields(OpTune)}
        for k, v in l.kids:
            if k not in ftypes:
                raise ValueError(f"op_tune: unknown knob {k!r}; have {sorted(ftypes)}")
            t = ftypes[k]
            if t == "bool":
                kw[k] = v.leaf_val in ("1", "true", "True")
            elif t == "int":
                kw[k] = int(v.leaf_val)
            else:
                kw[k] = v.leaf_val
        return OpTune(**kw)
