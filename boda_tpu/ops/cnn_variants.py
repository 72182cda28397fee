"""Variant selection + Pallas lowering for CNN hot ops.

Parity target: ``add_cnn_codegen_annotations`` (ref src/cnn_op.cc:16) — the
policy that picks a generated-kernel variant per Convolution:

  reference            TPU-native analog
  ---------            -----------------
  cudnn_conv           stock XLA conv (tune.use_xla)
  ipconv (1x1 output)  matmul over flattened spatial input
  k1conv (1x1 kernel)  pallas matmul over (img*y*x, chan) with fused bias+ReLU
  tconv/conv           direct Pallas conv kernel (NHWC implicit-GEMM)
  InnerProduct         pallas matmul with fused bias(+ReLU)

Returns None when the stock-XLA lowering should be used (everything that is
not matmul-shaped; XLA fuses those well already).
"""

from __future__ import annotations

from typing import Callable, Optional

from ..graph.lowering import LowerCtx
from ..graph.pipe import ConvOp, ConvPipe
from .kernels.conv import pallas_conv2d_nhwc, conv_blocks
from .kernels.sgemm import pallas_matmul, pick_matmul_blocks
from .tune import OpTune


def lower_op_pallas(pipe: ConvPipe, op: ConvOp, ctx: LowerCtx, tune: OpTune,
                    info_log: list[str]) -> Optional[Callable]:
    if tune.use_xla:
        return None
    if op.type == "InnerProduct":
        return _lower_ip_pallas(pipe, op, ctx, tune, info_log)
    if op.type == "Convolution":
        k, s, p = op.kern_sz(), op.stride(), op.pad()
        groups = int(op.p("groups", 1))
        if groups != 1:
            info_log.append(f"{op.name}: grouped conv -> xla")
            return None
        if k == (1, 1) and p == (0, 0) and tune.use_k1conv:
            return _lower_k1conv(pipe, op, ctx, tune, info_log)
        if s != (1, 1):
            # strided non-1x1 convs lower to XLA for now (conv1-style layers
            # are a tiny fraction of net FLOPs; direct kernel handles stride 1)
            info_log.append(f"{op.name}: strided conv -> xla")
            return None
        return _lower_conv_pallas(pipe, op, ctx, tune, info_log)
    return None


def _lower_ip_pallas(pipe, op, ctx, tune, info_log):
    ind = pipe.must_dims(op.bots[0])
    fd = pipe.must_dims(op.bots[1])
    M = ind["img"]
    K = fd["in_feats"]
    N = fd["out_chan"]
    bm, bn, bk = pick_matmul_blocks(M, K, N, tune, ind.tn)
    relu = bool(op.p("fused_relu", False))
    info_log.append(f"{op.name}: ipmatmul bm={bm} bn={bn} bk={bk}")

    def fn(x, w, b):
        xf = x.reshape(x.shape[0], -1)
        out = pallas_matmul(xf, w.T, b, bm=bm, bn=bn, bk=bk,
                            out_dtype=x.dtype, precision=tune.precision,
                            relu=relu, interpret=ctx_interp())
        return (out,)
    return fn


def _lower_k1conv(pipe, op, ctx, tune, info_log):
    """1x1 conv == matmul over flattened pixels (ref k1conv, cnn_codegen.cc:625)."""
    ind = pipe.must_dims(op.bots[0])
    fd = pipe.must_dims(op.bots[1])
    od = pipe.must_dims(op.tops[0])
    s = op.stride()
    M = od["img"] * od["y"] * od["x"]
    K = fd["in_chan"]
    N = fd["out_chan"]
    bm, bn, bk = pick_matmul_blocks(M, K, N, tune, ind.tn)
    relu = bool(op.p("fused_relu", False))
    info_log.append(f"{op.name}: k1conv bm={bm} bn={bn} bk={bk}")

    def fn(x, w, b):
        if s != (1, 1):
            x = x[:, :, ::s[0], ::s[1]]
        n, c, y, xx = x.shape
        # NCHW -> (pixels, chan): channel-last for the MXU contraction
        xf = x.transpose(0, 2, 3, 1).reshape(n * y * xx, c)
        wf = w.reshape(w.shape[0], -1).T  # (in_chan, out_chan)
        out = pallas_matmul(xf, wf, b, bm=bm, bn=bn, bk=bk, out_dtype=x.dtype,
                            precision=tune.precision, relu=relu,
                            interpret=ctx_interp())
        return (out.reshape(n, y, xx, -1).transpose(0, 3, 1, 2),)
    return fn


def _lower_conv_pallas(pipe, op, ctx, tune, info_log):
    """General conv -> direct Pallas NHWC implicit-GEMM kernel."""
    ind = pipe.must_dims(op.bots[0])
    fd = pipe.must_dims(op.bots[1])
    od = pipe.must_dims(op.tops[0])
    k, s, p = op.kern_sz(), op.stride(), op.pad()
    relu = bool(op.p("fused_relu", False))
    blocks = conv_blocks(ind, fd, od, tune)
    if blocks is None:
        info_log.append(f"{op.name}: conv doesn't fit pallas blocking -> xla")
        return None
    info_log.append(f"{op.name}: pallas_conv {blocks}")

    def fn(x, w, b):
        xh = x.transpose(0, 2, 3, 1)           # NCHW -> NHWC
        wh = w.transpose(2, 3, 1, 0)           # OIHW -> HWIO
        out = pallas_conv2d_nhwc(xh, wh, b, stride=s, pad=p, relu=relu,
                                 blocks=blocks, precision=tune.precision,
                                 interpret=ctx_interp())
        return (out.transpose(0, 3, 1, 2),)
    return fn


def ctx_interp() -> bool:
    """Pallas kernels need interpret mode on non-TPU platforms (CPU tests)."""
    import jax
    return jax.devices()[0].platform != "tpu"
