"""Batch-split region tune (PallasFwd.batch_split).

A net-level tune knob: compile a subgraph between two cut nodes as k
sequential batch chunks inside the one jit. Inference ops are per-sample
along img, so results must match the unsplit engine exactly (within the
standing 1e-5 cross-engine bar). Motivated by the measured r50 res2@b64
in-net superlinearity (NOTES_ROUND3.md); the TPU analog of the reference's
tunable work decomposition (gbt_tile.H:24) at the only externally-tunable
granularity XLA leaves us.
"""

import numpy as np
import pytest

from boda_tpu.config import ConfigError, make
from boda_tpu.models.zoo import build_model
from boda_tpu.utils.digest import comp_vars
from boda_tpu.utils.dims import NDA


def _fwd(pipe, in_dims, outs, **kw):
    rng = np.random.RandomState(7)
    x = NDA(in_dims["data"],
            rng.randn(*in_dims["data"].shape).astype(np.float32))
    eng = make("conv_fwd", "pallas", **kw)
    eng.init(pipe)
    return eng.run_fwd({"data": x}, outs), eng, x


def test_batch_split_matches_unsplit():
    pipe, in_dims = build_model("mini_resnet", img=4)
    ref, _, _ = _fwd(pipe, in_dims, ["prob"])
    got, eng, _ = _fwd(pipe, in_dims, ["prob"],
                       batch_split=["relu1:s1b1_relu:2"])
    assert eng._bs_applied == [("relu1", "s1b1_relu")]
    a, b = ref["prob"].data, got["prob"].data
    r = comp_vars(a, b, mrd_toler=1e-5, atol=1e-6)
    assert r.ok(), r


def test_batch_split_region_with_strided_stage():
    # stage-2 region crosses a stride-2 projection block (s2b0_sc skip)
    pipe, in_dims = build_model("mini_resnet", img=4)
    ref, _, _ = _fwd(pipe, in_dims, ["prob"])
    got, _, _ = _fwd(pipe, in_dims, ["prob"],
                     batch_split=["s1b1_relu:s2b1_relu:4"])
    r = comp_vars(ref["prob"].data, got["prob"].data,
                  mrd_toler=1e-5, atol=1e-6)
    assert r.ok(), r


def test_batch_split_deactivates_for_internal_output():
    # requesting a mid-region node as output must fall back to unsplit
    pipe, in_dims = build_model("mini_resnet", img=4)
    ref, _, _ = _fwd(pipe, in_dims, ["s1b0_relu", "prob"])
    got, eng, _ = _fwd(pipe, in_dims, ["s1b0_relu", "prob"],
                       batch_split=["relu1:s1b1_relu:2"])
    assert eng._bs_applied == []
    for n in ("s1b0_relu", "prob"):
        r = comp_vars(ref[n].data, got[n].data, mrd_toler=1e-5, atol=1e-6)
        assert r.ok(), (n, r)


def test_batch_split_deactivates_for_midregion_input():
    # suffix run from a mid-region node (net_decomp-style) must still work
    pipe, in_dims = build_model("mini_resnet", img=4)
    ref, eng_ref, x = _fwd(pipe, in_dims, ["s1b0_relu"])
    eng = make("conv_fwd", "pallas", batch_split=["relu1:s1b1_relu:2"])
    eng.init(pipe)
    got = eng.run_fwd({"s1b0_relu": ref["s1b0_relu"]}, ["prob"])
    assert eng._bs_applied == []
    full = eng_ref.run_fwd({"data": x}, ["prob"])
    r = comp_vars(full["prob"].data, got["prob"].data,
                  mrd_toler=1e-5, atol=1e-6)
    assert r.ok(), r


def test_batch_split_bad_specs():
    pipe, in_dims = build_model("mini_resnet", img=4)
    rng = np.random.RandomState(7)
    x = NDA(in_dims["data"],
            rng.randn(*in_dims["data"].shape).astype(np.float32))

    def init_run(spec):
        eng = make("conv_fwd", "pallas", batch_split=[spec])
        eng.init(pipe)
        eng.run_fwd({"data": x}, ["prob"])

    with pytest.raises(ConfigError, match="not 'in_node:out_node:k'"):
        init_run("relu1:s1b1_relu")
    with pytest.raises(ConfigError, match="does not divide batch"):
        init_run("relu1:s1b1_relu:3")
    # leak: relu1 is internal to data->s1b0_r1 but consumed by the s1b0
    # eltwise outside the region
    with pytest.raises(ConfigError, match="consumed outside the region"):
        init_run("data:s1b0_r1:2")


def test_batch_split_from_net_input():
    # a region whose entry IS a provided input (the net input) must still
    # apply: only INTERNAL nodes crossing the boundary deactivate it
    pipe, in_dims = build_model("mini_resnet", img=4)
    ref, _, _ = _fwd(pipe, in_dims, ["prob"])
    got, eng, _ = _fwd(pipe, in_dims, ["prob"],
                       batch_split=["data:s1b1_relu:2"])
    assert eng._bs_applied == [("data", "s1b1_relu")]
    r = comp_vars(ref["prob"].data, got["prob"].data,
                  mrd_toler=1e-5, atol=1e-6)
    assert r.ok(), r
