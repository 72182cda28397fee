"""IPC/remote backend tests: spawned-child and TCP transports."""

import socket
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.config import make
from boda_tpu.ops.op_base import Op
from boda_tpu.ops.registry import Codegen
from boda_tpu.rtc.compute import RtcError
from boda_tpu.utils.dims import NDA, Dims
from boda_tpu.utils.lexp import parse_lexp

WORKER_ENV = {"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"}


def _make_ipc(**kw):
    from boda_tpu.utils.lexp import parse_lexp
    return make("be", "ipc", worker_be=parse_lexp("(be=interp)"), **kw)


def test_ipc_var_roundtrip_and_errors():
    be = _make_ipc()
    try:
        d = Dims.of(y=3, x=5)
        rng = np.random.RandomState(0)
        a = rng.randn(3, 5).astype(np.float32)
        be.create_var_from_nda("v", NDA(d, a))
        assert be.var_exists("v")
        assert be.get_var_dims("v") == d
        back = be.copy_var_to_nda("v")
        assert np.array_equal(back.data, a)
        be.set_var_to_zero("v")
        assert np.all(be.copy_var_to_nda("v").data == 0)
        # remote errors surface as RtcError with the worker's message
        with pytest.raises(RtcError, match="no var named 'nope'"):
            be.copy_var_to_nda("nope")
        be.release_var("v")
        assert not be.var_exists("v")
    finally:
        be.shutdown()


def test_ipc_gen_run_sgemm():
    be = _make_ipc()
    try:
        cg = Codegen(be)
        M = K = N = 32
        op = Op("sgemm", {}, {"a": Dims.of(M=M, K=K), "b": Dims.of(K=K, N=N),
                              "c": Dims.of(M=M, N=N)})
        fi = cg.gen_func(op)
        assert fi.fn is None and fi.name  # remote stub
        rng = np.random.RandomState(1)
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        be.create_var_from_nda("a", NDA(Dims.of(M=M, K=K), a))
        be.create_var_from_nda("b", NDA(Dims.of(K=K, N=N), b))
        be.create_var_with_dims("c", Dims.of(M=M, N=N))
        cg.compile()
        cg.run_func(fi, {"a": "a", "b": "b", "c": "c"})
        c = be.copy_var_to_nda("c").data
        assert np.allclose(a @ b, c, atol=1e-4)
        # timing over ipc works too
        from boda_tpu.rtc.compute import Call
        secs = be.time_func(Call(fi.name, {"a": "a", "b": "b", "c": "c"}),
                            n_iters=2, warmup=1)
        assert secs > 0
    finally:
        be.shutdown()


def test_ipc_tcp_transport():
    port = 23987
    worker = subprocess.Popen(
        [sys.executable, "-m", "boda_tpu", "ipc_compute_worker",
         f"--addr=tcp:127.0.0.1:{port}", "--listen=1"],
        cwd="/root/repo", env=WORKER_ENV)
    try:
        deadline = time.time() + 30
        be = None
        while time.time() < deadline:
            try:
                be = _make_ipc(addr=f"tcp:127.0.0.1:{port}")
                break
            except (ConnectionRefusedError, OSError):
                time.sleep(0.3)
        assert be is not None, "could not connect to tcp worker"
        assert be.get_plat_tag().startswith("ipc:")
        d = Dims.of(n=16)
        be.create_var_with_dims("x", d)
        assert be.var_exists("x")
        be.shutdown()
    finally:
        worker.wait(timeout=20)


def test_cs_test_master_mode(tmp_path):
    from boda_tpu.cli import main
    rc = main(["cs_test_master", "--worker-be=(be=interp)", "--n=1000",
               f"--boda-output-dir={tmp_path}"])
    assert rc == 0


def test_ipc_profile_op_ab_falls_back_to_chain():
    """ops_prof --method=ab over an ipc backend: remote stubs have fn=None
    and (dims, None) local vars, so the in-program A/B path is unreachable —
    profile_op must fall back to the proxied time_func RPC (chain tier)
    instead of crashing (regression: TypeError calling None)."""
    from boda_tpu.prof.opsprof import profile_op
    from boda_tpu.ops.tune import OpTune
    be = _make_ipc()
    try:
        op = Op("sgemm", {}, {"a": Dims.of(M=32, K=32), "b": Dims.of(K=32, N=32),
                              "c": Dims.of(M=32, N=32)})
        tunes = [OpTune(), OpTune(bm=8, bn=128, bk=128)]
        wis = profile_op(be, Codegen(be), op, tunes, n_iters=2, method="ab",
                         log=lambda *a: None)
        assert len(wis.runs) == 2
        assert all(r.method == "chain" for r in wis.runs)
    finally:
        be.shutdown()
