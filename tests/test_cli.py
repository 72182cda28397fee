import subprocess
import sys


def run_cli(*args):
    return subprocess.run([sys.executable, "-m", "boda_tpu", *args],
                          capture_output=True, text=True, cwd="/root/repo",
                          env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu"})


def test_noop_mode():
    r = run_cli("noop", "--msg=hello")
    assert r.returncode == 0, r.stderr
    assert "hello" in r.stdout


def test_help():
    r = run_cli("help")
    assert r.returncode == 0
    assert "noop" in r.stdout


def test_mode_help():
    r = run_cli("noop", "--help")
    assert r.returncode == 0
    assert "--msg" in r.stdout


def test_bad_mode_error():
    r = run_cli("no_such_mode")
    assert r.returncode == 1
    assert "unknown mode type id" in r.stderr


def test_unused_key_error():
    r = run_cli("noop", "--oops=1")
    assert r.returncode == 1
    assert "unused config key" in r.stderr and "oops" in r.stderr
