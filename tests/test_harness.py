"""Tests for the golden-dir harness (test_cmds/test_all/test_compute modes)."""

import os
import shutil

import pytest

import boda_tpu.modes_all  # noqa: F401
from boda_tpu.cli import main
from boda_tpu.config import default_cfg_init, set_env
from boda_tpu.modes.test_cmds import diff_dirs, diff_file

default_cfg_init("/root/repo")


def test_test_cmds_green(tmp_path):
    rc = main(["test_cmds", f"--boda-output-dir={tmp_path}"])
    assert rc == 0


def test_test_cmds_filter_and_fail_detection(tmp_path, capsys):
    # run with a filter; then corrupt an archive copy and verify it FAILS
    good_copy = tmp_path / "good"
    shutil.copytree("/root/repo/testdata/good_tr", good_copy)
    rc = main(["test_cmds", f"--boda-output-dir={tmp_path}/o1",
               f"--good-dir={good_copy}", "--filt=noop"])
    assert rc == 0
    with open(good_copy / "noop" / "test_out.txt", "a") as f:
        f.write("CORRUPTED\n")
    rc = main(["test_cmds", f"--boda-output-dir={tmp_path}/o2",
               f"--good-dir={good_copy}", "--filt=noop"])
    assert rc == 1
    out = capsys.readouterr().out
    assert "FAIL noop" in out and "CORRUPTED" in out
    # --update-failing re-archives and it passes again
    rc = main(["test_cmds", f"--boda-output-dir={tmp_path}/o3",
               f"--good-dir={good_copy}", "--filt=noop", "--update-failing=1"])
    assert rc == 0
    rc = main(["test_cmds", f"--boda-output-dir={tmp_path}/o4",
               f"--good-dir={good_copy}", "--filt=noop"])
    assert rc == 0


def test_expected_error_mismatch(tmp_path):
    xml = tmp_path / "cmds.xml"
    xml.write_text('<t><li test_name="x" cli_str="noop" err="this error never happens"/></t>')
    rc = main(["test_cmds", f"--xml-fn={xml}", f"--boda-output-dir={tmp_path}"])
    assert rc == 1


def test_needs_gating(tmp_path, capsys):
    xml = tmp_path / "cmds.xml"
    xml.write_text('<t><li test_name="x" cli_str="noop" needs="tpu"/></t>')
    rc = main(["test_cmds", f"--xml-fn={xml}", f"--boda-output-dir={tmp_path}"])
    assert rc == 0  # skipped on cpu test host
    assert "0/0 passed, 1 skipped" in capsys.readouterr().out


def test_diff_file_types(tmp_path):
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("one\ntwo\n")
    b.write_text("one\ntwo\n")
    assert diff_file(str(a), str(b)) == ""
    b.write_text("one\nTWO\n")
    d = diff_file(str(a), str(b))
    assert "-two" in d and "+TWO" in d
    x, y = tmp_path / "a.bin", tmp_path / "b.bin"
    x.write_bytes(b"\x00\x01")
    y.write_bytes(b"\x00\x02")
    assert "binary files differ" in diff_file(str(x), str(y))


def test_test_all(tmp_path):
    rc = main(["test_all", f"--boda-output-dir={tmp_path}"])
    assert rc == 0


def test_test_compute_catches_divergence(tmp_path, capsys):
    """Digest anchoring: perturbed stored digests must cause a failure."""
    from boda_tpu.utils.digest import DigestStream
    dig = tmp_path / "d.boda"
    rc = main(["test_compute", "--model=mini_resnet", "--img=1", "--n-wins=1",
               f"--write-digests-fn={dig}", f"--boda-output-dir={tmp_path}"])
    assert rc == 0
    ds = DigestStream.load(str(dig))
    for _, d in ds.entries:
        d.sum *= 1.5
        d.samples = d.samples * 1.5
    ds.save(str(dig))
    rc = main(["test_compute", "--model=mini_resnet", "--img=1", "--n-wins=1",
               f"--kg-digests-fn={dig}", f"--boda-output-dir={tmp_path}"])
    assert rc == 1
    assert "digest mrd" in capsys.readouterr().out
