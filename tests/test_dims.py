import numpy as np
import pytest

from boda_tpu.utils.digest import DigestStream, NdaDigest, comp_vars
from boda_tpu.utils.dims import NDA, Dims


def test_dims_basic():
    d = Dims.of(img=8, chan=64, y=56, x=56)
    assert d.shape == (8, 64, 56, 56)
    assert d["chan"] == 64
    assert d.size("x") == 56
    assert "y" in d and "z" not in d
    assert d.num_elems() == 8 * 64 * 56 * 56
    assert d.bytes_sz() == d.num_elems() * 4
    assert d.strides() == (64 * 56 * 56, 56 * 56, 56, 1)


def test_dims_parse_str_roundtrip():
    d = Dims.of(M=512, N=256, tn="float32")
    s = str(d)
    assert Dims.parse(s) == d
    d2 = Dims.of(M=2, tn="bfloat16")
    assert Dims.parse(str(d2)) == d2


def test_dims_transforms():
    d = Dims.of(img=2, chan=3, y=4, x=5)
    assert d.drop("img").names == ("chan", "y", "x")
    assert d.select("x", "y").sizes == (5, 4)
    assert d.with_size("chan", 7)["chan"] == 7
    assert d.prepend(n=9).names[0] == "n"
    assert d.append(k=3).names[-1] == "k"


def test_dims_errors():
    with pytest.raises(ValueError):
        Dims.make(("a", "a"), (1, 2))
    with pytest.raises(ValueError):
        Dims.make(("a",), (1, 2))
    with pytest.raises(KeyError):
        Dims.of(a=1).size("b")


def test_nda():
    d = Dims.of(y=2, x=3)
    n = NDA(d)
    assert n.data.shape == (2, 3) and n.data.dtype == np.float32
    n2 = NDA.from_array(np.arange(6).reshape(2, 3))
    assert n2.dims.tn in ("int64", "int32")  # platform-dependent arange dtype


def test_digest_and_comp():
    rng = np.random.RandomState(0)
    a = rng.randn(4, 32).astype(np.float32)
    da = NdaDigest.make(a)
    db = NdaDigest.make(a.copy())
    assert da.exact_eq(db)
    assert da.mrd_comp(db) == 0.0

    b = a * (1 + 1e-6)
    dc = NdaDigest.make(b)
    assert not da.exact_eq(dc)
    assert da.mrd_comp(dc) < 1e-4

    r = comp_vars(a, b, mrd_toler=1e-4)
    assert r.ok()
    r2 = comp_vars(a, a * 1.01, mrd_toler=1e-4)
    assert not r2.ok()
    assert r2.mrd == pytest.approx(0.01 / 1.01, rel=1e-3)


def test_digest_stream_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    ds = DigestStream()
    ds.add("conv1", rng.randn(2, 3).astype(np.float32))
    ds.add("pool1", rng.randn(5,).astype(np.float32))
    fn = str(tmp_path / "digests.boda")
    ds.save(fn)
    ds2 = DigestStream.load(fn)
    assert [n for n, _ in ds2.entries] == ["conv1", "pool1"]
    for (n1, d1), (n2, d2) in zip(ds.entries, ds2.entries):
        assert d1.exact_eq(d2)
        assert d1.mrd_comp(d2) == 0.0
