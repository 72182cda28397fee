"""lexp parser tests (mirrors the table-driven style of ref test_lexp, lexp.cc)."""

import pytest

from boda_tpu.utils.lexp import (Lexp, LexpError, check_unused, lexp_from_argv,
                                 parse_lexp, parse_lexp_leaf_str,
                                 str_format_from_nvm)


@pytest.mark.parametrize("s,expect", [
    ("foo", "foo"),
    ("", ""),
    ("(k=v)", {"k": "v"}),
    ("()", {}),
    ("(a=1,b=2)", {"a": "1", "b": "2"}),
    ("(a=(x=1,y=()),b=2)", {"a": {"x": "1", "y": {}}, "b": "2"}),
    (r"a\,b", "a,b"),
    (r"a\=b", "a=b"),
    (r"\(\)", "()"),
    (r"back\\slash", "back\\slash"),
    ("(k=a\\,b)", {"k": "a,b"}),
    ("(a=1,)", {"a": "1"}),  # trailing comma ok
])
def test_parse_roundtrip(s, expect):
    l = parse_lexp(s)
    assert l.as_dict() == expect
    # round trip: str() then reparse gives same structure
    assert parse_lexp(str(l)).as_dict() == expect


@pytest.mark.parametrize("s", [
    "(k=v",          # unterminated
    "(=v)",          # empty name
    "(k)",           # no '='
    "(k=v))",        # trailing chars
    "a,b",           # unescaped comma in top-level leaf
    "x\\",           # escape at end
])
def test_parse_errors(s):
    with pytest.raises(LexpError):
        parse_lexp(s)


def test_leaf_str():
    assert parse_lexp_leaf_str("(a=b),c").leaf_val == "(a=b),c"


def test_argv():
    l = lexp_from_argv(["run_cnet", "--alpha=1", "--rtc=(be=tpu)", "--flag", "posarg"])
    d = l.as_dict()
    assert d["mode"] == "run_cnet"
    assert d["alpha"] == "1"
    assert d["rtc"] == {"be": "tpu"}
    assert d["flag"] == "1"
    assert d["boda_pos_args_"] == {"_0": "posarg"}


def test_argv_dash_to_underscore():
    assert lexp_from_argv(["m", "--foo-bar=1"]).as_dict()["foo_bar"] == "1"


def test_unused():
    l = parse_lexp("(a=1,b=(c=2))")
    l.use_cnt = 1
    l.get_kid("a").use_cnt = 1
    unused = check_unused(l)
    assert unused == ["b"]


def test_str_format():
    assert str_format_from_nvm("x=%(a),y=%(b)%%", {"a": "1", "b": "2"}) == "x=1,y=2%"
    with pytest.raises(LexpError):
        str_format_from_nvm("%(missing)", {})
    with pytest.raises(LexpError):
        str_format_from_nvm("%x", {})
