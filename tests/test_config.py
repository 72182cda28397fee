"""Config/registry ("NESI") tests — table-driven init + error cases
(mirrors ref test_nesi, src/test_nesi.cc:170 style)."""

import pytest

from boda_tpu.config import (ConfigError, Field, Mode, class_fields, help_str,
                             instantiate, make, register, register_base,
                             set_env)
from boda_tpu.utils.dims import Dims
from boda_tpu.utils.lexp import parse_lexp


set_env(test_root="/tmp/zzz")  # used by ToyZoo.data_fn default expansion


# -- toy registry for tests ---------------------------------------------------

@register_base("toy_animal", tid_vn="kind")
class ToyAnimal:
    legs = Field(int, default="4", help="number of legs")


@register("toy_animal", "dog", help="a dog")
class ToyDog(ToyAnimal):
    name = Field(str, req=True, help="the dog's name")
    mass = Field(float, default="10.0", help="kg")


@register("toy_animal", "snake", help="a snake")
class ToySnake(ToyAnimal):
    legs = Field(int, default="0", help="number of legs")
    venomous = Field(bool, default="0", help="is it venomous")


@register("mode", "toy_zoo", help="test mode with nested objects")
class ToyZoo(Mode):
    pet = Field("toy_animal", req=True, help="the zoo's pet")
    others = Field((list, "toy_animal"), default="()", help="other animals")
    tags = Field((dict, str), default="()", help="string map")
    in_dims = Field(Dims, default="(img=1,chan=3)", help="input dims")
    data_fn = Field("filename", default="%(test_root)/f.txt", help="a path")

    def main(self):
        pass


@pytest.fixture(autouse=True, scope="module")
def _unregister_toys():
    """Keep the toy classes out of the global registry after this module:
    the err_bad_mode golden asserts the exact production mode list."""
    yield
    from boda_tpu.config import _REGISTRY
    _REGISTRY["mode"]["classes"].pop("toy_zoo", None)
    _REGISTRY.pop("toy_animal", None)


def test_basic_init():
    z = instantiate("mode", parse_lexp("(mode=toy_zoo,pet=(kind=dog,name=rex))"))
    assert isinstance(z.pet, ToyDog)
    assert z.pet.name == "rex"
    assert z.pet.legs == 4
    assert z.pet.mass == 10.0
    assert z.others == []
    assert z.in_dims == Dims.of(img=1, chan=3)


def test_polymorphic_and_defaults_override():
    z = instantiate("mode", parse_lexp(
        "(mode=toy_zoo,pet=(kind=snake,venomous=1),others=(a=(kind=dog,name=a),b=snake))"))
    assert isinstance(z.pet, ToySnake)
    assert z.pet.legs == 0 and z.pet.venomous is True
    assert len(z.others) == 2
    assert isinstance(z.others[1], ToySnake)  # bare leaf = tid shorthand


def test_missing_required():
    with pytest.raises(ConfigError, match="name.*missing required"):
        instantiate("mode", parse_lexp("(mode=toy_zoo,pet=(kind=dog))"))


def test_bad_tid():
    with pytest.raises(ConfigError, match="unknown toy_animal type id 'cat'"):
        instantiate("mode", parse_lexp("(mode=toy_zoo,pet=(kind=cat))"))


def test_bad_int():
    with pytest.raises(ConfigError, match="can't convert"):
        instantiate("mode", parse_lexp("(mode=toy_zoo,pet=(kind=dog,name=x,legs=abc))"))


def test_unused_key_error():
    with pytest.raises(ConfigError, match="unused config key.*pet.typo_key"):
        instantiate("mode",
                    parse_lexp("(mode=toy_zoo,pet=(kind=dog,name=x,typo_key=1))"),
                    check_unused_keys=True)


def test_filename_env_expansion():
    set_env(test_root="/tmp/zzz")
    z = instantiate("mode", parse_lexp("(mode=toy_zoo,pet=(kind=dog,name=x))"))
    assert z.data_fn == "/tmp/zzz/f.txt"


def test_dims_field_and_map():
    z = instantiate("mode", parse_lexp(
        "(mode=toy_zoo,pet=snake,in_dims=(img=5,chan=3,y=2,x=2),tags=(a=1,b=zz))"))
    assert z.pet.name if hasattr(z.pet, "name") else True
    assert z.in_dims.shape == (5, 3, 2, 2)
    assert z.tags == {"a": "1", "b": "zz"}


def test_make_programmatic():
    d = make("toy_animal", "dog", name="fido", mass=3.5)
    assert d.name == "fido" and d.mass == 3.5 and d.legs == 4
    with pytest.raises(ConfigError, match="unknown field"):
        make("toy_animal", "dog", name="x", nosuch=1)
    with pytest.raises(ConfigError, match="missing required"):
        make("toy_animal", "dog")


def test_help():
    h = help_str("toy_animal")
    assert "dog" in h and "snake" in h
    h2 = help_str("toy_animal", "dog")
    assert "REQUIRED" in h2 and "the dog's name" in h2


def test_field_order_follows_mro():
    names = [f.name for f in class_fields(ToyDog)]
    assert names == ["legs", "name", "mass"]


def test_cfg_file_loading(tmp_path):
    from boda_tpu.config import get_env, load_cfg_file
    cfg = tmp_path / "cfg.xml"
    cfg.write_text('<cfg my_var="/some/path" other="2"/>')
    load_cfg_file(str(cfg))
    env = get_env()
    assert env["my_var"] == "/some/path" and env["other"] == "2"
