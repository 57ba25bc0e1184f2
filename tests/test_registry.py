import pytest

from rs_detection_tpu.utils.registry import Registry, build_from_cfg


def test_register_and_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    assert "Foo" in REG
    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert obj.a == 1 and obj.b == 2


def test_named_registration():
    REG = Registry("test")

    @REG.register_module(name="bar")
    class Foo:
        pass

    assert "bar" in REG and "Foo" not in REG


def test_default_args():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG, b=5)
    assert obj.b == 5
    # explicit cfg key wins over default
    obj = build_from_cfg(dict(type="Foo", a=1, b=9), REG, b=5)
    assert obj.b == 9


def test_list_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a):
            self.a = a

    objs = build_from_cfg([dict(type="Foo", a=1), dict(type="Foo", a=2)], REG)
    assert [o.a for o in objs] == [1, 2]


def test_none_passthrough():
    REG = Registry("test")
    assert build_from_cfg(None, REG) is None


def test_duplicate_raises():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        pass

    with pytest.raises(KeyError):
        @REG.register_module(name="Foo")
        class Bar:
            pass


def test_missing_type_raises():
    REG = Registry("test")
    with pytest.raises(KeyError):
        build_from_cfg(dict(a=1), REG)
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Nope"), REG)
