"""Every module's ``__all__`` must resolve — r10 VERDICT item 3.

Two modules shipped with a missing comma in ``__all__`` (implicit
string concatenation → one bogus name, so star-imports exported
nothing). This sweep imports every ``ai_etl_framework_spark`` module
and asserts each ``__all__`` entry is a real attribute, so the bug
class can't recur silently.
"""
from __future__ import annotations

import importlib
import pkgutil

import pytest

import ai_etl_framework_spark as pkg


def _iter_module_names():
    yield pkg.__name__
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        yield info.name


MODULES = sorted(_iter_module_names())


@pytest.mark.parametrize("modname", MODULES)
def test_all_names_resolve(modname):
    mod = importlib.import_module(modname)
    names = getattr(mod, "__all__", None)
    if names is None:
        return
    assert isinstance(names, (list, tuple)), f"{modname}.__all__ not a list"
    for name in names:
        assert isinstance(name, str)
        # the exact bug class: implicit concatenation fuses two names
        assert hasattr(mod, name), (
            f"{modname}.__all__ lists {name!r} but the module has no "
            f"such attribute (missing comma in __all__?)"
        )


def test_module_sweep_nonempty():
    # paranoia: the walk found the real package, not an empty shim
    assert len(MODULES) > 30
