"""All recipe-layer python scripts must at least parse (guards bit-rot in
code paths the suite doesn't execute, e.g. cluster launchers, client
example)."""

import os
import py_compile

import pytest

EGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "egs", "gtsinger", "ssc1")

SCRIPTS = sorted(
    os.path.join(root, f)
    for root, _, files in os.walk(EGS)
    for f in files if f.endswith(".py")
)


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.relpath(s, EGS) for s in SCRIPTS])
def test_script_compiles(script, tmp_path):
    py_compile.compile(script, cfile=str(tmp_path / "out.pyc"), doraise=True)


def test_scripts_found():
    assert len(SCRIPTS) >= 8  # create_*, cyclic dump, inference, client, utils
