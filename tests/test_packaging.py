"""Packaging smoke: pyproject parses, every console script target resolves
to a callable, and the declared package layout matches the tree.

(An actual `pip install -e .` is exercised manually -- this environment
forbids network installs -- but entry-point resolution is what breaks in
practice, and that is fully checkable offline.)
"""

import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_metadata(pyproject):
    proj = pyproject["project"]
    assert proj["name"] == "mfar-tpu"
    assert proj["version"]
    assert any(d.startswith("jax") for d in proj["dependencies"])


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 9, "every CLI command should have an entry point"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_native_sources_shipped(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]["mfar_tpu.native"]
    assert "Makefile" in data and any(p.endswith(".cpp") for p in data)
    assert os.path.exists(os.path.join(ROOT, "mfar_tpu", "native", "Makefile"))
