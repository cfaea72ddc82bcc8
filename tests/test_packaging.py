"""Distribution metadata sanity (SURVEY §1 L7).

The reference publishes its Python port to PyPI from
ports/py/pyproject.toml (maturin around the Rust core); this package's
pip face is the repo-root pyproject.toml. These tests pin the metadata
that an installer would act on — without running an install.
"""

import os
import sys
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as fh:
        return tomllib.load(fh)


def test_version_matches_package(meta):
    import mcpower_tpu

    assert meta["project"]["version"] == mcpower_tpu.__version__


def test_console_script_resolves(meta):
    target = meta["project"]["scripts"]["mcpower-tpu"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))


def test_declared_package_data_exists(meta):
    pkg_data = meta["tool"]["setuptools"]["package-data"]
    import glob

    for pkg, patterns in pkg_data.items():
        pkg_dir = os.path.join(ROOT, *pkg.split("."))
        for pat in patterns:
            assert glob.glob(os.path.join(pkg_dir, pat)), (pkg, pat)


def test_dependencies_are_importable(meta):
    # The declared runtime deps must at least exist in this image — a
    # dependency named here but absent from the test environment would
    # mean the suite isn't exercising the declared install surface.
    import importlib

    for dep in meta["project"]["dependencies"]:
        name = dep.split(">")[0].split("=")[0].split("<")[0].strip()
        importlib.import_module({"msgpack": "msgpack"}.get(name, name))


def test_sdist_includes_native_source(meta):
    # The native host kernels build lazily from the shipped .cpp — the
    # source must therefore be package data, not a repo-only file.
    pats = meta["tool"]["setuptools"]["package-data"]["mcpower_tpu.native"]
    assert "*.cpp" in pats
