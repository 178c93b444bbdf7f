"""Packaging metadata stays truthful (r13 verdict item 2: pyproject +
console script; reference parity: go.mod / build.yml make the Go engine
installable-and-runnable — pyproject.toml is this engine's analog).

The full fresh-venv install-and-drain rung is `make pkg-smoke`
(tools/pkg_smoke.py); these tests are the fast metadata half."""

from __future__ import annotations

import importlib
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _pyproject() -> dict:
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def test_pyproject_parses_and_names_the_package():
    meta = _pyproject()
    assert meta["project"]["name"] == "better-cdc-spark"
    assert "pyspark" in " ".join(meta["project"]["dependencies"])


def test_console_script_target_resolves():
    meta = _pyproject()
    target = meta["project"]["scripts"]["better-cdc-spark"]
    mod_name, _, attr = target.partition(":")
    fn = getattr(importlib.import_module(mod_name), attr)
    assert callable(fn)


def test_dynamic_version_attr_matches_package():
    meta = _pyproject()
    attr_path = meta["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    mod_name, _, attr = attr_path.rpartition(".")
    import better_cdc_spark

    assert mod_name == "better_cdc_spark"
    assert getattr(better_cdc_spark, attr) == better_cdc_spark.__version__


def test_packages_find_covers_all_subpackages():
    """Every directory under better_cdc_spark/ with an __init__.py must be
    matched by the packages.find include, or the wheel silently ships
    without it."""
    from fnmatch import fnmatch

    meta = _pyproject()
    include = meta["tool"]["setuptools"]["packages"]["find"]["include"]
    for init in (ROOT / "better_cdc_spark").rglob("__init__.py"):
        pkg = ".".join(init.parent.relative_to(ROOT).parts)
        # the real check: each package NAME matches an include PATTERN
        # (setuptools find semantics) — a narrowed include (e.g. dropping
        # the trailing *) would silently ship a wheel without subpackages
        assert any(fnmatch(pkg, pat) for pat in include), (pkg, include)
