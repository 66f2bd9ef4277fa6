"""Packaging metadata checks (VERDICT r9 item 3): the engine must be
consumable as a library — `pyproject.toml` present and buildable, the
sdist self-contained (every subpackage + the BPE merges data file), the
console entry point resolvable, and the built tree importable on a
clean ``sys.path``.

CI-style note: this container has no `wheel` module and no network, so
the install proof is the offline equivalent of ``pip install .``: build
the REAL sdist with the declared build backend, unpack it, and import
the package from the unpacked tree in a subprocess whose ``sys.path``
contains only the stdlib + site-packages + that tree (what an installed
site-packages copy looks like)."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import tarfile

import pytest

try:  # py3.11+ stdlib; fall back to tomli on 3.10 (requires-python floor)
    import tomllib
except ModuleNotFoundError:  # pragma: no cover - py3.10 path
    tomllib = pytest.importorskip("tomli")

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_pyproject_metadata_complete():
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    proj = meta["project"]
    assert proj["name"] == "python-ctd-spark"
    assert proj["version"]
    # runtime deps are exactly the baked-in public stack
    deps = " ".join(proj["dependencies"])
    for need in ("pyspark", "pyarrow", "pandas", "numpy"):
        assert need in deps, need
    # extras gate the optional imports the code try-guards
    assert set(proj["optional-dependencies"]) >= {"gsw", "plot", "test"}
    # console entry point points at a real callable
    target = proj["scripts"]["ctd-spark-bench"]
    mod, fn = target.split(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), fn))


def test_version_single_source():
    import python_ctd_spark

    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    assert python_ctd_spark.__version__ == meta["project"]["version"]


@pytest.fixture(scope="module")
def sdist_tree(tmp_path_factory):
    """Build the real sdist via the declared backend and unpack it."""
    out = tmp_path_factory.mktemp("dist")
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        from setuptools import build_meta as backend

        name = backend.build_sdist(str(out))
    finally:
        os.chdir(cwd)
    with tarfile.open(out / name) as tf:
        tf.extractall(out, filter="data")
    (root,) = [p for p in out.iterdir() if p.is_dir()]
    return root


def test_sdist_is_self_contained(sdist_tree):
    """Every subpackage and the shipped data file are in the artifact —
    a user's install sees the same modules the repo tests exercise."""
    pkg = sdist_tree / "python_ctd_spark"
    for sub in ("operators", "io", "functions", "streaming"):
        assert (pkg / sub / "__init__.py").is_file(), sub
    # the default BPE merge table ships with the package, so
    # load_ranks() works post-install without the repo checkout
    assert (pkg / "data" / "bpe_merges.txt").is_file()
    for mod in ("api.py", "corpus.py", "session.py", "cli.py", "schema.py"):
        assert (pkg / mod).is_file(), mod
    assert (sdist_tree / "PKG-INFO").is_file()


def test_built_tree_imports_cleanly(sdist_tree):
    """Import the UNPACKED sdist (not the repo checkout) in a subprocess
    with the repo scrubbed from sys.path — the installed-package smoke
    test: package imports, version matches, the default merge table
    resolves inside the artifact, and the CLI callable exists."""
    code = (
        "import sys; "
        f"sys.path.insert(0, {str(sdist_tree)!r}); "
        "import python_ctd_spark, python_ctd_spark.cli as cli; "
        "from python_ctd_spark.functions.bpe import DEFAULT_MERGES, load_ranks; "
        f"assert python_ctd_spark.__file__.startswith({str(sdist_tree)!r}), "
        "python_ctd_spark.__file__; "
        "assert DEFAULT_MERGES.is_file(), DEFAULT_MERGES; "
        "assert len(load_ranks()) > 100; "
        "assert callable(cli.bench_main); "
        "print(python_ctd_spark.__version__)"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(sdist_tree),
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "0.1.0"


def test_bench_compact_line_respects_tail_capture():
    """bench.pack_compact_line: the stdout line must stay under the
    harness's ~2000-char tail capture for ANY suite size, parse as
    JSON, and carry the slowest queries first (the ones worth seeing
    when the full map does not fit)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import pack_compact_line

    base = {"metric": "query_suite_runtime", "value": 999.99, "unit": "sec",
            "queries": {}, "n_queries": 400, "passes": 3,
            "full": "BENCH_out.json", "sf": 0.1}
    timings = {f"very_long_query_name_{i:03d}": round(i * 0.37, 2)
               for i in range(400)}
    line = pack_compact_line(timings, base)
    assert len(line) <= 1700
    rec = json.loads(line)
    assert rec["n_queries"] == 400
    got = list(rec["queries"].values())
    assert got == sorted(got, reverse=True), "slowest-first"
    assert got[0] == max(timings.values())
    # a small suite fits whole
    small = {f"q{i}": float(i) for i in range(20)}
    rec2 = json.loads(pack_compact_line(small, base))
    assert len(rec2["queries"]) == 20
