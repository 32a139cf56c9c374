"""Distribution completeness: the wheel must carry the whole framework.

The wheel story was validated end-to-end on this box (offline
``pip wheel --no-build-isolation --no-deps``; from the extracted wheel the
pool forward runs, the C++ batcher compiles from the shipped ``batcher.cc``
and serves batches, and ``aecf_tpu.tune``/``aecf_tpu.measure`` import).
Building a wheel per test run is too slow for the suite, so these tests
pin the static preconditions that end-to-end run depends on — the ways
packaging silently rots (a new subpackage without ``__init__.py`` is
dropped by ``find_packages``; non-``.py`` payloads need package-data).
"""

import os

import tomllib

_ROOT = os.path.join(os.path.dirname(__file__), "..")
_PKG = os.path.join(_ROOT, "aecf_tpu")


def _pyproject():
    with open(os.path.join(_ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_every_module_dir_is_a_package():
    # setuptools' find_packages drops any directory without __init__.py —
    # its .py files would silently vanish from the wheel.
    missing = []
    for dirpath, dirnames, filenames in os.walk(_PKG):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        if any(f.endswith(".py") for f in filenames):
            if "__init__.py" not in filenames and dirpath != _PKG:
                missing.append(os.path.relpath(dirpath, _ROOT))
    assert not missing, f"package dirs without __init__.py: {missing}"


def test_package_data_ships_native_source_and_pytyped():
    # The C++ batcher is compiled on the target host from the shipped
    # source; py.typed is the PEP 561 marker.  Both are non-.py payloads
    # that exist only if package-data names them.
    data = _pyproject()["tool"]["setuptools"]["package-data"]["aecf_tpu"]
    assert "py.typed" in data
    assert "native/batcher.cc" in data
    assert os.path.exists(os.path.join(_PKG, "py.typed"))
    assert os.path.exists(os.path.join(_PKG, "native", "batcher.cc"))


def test_no_compiled_artifacts_in_package_data():
    # The .so is host-specific (rebuilt by data.loader.build_native on
    # first use) — shipping a prebuilt one would SIGILL on other hosts.
    data = _pyproject()["tool"]["setuptools"]["package-data"]["aecf_tpu"]
    assert not any(entry.endswith(".so") for entry in data)


def test_project_metadata_complete():
    proj = _pyproject()["project"]
    assert proj["name"] == "aecf-tpu"
    import aecf_tpu

    assert proj["version"] == aecf_tpu.__version__
    assert any(dep.startswith("jax") for dep in proj["dependencies"])
    assert any(dep == "optax" for dep in proj["dependencies"])
