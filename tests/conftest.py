"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding code is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Env must be set before jax initializes its backends.

Exception — the on-TPU compiled-kernel regression suite (VERDICT r3 #2):

    timeout 1700 python -m pytest tests/ -m tpu -q

keeps the real backend (the CPU force below is skipped when the marker
expression is exactly ``tpu``) and runs every ``@pytest.mark.tpu`` test
against COMPILED Mosaic kernels — the bug class interpret-mode CPU tests
cannot see (the round-3 B>=512 compiler cliff was found by hand, not by
tests). Wedge rules apply (CLAUDE.md): one TPU client at a time, bound the
whole run with ``timeout``. In the default CPU run the tpu-marked tests
are auto-skipped.
"""

import os
import sys


def _marker_expr() -> str:
    """The -m marker expression from the command line, read before pytest
    parses options (this module must decide the backend before jax does)."""
    for i, a in enumerate(sys.argv):
        if a == "-m" and i + 1 < len(sys.argv):
            return sys.argv[i + 1]
        if a.startswith("-m=") :
            return a[3:]
    return ""


TPU_RUN = _marker_expr().strip() == "tpu" or os.environ.get("SVD_TESTS_TPU") == "1"

if not TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A TPU plugin (axon) may have been registered by a sitecustomize hook at
# interpreter startup, before this conftest runs. Backend *initialization*
# is lazy, so overriding the platform via the config still wins as long as
# no jax computation has executed yet.
if not TPU_RUN:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: compiled-Mosaic regression test — needs the real TPU backend "
        "(run with `-m tpu`; auto-skipped in the default CPU suite)",
    )


def pytest_collection_modifyitems(config, items):
    if TPU_RUN:
        return  # -m tpu deselects the CPU tests; tpu tests run compiled
    skip = pytest.mark.skip(
        reason="compiled-kernel test: run `python -m pytest tests/ -m tpu -q` "
        "on the TPU backend"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")
REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def subprocess_env(**overrides) -> dict:
    """Environment for subprocess tests: the repo prepended to PYTHONPATH
    with every existing entry preserved (CLAUDE.md: never overwrite
    PYTHONPATH — the TPU plugin may live in another entry), plus
    ``overrides``. An override of ``None`` removes the variable."""
    env = dict(os.environ)
    for k, v in overrides.items():
        if v is None:
            env.pop(k, None)
        else:
            env[k] = v
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and p != REPO_DIR]
    env["PYTHONPATH"] = os.pathsep.join([REPO_DIR] + pp)
    return env


@pytest.fixture(scope="session")
def reference_dir():
    """Path to the upstream reference checkout; tests that golden-check
    against its shipped CSV fixtures skip when it is absent."""
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "code")):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
