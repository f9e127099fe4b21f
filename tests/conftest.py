"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding code is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Env must be set before jax initializes its backends.
"""

import os

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
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

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
