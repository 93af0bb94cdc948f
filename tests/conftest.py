"""Test harness config: CPU backend, 8 virtual devices, 64-bit.

Conformance tests run against the reference's float64 tolerances, so x64 is
enabled; multi-chip tests use the standard JAX CPU-simulation stand-in
(survey §4 end note): ``--xla_force_host_platform_device_count=8``.
"""

import os
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms=axon programmatically; the config update below (after import)
# is what actually lands the test suite on the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: repeated suite runs on this 1-CPU host skip
# the multi-minute XLA compiles of the jitted cycle/PCG programs
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/amg_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402

FIXTURES = Path(__file__).parent / "fixtures"


def load_csc(name: str) -> sp.csc_matrix:
    z = np.load(FIXTURES / f"{name}.npz")
    return sp.csc_matrix(
        (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
    )


def load_npz(name: str):
    return np.load(FIXTURES / f"{name}.npz")


@pytest.fixture
def graph():
    """100×100 graph fixture (reference test/test.jl)."""
    return load_csc("test")


@pytest.fixture
def ref_S():
    return load_csc("ref_S_test")


@pytest.fixture
def ref_split():
    return np.load(FIXTURES / "ref_split.npy")


@pytest.fixture
def thing():
    """46×46 non-SPD graph (reference test/thing.jl)."""
    return load_csc("thing")


@pytest.fixture
def randlap():
    """100×100 random graph Laplacian (reference test/randlap.jl)."""
    return load_csc("randlap")


@pytest.fixture
def onetoall():
    return load_csc("onetoall")


@pytest.fixture
def ref_R():
    return load_csc("ref_R")


@pytest.fixture
def lin_elastic_2d():
    z = load_npz("lin_elastic_2d")
    A = sp.csc_matrix((z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"]))
    return A, z["B"], z["b"]


@pytest.fixture
def bug_graph():
    return load_csc("bug_graph")
