"""Test configuration: force an 8-virtual-device CPU platform (set before jax
import) so multi-chip sharding paths are exercised without TPU hardware, plus
the seeded fixtures the reference suite relies on (tests/conftest.py:54-99)."""

import os

# SPINGLASS_TPU_TESTS=1 leaves the real backend in place so the -m tpu
# tier (tests/tpu/) can exercise flagship code paths on actual hardware
# (VERDICT.md r3 task 6: the sharded Pallas engine must run on real TPU at
# least once per round, not only interpret-mode CPU).
_ON_TPU_TIER = os.environ.get("SPINGLASS_TPU_TESTS", "") == "1"

if not _ON_TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _ON_TPU_TIER:
    # the axon TPU plugin (sitecustomize) sets jax_platforms
    # programmatically, which overrides the env var — force CPU at the
    # config level too
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    for marker in ("unit", "integration", "e2e", "slow", "tpu", "multidevice"):
        config.addinivalue_line("markers", f"{marker}: {marker} tests")


@pytest.fixture(autouse=True)
def _seed_everything():
    np.random.seed(42)
    yield


@pytest.fixture
def key():
    return jax.random.key(42)


@pytest.fixture
def small_problem():
    """16-spin random +-J instance."""
    from spinglass_tpu.core import topology
    from spinglass_tpu.core.problem import IsingProblem

    j = topology.fully_connected(16, dist="binary", seed=7)
    h = np.random.default_rng(7).normal(0, 0.5, 16)
    return IsingProblem.from_dense(j, h)


@pytest.fixture
def grid_problem():
    """8x8 2D grid (2-colorable) ferromagnet with weak fields."""
    from spinglass_tpu.core import topology
    from spinglass_tpu.core.problem import IsingProblem

    j = topology.grid_2d(8, 8, dist="ferromagnetic", scale=1.0, seed=3)
    return IsingProblem.from_dense(j, np.zeros(64))
