"""Test environment: force the real CPU backend (the axon TPU plugin hijacks
``JAX_PLATFORMS=cpu``, so use ``JAX_PLATFORM_NAME``), 8 virtual devices for
mesh tests, float64, and the scan-friendly XLA flags — all before the first
jax import."""

import os
import sys

# Env vars can be too late here (pytest plugin autoload may import jax before
# this conftest), so use jax.config, which works any time before the backend
# initializes.  Note the axon TPU plugin ignores JAX_PLATFORMS=cpu entirely;
# jax_platform_name is the reliable switch.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_disable_hlo_passes=while_loop_unroller"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# NaN sanitizer in test mode (SURVEY §5): any computation returning NaN
# fails loudly.  Tests that inject NaNs on purpose (defensive culling)
# opt out locally with `with jax.debug_nans(False): ...`.
jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module: a full-suite run
    accumulates ~600 XLA:CPU programs in one process and the compiler
    segfaults deterministically around the 144th test (inside
    backend_compile_and_load); dropping the caches at module boundaries
    keeps the process within whatever resource the compiler exhausts.
    Costs a few shared recompiles per module."""
    yield
    jax.clear_caches()


REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "lib"))


@pytest.fixture(scope="session")
def reference_libprop():
    """The actual NumPy reference, imported as a parity oracle (read-only)."""
    if not has_reference():
        pytest.skip("reference implementation not available")
    sys.path.insert(0, REFERENCE_PATH)
    import lib.libprop as lprop

    return lprop


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
