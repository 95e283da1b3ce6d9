"""Test configuration: run on CPU with 8 virtual devices and x64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); float64 is available for
reference-parity tests.  The environment may pin JAX_PLATFORMS to a TPU
plugin (e.g. 'axon'); ``jax.config`` overrides it reliably, the env var
alone does not.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the single-process suite's accumulated compile-cache /
    executable state: a full run holds hundreds of compiled XLA:CPU
    programs (several interpret-mode Pallas kernels among them) and has
    produced a rare XLA:CPU compiler segfault late in the run.  Clearing
    per module keeps peak state flat at negligible re-compile cost."""
    yield
    jax.clear_caches()
