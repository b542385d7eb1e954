"""Test configuration: force an 8-device virtual CPU mesh (standard JAX trick)
so multi-chip sharding tests run hermetically without TPU hardware.

NOTE: this image pre-registers a TPU PJRT plugin from sitecustomize, so the
usual ``JAX_PLATFORMS`` env var is locked before pytest starts; the config
update below is what actually switches the platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# The XLA:CPU compiler segfaults reproducibly when the ~190th program of
# one pytest process compiles (observed twice at the same test with
# different orderings of preceding modules; any single module passes
# alone).  Dropping the jit executable caches at module boundaries keeps
# the per-process compiled-program population bounded and avoids the
# crash; modules recompile their own programs anyway, so the cost is
# small.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_population():
    yield
    jax.clear_caches()
