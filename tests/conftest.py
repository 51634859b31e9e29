"""Test config: force a fake 8-device CPU backend so kernels run in interpret
mode and sharding tests exercise a virtual mesh (SURVEY §4: the fake-cluster
capability the reference lacks).

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) and something
re-sets jax_platforms programmatically, so the env var alone is not enough —
jax.config.update must run before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jit/pallas caches after every test module.

    Root cause this guards against: each XLA:CPU LoadedExecutable holds
    JIT-code mmaps; a full-suite run accumulated ~53k mappings by test ~269
    and crashed INSIDE the next compile (SIGSEGV/SIGABRT in
    backend_compile_and_load) when the process hit vm.max_map_count
    (65530).  Reproduced 3/3 at the same test, passed in any half-suite —
    a pure cumulative-state crash.  Clearing per MODULE keeps the map count
    bounded while preserving within-module program reuse (fixtures
    recompile at most once per file)."""
    yield
    jax.clear_caches()
    gc.collect()
