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
