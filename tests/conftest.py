"""Test harness configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding validation) and
float64 enabled (numerical-parity oracles against the C++ double-precision
reference). Must run before jax is imported anywhere.
"""
import os

# Must be set before jax initializes its backends. Note: the axon TPU tunnel
# pre-sets JAX_PLATFORMS=axon via a site hook, so we also force the config
# after import — the env var alone is not enough in that environment.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
