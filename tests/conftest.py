"""Test configuration: force the local CPU backend with 8 virtual devices.

The session environment pins JAX_PLATFORMS=axon (a remote TPU tunnel) and a
sitecustomize module registers that backend at interpreter startup — tests
must override BOTH the env var and the jax config, or every op round-trips
the tunnel. Sharding tests then see 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
