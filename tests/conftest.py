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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    """Drop compiled programs between test modules.

    The XLA CPU compiler segfaults nondeterministically once a process
    has accumulated many hundreds of compilations (observed twice at
    ~80% of a full-suite run, in backend_compile, at call sites that
    pass in isolation — a different test each time). Clearing the jax
    caches at module boundaries bounds the compiler state; intra-module
    compile reuse (where nearly all of it lives) is unaffected.
    """
    yield
    jax.clear_caches()
