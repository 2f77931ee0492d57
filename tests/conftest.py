"""Test harness: force an 8-device virtual CPU mesh and f64.

Tests run on CPU (f64 available, deterministic) with 8 virtual devices so
sharding paths are exercised without TPU hardware; the driver separately
compile-checks the TPU path via __graft_entry__.

The environment's axon sitecustomize registers a remote-TPU PJRT backend in
every Python process and force-sets JAX_PLATFORMS=axon; some pytest plugins
import jax before this conftest runs. Backends initialize *lazily*, so we can
still steer to CPU here via jax.config — as long as no device has been
touched yet (asserted below).
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() == 8, jax.device_count()
