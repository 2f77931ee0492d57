"""Backend steering for host-side tools.

The environment's axon sitecustomize force-registers a remote-TPU PJRT
backend in every Python process (see tests/conftest.py). Benchmark / grid
runners that want deterministic f64 CPU replay must therefore steer JAX
explicitly BEFORE any device is touched — an env-var prefix on the command
line is not enough.
"""

from __future__ import annotations

import os


def force_cpu_f64(devices: int | None = None) -> None:
    """Force the CPU backend + f64 for this process. Must be called before
    JAX initializes a backend (asserts if too late). `devices` optionally
    sets a virtual host-device count (sharding tests)."""
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    if devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={devices}"
            ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    except RuntimeError:
        pass  # backend already up — the assert below is the real check
    assert jax.default_backend() == "cpu", (
        "CPU steering came too late — a backend was already initialized: "
        + jax.default_backend())
