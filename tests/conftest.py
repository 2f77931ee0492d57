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
# machine-keyed persistent compile cache: the suite compiles ~100 solver
# variants; besides the wall-clock win, fewer in-process XLA:CPU compiles
# means fewer rolls of a FLAKY LLVM-compile segfault observed under
# heavy concurrent load (faulthandler stack: backend_compile_and_load in
# test_window's vmap compile; same test passes standalone — load-
# correlated, not code-correlated)
try:
    from anticipated_vins_mono_tpu.utils.jaxenv import cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() == 8, jax.device_count()


def pytest_collection_modifyitems(config, items):
    """Hoist the suite's heaviest XLA compiles to the front.

    `test_window.py::test_vmap_scenario_batch` (the batched full-size
    solver — the largest single XLA:CPU program in the suite) SEGFAULTS
    inside LLVM's backend_compile_and_load when it runs at its natural
    position ~#156, after ~150 tests' worth of accumulated in-process
    compiles — and passes reliably when compiled in a fresh process
    (standalone runs, bench.py). Deterministic across runs, stack always
    in jax/_src/compiler.py:362. Running the big programs FIRST sidesteps
    the aged-compiler state; the bug is upstream (XLA:CPU), not in this
    repo's programs.
    """
    front = [it for it in items if "test_vmap_scenario_batch" in it.nodeid]
    rest = [it for it in items if "test_vmap_scenario_batch" not in it.nodeid]
    items[:] = front + rest
