"""Backend steering for host-side tools.

The environment's axon sitecustomize force-registers a remote-TPU PJRT
backend in every Python process (see tests/conftest.py). Benchmark / grid
runners that want deterministic f64 CPU replay must therefore steer JAX
explicitly BEFORE any device is touched — an env-var prefix on the command
line is not enough.
"""

from __future__ import annotations

import os
from contextlib import nullcontext


def cache_dir() -> str:
    """Per-machine persistent-compile-cache directory.

    A shared literal path ("/tmp/jax_cache") poisons runs when entries were
    AOT-compiled on a host with different CPU features: XLA:CPU loads them
    anyway, warning "could lead to execution errors such as SIGILL" — and
    FMA/codegen differences make results non-reproducible run to run.
    Key the directory by the host's platform fingerprint so every machine
    type gets its own cache."""
    import hashlib
    import platform
    fp = "-".join([platform.machine(), platform.processor() or "cpu"])
    # hash model name + family/model/stepping + flags (first core): the
    # flags line alone collided across VM types in practice — XLA:CPU then
    # loaded foreign AOT entries and produced NON-DETERMINISTIC numerics
    # (observed: identical runs disagreeing at 1e-1 in the parity probe)
    sig = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("model name", "cpu family", "model", "stepping",
                           "flags"):
                    sig.append(line.strip())
                if key == "flags":
                    break
    except OSError:
        pass
    if sig:
        fp += hashlib.sha1("\n".join(sig).encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_{fp}"


def enable_compile_cache():
    """Turn on the persistent compile cache (machine-keyed, see cache_dir)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def host_device():
    """The host CPU device, or None if the CPU platform isn't registered."""
    import jax
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def on_host():
    """Context manager placing tiny host-side JAX ops on the CPU backend.

    The estimator's bookkeeping math (quaternion conversions, one-time
    initialization SfM) is a handful of scalar-sized ops per frame. When the
    default backend is an accelerator — worse, a REMOTE one like the axon
    TPU tunnel where each dispatch is a network round-trip and x64 f64
    emulation is unreliable — that bookkeeping belongs on the host; only the
    statically-shaped batched kernels (preintegration, LM solve,
    marginalization, triangulation, selector logdet) should ride the chip.
    No-op when the default backend is already CPU."""
    import jax
    if jax.default_backend() == "cpu":
        return nullcontext()
    d = host_device()
    return jax.default_device(d) if d is not None else nullcontext()


def pin_to_cpu(idx: int) -> None:
    """Pin this process to one physical core (disjoint per grid worker):
    the reliable way to stop N jax-CPU workers × nproc Eigen threads from
    thrashing a small host ~10×."""
    try:
        n = os.cpu_count() or 1
        os.sched_setaffinity(0, {idx % n})
    except (AttributeError, OSError):
        pass


def force_cpu_f64(devices: int | None = None,
                  threads: int | None = None) -> None:
    """Force the CPU backend + f64 for this process. Must be called before
    JAX initializes a backend (asserts if too late). `devices` optionally
    sets a virtual host-device count (sharding tests); `threads` caps XLA's
    intra-op Eigen pool (ESSENTIAL for multi-process grid runs — N workers
    each spawning nproc threads thrash the machine ~10×)."""
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if devices is not None and \
            "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={devices}"
    if threads is not None:
        if threads <= 1:
            flags += " --xla_cpu_multi_thread_eigen=false"
        os.environ["OMP_NUM_THREADS"] = str(threads)
        os.environ["OPENBLAS_NUM_THREADS"] = str(threads)
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        # persistent compile cache: grid cells share solver shapes — without
        # this every subprocess pays the full ~minutes compile again
        jax.config.update("jax_compilation_cache_dir", cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except RuntimeError:
        pass  # backend already up — the assert below is the real check
    if threads is not None:
        try:
            jax.config.update("jax_cpu_intra_op_parallelism_threads", threads)
        except Exception:
            pass
    assert jax.default_backend() == "cpu", (
        "CPU steering came too late — a backend was already initialized: "
        + jax.default_backend())
