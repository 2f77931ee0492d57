"""Multi-host initialization + mesh construction over pod slices.

The reference's only "distributed backend" is single-host ROS pub/sub
(SURVEY.md §2.6); this framework scales across hosts the TPU-native way:
`jax.distributed.initialize` + a global device mesh whose collectives ride
ICI within a slice and DCN across hosts. Scenario batches shard over the
`dp` axis (host-local where possible), feature shards over `fp` (intra-chip
group, psum over ICI).

On a single host this degrades to the local mesh used everywhere else.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). Returns True when a
    multi-process runtime was started, False for single-process runs."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1 or not coordinator:
        return False
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(fp: int = 1, dp: Optional[int] = None) -> Mesh:
    """Build the (dp, fp) mesh over ALL devices (across hosts).

    `fp` groups should stay within a host/ICI domain: devices are laid out
    host-major by jax.devices(), so taking fp contiguous devices keeps the
    psum traffic on ICI; dp spans hosts over DCN (pure batch parallelism —
    no per-step collectives).
    """
    devs = jax.devices()
    n = len(devs)
    assert n % fp == 0, (n, fp)
    dp = dp or n // fp
    assert dp * fp <= n
    arr = np.asarray(devs[: dp * fp]).reshape(dp, fp)
    return Mesh(arr, ("dp", "fp"))


def make_global_array(mesh: Mesh, spec, x):
    """Build a globally-sharded jax.Array from a host-replicated numpy value.

    Every process calls this with the SAME full array (the window problems
    are derived deterministically from shared seeds); each process donates
    only its addressable shards. This is the multi-host analog of
    `jax.device_put(x, NamedSharding(mesh, spec))`."""
    from jax.sharding import NamedSharding
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def shard_problem(mesh: Mesh, state, meas):
    """Shard a batched (state, meas) window problem onto `mesh` with the
    solver's canonical layout (parallel.sharded.solver_specs). Works on a
    single host AND across jax.distributed processes."""
    from anticipated_vins_mono_tpu.parallel.sharded import solver_specs
    ss, ms = solver_specs()
    put = lambda x, s: make_global_array(mesh, s, x)
    return (jax.tree_util.tree_map(put, state, ss),
            jax.tree_util.tree_map(put, meas, ms))


def scaling_report(solver, state, meas, reps: int = 5) -> dict:
    """Measure aggregate window-solves/s on the current mesh — the
    iterations/s scaling-efficiency probe of BASELINE.json."""
    import time
    out = solver(state, meas)
    jax.block_until_ready(out[0].p)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solver(state, meas)
    jax.block_until_ready(out[0].p)
    dt = (time.perf_counter() - t0) / reps
    B = state.p.shape[0]
    return {"batch": B, "seconds_per_step": dt, "solves_per_s": B / dt,
            "devices": jax.device_count(), "hosts": jax.process_count()}
