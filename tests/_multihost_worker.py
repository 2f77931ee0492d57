"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Each process owns 4 virtual CPU devices; together they form the 8-device
global mesh. Exercises initialize_multihost + cross-process collectives on
the dp-sharded / fp-sharded window solver — the multi-host story that real
TPU pods use (jax.distributed + DCN collectives), runnable without TPUs.

Usage: python _multihost_worker.py <process_id> <coordinator_port> <fp_mode>
  fp_mode "local": fp pairs within a process (the ICI-aligned layout that
                   parallel.distributed.global_mesh produces);
  fp_mode "cross": fp pairs spanning the two processes — every psum in the
                   solver's normal-equation reduction crosses the process
                   boundary (the DCN stress case).
Prints "WORKER_OK <max|p_err| vs single-device>" on success.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.tree_util as jtu  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid, port, fp_mode = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from anticipated_vins_mono_tpu.parallel.distributed import (
        initialize_multihost, shard_problem)
    started = initialize_multihost(coordinator=f"127.0.0.1:{port}",
                                   num_processes=2, process_id=pid)
    assert started
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from jax.sharding import Mesh
    from anticipated_vins_mono_tpu.ops.window import WindowConfig, lm_solve
    from anticipated_vins_mono_tpu.parallel.sharded import sharded_lm_solve
    from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

    cfg = WindowConfig(window=4, max_feats=32, iters=6)
    # identical problem data on both processes (shared seed)
    prob = make_window_problem(cfg, seed=0, perturb=0.3, pixel_noise=0.5)

    devs = np.asarray(jax.devices())
    if fp_mode == "cross":
        # rows (0,4),(1,5),... — every fp psum crosses the process boundary
        arr = devs.reshape(2, 4).T
    else:
        arr = devs.reshape(4, 2)
    mesh = Mesh(arr, ("dp", "fp"))

    B = mesh.shape["dp"]
    batch = lambda x: np.broadcast_to(np.asarray(x)[None],
                                      (B,) + np.shape(x)).copy()
    state_b = jtu.tree_map(batch, prob.init)
    meas_b = jtu.tree_map(batch, prob.meas)
    gstate, gmeas = shard_problem(mesh, state_b, meas_b)

    solver = sharded_lm_solve(cfg, mesh)
    out_st, diag = solver(gstate, gmeas)

    # local single-device reference (plain jit on this process's device 0)
    ref_st, ref_diag = lm_solve(prob.init, prob.meas, cfg)
    ref_p = np.asarray(ref_st.p)

    # every addressable dp shard solved the same problem → must match the
    # single-device answer up to reassociation
    err = 0.0
    for shard in out_st.p.addressable_shards:
        local = np.asarray(shard.data)          # [B_local, NF, 3]
        for b in range(local.shape[0]):
            err = max(err, float(np.abs(local[b] - ref_p).max()))
    assert err < 1e-6, err
    for shard in diag["cost"].addressable_shards:
        c = np.asarray(shard.data)
        assert np.all(c <= float(ref_diag["cost0"]))
    print(f"WORKER_OK {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
