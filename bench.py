"""Benchmark: sliding-window BA iterations/s per chip vs single-core Ceres.

Baseline (BASELINE.md): the reference's windowed optimization takes 30 ms
for a ≤8-iteration DOGLEG+DENSE_SCHUR solve on EuRoC MH_05 (thread 2,
Ceres num_threads unset, EIGEN_DONT_PARALLELIZE) → 8/0.030 ≈ 266.7 LM
iterations/s on one CPU core.

This bench times the SAME workload shape — 10-keyframe window, 128 landmark
slots, IMU+projection factors, Schur landmark elimination, 8 LM iterations
per solve — as one jitted program on one TPU chip (f32), and reports
aggregate iterations/s with a scenario batch (the TPU-native scaling axis).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

# persistent compilation cache: the remote-tunnel TPU compile of the solver
# takes minutes; cache it across processes (machine-keyed — a shared
# literal dir poisons runs across VM types, see jaxenv.cache_dir)
try:
    from anticipated_vins_mono_tpu.utils.jaxenv import cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
import jax.numpy as jnp
import jax.tree_util as jtu

CERES_BASELINE_ITERS_PER_S = 8 / 0.030


def main():
    from anticipated_vins_mono_tpu.ops.window import WindowConfig, lm_solve
    from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

    # fast_chol: blocked batched Cholesky + matmul substitutions
    # (ops/blocked_chol.py) replacing XLA's row-serial triangular kernels —
    # measured 1.28x end-to-end on this workload (results/r3)
    cfg = WindowConfig(window=10, max_feats=128, iters=8, fast_chol=True)
    prob = make_window_problem(cfg._replace(fast_chol=False), seed=0,
                               perturb=0.3, pixel_noise=0.5,
                               dtype=jnp.float32)

    B = 64  # scenario batch per chip — the measured throughput knee of the
    # batch-scaling curve (results/bench_curve.json: 11.6k iters/s at B=64
    # vs 9.6k at B=16; beyond B=64 HBM residency pushes it back down)
    batch = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy()
    state = jtu.tree_map(batch, prob.init)
    meas = jtu.tree_map(batch, prob.meas)

    solve = jax.jit(jax.vmap(lambda s, m: lm_solve(s, m, cfg)))
    out = solve(state, meas)         # compile
    jax.block_until_ready(out)

    # timed region: pipelined batched solves (cached executable). Dispatch
    # all reps then sync the FULL output tree once: device executions
    # serialize, so total/reps ≈ device time per solve, amortizing the
    # host↔device (tunnel) round-trip that a per-rep sync would add to
    # every solve. Keep every rep's outputs alive and sync them ALL — a
    # partial sync (one leaf of the last rep) has been observed to return
    # before the queue drains on the remote backend (100× false speedup).
    reps = 10
    outs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        outs.append(solve(state, meas))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps

    iters_per_s = B * cfg.iters / dt
    print(json.dumps({
        "metric": "sliding-window BA LM iterations/s per chip "
                  "(10-kf window, 128 landmarks, batch 64, f32)",
        "value": round(iters_per_s, 1),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / CERES_BASELINE_ITERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
