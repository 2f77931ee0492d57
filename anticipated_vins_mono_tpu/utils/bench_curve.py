"""Batch-scaling curve + MFU estimate for the window solver on one chip.

VERDICT item 5: the headline iters/s number at B=16 says little about how
well the solver maps to the MXU. This sweep measures aggregate LM
iterations/s across scenario-batch sizes (the TPU-native scaling axis,
SURVEY.md §5 'scaling comes from batching') and estimates MFU from XLA's
own per-executable FLOP count (jit(...).compile().cost_analysis()).

Writes results/bench_curve.json and prints one JSON line per batch size.
"""

from __future__ import annotations

import json
import os
import time

import jax

try:
    from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
    enable_compile_cache()
except Exception:
    pass

import jax.numpy as jnp
import jax.tree_util as jtu

CERES_BASELINE_ITERS_PER_S = 8 / 0.030
# TPU v5e peak: 197 TFLOP/s bf16, ~98 TFLOP/s f32 (public spec). The solver
# runs f32, so MFU is reported against the f32 peak.
PEAK_F32_FLOPS = 98e12


def run_curve(batch_sizes=(16, 64, 128, 256, 512), reps: int = 10,
              out_path: str = "results/bench_curve.json"):
    from anticipated_vins_mono_tpu.ops.window import WindowConfig, lm_solve
    from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

    # fast_chol: blocked Cholesky + matmul substitutions (1.28x, round 3)
    cfg = WindowConfig(window=10, max_feats=128, iters=8, fast_chol=True)
    prob = make_window_problem(cfg, seed=0, perturb=0.3, pixel_noise=0.5,
                               dtype=jnp.float32)
    rows = []
    for B in batch_sizes:
        batch = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy()
        state = jtu.tree_map(batch, prob.init)
        meas = jtu.tree_map(batch, prob.meas)
        solve = jax.jit(jax.vmap(lambda s, m: lm_solve(s, m, cfg)))
        t0 = time.perf_counter()
        lowered = solve.lower(state, meas)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        try:
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops = float("nan")
        out = compiled(state, meas)
        jax.block_until_ready(out)
        # pipelined dispatch, ONE full-tree sync at the end (see bench.py:
        # a partial sync on one leaf has been observed to return before the
        # remote queue drains — 100× false speedup)
        outs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            outs.append(compiled(state, meas))
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps
        iters_per_s = B * cfg.iters / dt
        row = {
            "B": B,
            "iters_per_s": round(iters_per_s, 1),
            "vs_ceres": round(iters_per_s / CERES_BASELINE_ITERS_PER_S, 2),
            "ms_per_batched_solve": round(dt * 1e3, 2),
            "xla_flops_per_solve": flops,
            "mfu_f32": round(flops / dt / PEAK_F32_FLOPS, 5)
            if flops == flops else None,
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    import sys
    bs = [int(x) for x in sys.argv[1:]] or None
    run_curve(tuple(bs) if bs else (16, 64, 128, 256, 512))
