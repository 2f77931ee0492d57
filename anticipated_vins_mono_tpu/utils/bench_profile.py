"""Stage-level profile of the TPU solver bench + batch-1 streaming latency.

VERDICT round-2 item 4: the B=64 bench shows MFU 0.064% — name where the
time goes. The remote axon tunnel doesn't reliably serve xprof device
traces, so the decomposition is measured the robust way: each stage of the
LM iteration (linearize+normal-equations, Schur solve, robust cost) is
jitted and timed SEPARATELY on the same batched problem, alongside the full
fused solve, plus:

- per-stage share of the iteration,
- XLA-reported FLOPs and f32 MFU per stage,
- batch-1 (streaming, real-time) latency of a full 8-iteration solve — the
  number comparable to the reference's 30 ms Ceres budget
  (support_files/report/paper/results.tex:74-83),
- optionally a jax.profiler trace artifact if the backend supports it.

    python -m anticipated_vins_mono_tpu.utils.bench_profile \
        --out results/r3/bench_profile.json
"""

from __future__ import annotations

import json
import time

PEAK_F32 = 98e12  # v5e f32 peak FLOP/s; the MFU denominator used in
# round-2 results/bench_curve.json, kept for comparability


def _timeit(fn, args, reps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def _flops(fn, *args):
    import jax
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def main(B: int = 64, out: str | None = None, trace_dir: str | None = None):
    import jax
    from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from anticipated_vins_mono_tpu.ops.window import (
        WindowConfig, lm_solve, normal_equations_fast, robust_cost,
        schur_solve)
    from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

    cfg = WindowConfig(window=10, max_feats=128, iters=8)
    prob = make_window_problem(cfg, seed=0, perturb=0.3, pixel_noise=0.5,
                               dtype=jnp.float32)
    batch = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy()
    state = jtu.tree_map(batch, prob.init)
    meas = jtu.tree_map(batch, prob.meas)

    anchor = (prob.init.p[0], prob.init.q[0])
    anchor_b = (state.p[:, 0], state.q[:, 0])

    # stage jits (one LM iteration's pieces, batched like the bench)
    ne = jax.jit(jax.vmap(
        lambda s, m, a: normal_equations_fast(s, m, cfg, a)))
    cost = jax.jit(jax.vmap(lambda s, m, a: robust_cost(s, m, cfg, a)))

    def _schur(H, g, H_lp, h_ll, g_l):
        lam = jnp.asarray(1e-4, jnp.float32)
        return schur_solve(H, g, H_lp, h_ll, g_l, lam, cfg)

    sol = jax.jit(jax.vmap(_schur))
    full = jax.jit(jax.vmap(lambda s, m: lm_solve(s, m, cfg)))
    one = jax.jit(lambda s, m: lm_solve(s, m, cfg))

    HgH = ne(state, meas, anchor_b)
    rows = {}
    t_ne = _timeit(ne, (state, meas, anchor_b))
    t_cost = _timeit(cost, (state, meas, anchor_b))
    t_sol = _timeit(sol, HgH)
    t_full = _timeit(full, (state, meas))
    rows["normal_equations_ms"] = t_ne * 1e3
    rows["robust_cost_ms"] = t_cost * 1e3
    rows["schur_solve_ms"] = t_sol * 1e3
    rows["full_solve_ms"] = t_full * 1e3
    # one LM iteration ≈ ne + schur + cost (+retract, negligible)
    iter_ms = (t_ne + t_cost + t_sol) * 1e3
    rows["sum_stage_iter_ms"] = iter_ms
    rows["implied_8iter_ms"] = iter_ms * cfg.iters
    rows["stage_share"] = {
        "normal_equations": t_ne / (iter_ms / 1e3),
        "robust_cost": t_cost / (iter_ms / 1e3),
        "schur_solve": t_sol / (iter_ms / 1e3),
    }
    f_ne = _flops(lambda s, m, a: jax.vmap(
        lambda s_, m_, a_: normal_equations_fast(s_, m_, cfg, a_))(s, m, a),
        state, meas, anchor_b)
    f_full = _flops(lambda s, m: jax.vmap(
        lambda s_, m_: lm_solve(s_, m_, cfg))(s, m), state, meas)
    rows["flops_ne"] = f_ne
    rows["flops_full"] = f_full
    rows["mfu_ne"] = f_ne / max(t_ne, 1e-12) / PEAK_F32
    rows["mfu_full"] = f_full / max(t_full, 1e-12) / PEAK_F32

    # batch-1 streaming latency (the real-time number): full 8-iter solve,
    # measured pipelined (block only at the end) so the WAN-tunnel dispatch
    # overhead amortizes as it does in a real streaming loop. The null-op
    # floor is recorded so the device-compute share is explicit: the
    # remote axon dispatch costs ~0.7 ms/call even for x+1.
    s1 = jtu.tree_map(lambda x: x[0], state)
    m1 = jtu.tree_map(lambda x: x[0], meas)
    t_one = min(_timeit(one, (s1, m1), reps=50) for _ in range(3))
    null = jax.jit(lambda x: x + 1.0)
    t_null = min(_timeit(null, (jnp.ones(8, jnp.float32),), reps=50)
                 for _ in range(3))
    rows["batch1_solve_ms"] = t_one * 1e3
    rows["null_dispatch_ms"] = t_null * 1e3
    rows["batch1_device_ms"] = (t_one - t_null) * 1e3
    rows["reference_budget_ms"] = 30.0

    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                jax.block_until_ready(full(state, meas))
            rows["trace_dir"] = trace_dir
        except Exception as e:  # remote backends may not support tracing
            rows["trace_error"] = str(e)[:200]

    rows["B"] = B
    rows["backend"] = jax.default_backend()
    print(json.dumps(rows, indent=1))
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--trace-dir", default=None)
    a = ap.parse_args()
    main(a.batch, a.out, a.trace_dir)
