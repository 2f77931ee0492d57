"""Multi-device scaling-efficiency measurement (VERDICT item 7).

BASELINE.json claims >=70% 2-host scaling efficiency for the dp-sharded
solver; real multi-chip hardware is not available in this environment, so
the claim is probed the honest way we can: weak scaling of
`parallel.sharded.sharded_lm_solve` over 1/2/4/8 virtual CPU devices
(xla_force_host_platform_device_count), fixed per-device batch, aggregate
solves/s via `parallel.distributed.scaling_report`. dp sharding carries no
cross-device collectives in the solve itself (scenario-parallel — the
psum'd axis is fp), so the measured efficiency loss is runtime dispatch +
host-core contention, the same terms a 2-host DCN run pays on top of its
interconnect.

Caveat printed with the result: virtual devices share this host's cores, so
the curve is a lower bound once dp exceeds the physical core count.
"""

from __future__ import annotations

import json


def main(per_device_batch: int = 8, reps: int = 10, out: str | None = None):
    from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
    force_cpu_f64(devices=8)
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from anticipated_vins_mono_tpu.ops.window import WindowConfig
    from anticipated_vins_mono_tpu.parallel.distributed import scaling_report
    from anticipated_vins_mono_tpu.parallel.sharded import (
        make_mesh, sharded_lm_solve)
    from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

    cfg = WindowConfig(window=10, max_feats=128, iters=8)
    prob = make_window_problem(cfg, seed=0, perturb=0.3, pixel_noise=0.5)

    rows = []
    n_phys = None
    try:
        import os
        n_phys = os.cpu_count()
    except Exception:
        pass
    for dp in (1, 2, 4, 8):
        B = per_device_batch * dp
        batch = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
        state = jtu.tree_map(batch, prob.init)
        meas = jtu.tree_map(batch, prob.meas)
        mesh = make_mesh(dp, 1)
        solver = sharded_lm_solve(cfg, mesh)
        rep = scaling_report(solver, state, meas, reps=reps)
        rep["dp"] = dp
        rows.append(rep)
        print(json.dumps(rep), flush=True)

    base = rows[0]["solves_per_s"]
    for r in rows:
        r["efficiency"] = r["solves_per_s"] / (base * r["dp"])
    result = {"per_device_batch": per_device_batch,
              "physical_cores": n_phys,
              "rows": rows,
              "efficiency_dp2": rows[1]["efficiency"],
              "efficiency_dp8": rows[-1]["efficiency"]}
    print(json.dumps(result))
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    main(a.per_device_batch, a.reps, a.out)
