"""Reproduce the explore-regime PGO path explosion offline from the
committed artifact (results/r5/loop_explore_d120.json): rebuild the graph
keyframe-by-keyframe with the original edge interleaving and watch the
optimized path error evolve."""
import json

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64(threads=2)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from anticipated_vins_mono_tpu.models import posegraph as pg  # noqa: E402
from anticipated_vins_mono_tpu.ops import lie  # noqa: E402

d = json.load(open("results/r5/loop_explore_d120.json"))
kf = d["keyframes_vio"]
edges = d["edges"]

# the artifact stores yaw_err (vs GT), not yaw_meas — reconstruct via the
# reproducible analytic GT (same generator params as the bench run)
from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory
traj = loop_trajectory(d["duration_s"], laps=d["laps"], radius=12.0,
                       wiggle=0.3)
t_kf = np.array([row["t"] for row in kf])
ks = np.clip(np.round(t_kf * 200.0).astype(int), 0, len(traj.t) - 1)
R_all = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q[ks])))
gt_yaw = np.array([np.asarray(lie.rot_to_ypr(jnp.asarray(R)))[0]
                   for R in R_all])
for e in edges:
    dyaw_gt = (gt_yaw[e["j"]] - gt_yaw[e["i"]] + 180.0) % 360.0 - 180.0
    e["yaw_meas"] = ((e["yaw_err_deg"] + dyaw_gt + 180.0) % 360.0) - 180.0

by_j = {}
for e in edges:
    by_j.setdefault(e["j"], []).append(e)

graph = pg.PoseGraph(pg.PGOConfig())
for k, row in enumerate(kf):
    ypr = np.array(row["ypr"])
    R = np.asarray(lie.ypr_to_rot(jnp.asarray(ypr)))
    q = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
    graph.add_keyframe(np.array(row["p"]), q, t=row["t"])
    if graph.cur_sequence > 0 and k and graph.seq_id[k - 1] == 0 \
            and graph.seq_id[k] == 1:
        print(f"new sequence at k={k} t={row['t']}")
    for e in by_j.get(k, []):
        graph.add_loop_edge(e["i"], e["j"], np.array(e["t_meas"]),
                            e["yaw_meas"], weight=e.get("weight", 1.0))
    if by_j.get(k):
        n_before = graph.n_loops
        graph.optimize()
        err = np.abs(graph.pos[:graph.n] - graph.vio_pos[:graph.n])
        print(f"k={k} loops={graph.n_loops} "
              f"max|pos-vio|={err.max():.3f} "
              f"drift_t={np.round(graph.t_drift,3)} "
              f"yaw_drift={graph.yaw_drift:.2f}")
print("done: n", graph.n, "loops", graph.n_loops)

# final path ATE vs analytic GT (the bench's ate_loop_path)
from anticipated_vins_mono_tpu.utils.metrics import ate_rmse
ate_path = ate_rmse(t_kf[:graph.n], graph.pos[:graph.n], traj.t, traj.p)
print("final ate_path:", ate_path, " (bench reported",
      d["ate_loop_path"], ")")
