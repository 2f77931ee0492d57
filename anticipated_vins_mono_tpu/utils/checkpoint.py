"""Checkpoint / resume — full estimator + pose-graph state serialization.

The reference only checkpoints the pose graph (savePoseGraph/loadPoseGraph,
/root/reference/pose_graph/src/pose_graph.cpp:697-752+, keyframe poses +
loop info + BRIEF descriptors, triggered from the keyboard `command`
thread); the VIO window itself is never checkpointed (SURVEY.md §5).

This module goes further, per the rebuild plan: the whole estimator —
window states, biases, extrinsics, marginalization prior (J0/r0/lin),
landmark DB, raw IMU pair buffers — and the pose graph serialize to one
compressed npz, enabling batch-mode resume mid-sequence.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_estimator(path: str, est) -> None:
    """Serialize a VioEstimator to `<path>` (npz)."""
    db = est.db
    pr = est.prior
    blobs = {
        "p": est.p, "q": est.q, "v": est.v, "ba": est.ba, "bg": est.bg,
        "tic": est.tic, "qic": est.qic, "td": np.float64(est.td),
        "n_frames": np.int64(est.n_frames),
        "initialized": np.int64(est.initialized),
        "frame_times": np.asarray(est.frame_times, float),
        # feature DB
        "db_ids": db.ids, "db_pts": db.pts, "db_vel": db.vel,
        "db_prob": db.prob, "db_mask": db.mask,
        "db_inv_depth": db.inv_depth, "db_solved": db.solved,
        # marginalization prior
        "prior_J0": np.asarray(pr.J0), "prior_r0": np.asarray(pr.r0),
        "prior_weight": np.asarray(pr.weight),
        "prior_lin_p": np.asarray(pr.lin.p), "prior_lin_q": np.asarray(pr.lin.q),
        "prior_lin_v": np.asarray(pr.lin.v), "prior_lin_ba": np.asarray(pr.lin.ba),
        "prior_lin_bg": np.asarray(pr.lin.bg),
        "prior_lin_tic": np.asarray(pr.lin.tic),
        "prior_lin_qic": np.asarray(pr.lin.qic),
        "prior_lin_td": np.asarray(pr.lin.td),
        "prior_lin_invd": np.asarray(pr.lin.inv_depth),
        "n_imu_pairs": np.int64(len(est.imu_pairs)),
    }
    for i, pair in enumerate(est.imu_pairs):
        for key in ("dts", "acc", "gyr", "acc0", "gyr0"):
            blobs[f"imu{i}_{key}"] = pair[key]
    np.savez_compressed(path, **blobs)


def load_estimator(path: str, est) -> None:
    """Restore a VioEstimator in place (must be constructed with the same
    WindowConfig)."""
    z = np.load(path)
    est.p = z["p"].copy()
    est.q = z["q"].copy()
    est.v = z["v"].copy()
    est.ba = z["ba"].copy()
    est.bg = z["bg"].copy()
    est.tic = z["tic"].copy()
    est.qic = z["qic"].copy()
    est.td = float(z["td"])
    est.n_frames = int(z["n_frames"])
    est.initialized = bool(z["initialized"])
    est.frame_times = list(z["frame_times"])
    db = est.db
    db.ids = z["db_ids"].copy()
    db.pts = z["db_pts"].copy()
    db.vel = z["db_vel"].copy()
    db.prob = z["db_prob"].copy()
    db.mask = z["db_mask"].copy()
    db.inv_depth = z["db_inv_depth"].copy()
    db.solved = z["db_solved"].copy()
    from anticipated_vins_mono_tpu.ops.window import PriorFactor, WindowState
    d = est.dtype
    est.prior = PriorFactor(
        J0=jnp.asarray(z["prior_J0"], d), r0=jnp.asarray(z["prior_r0"], d),
        lin=WindowState(
            p=jnp.asarray(z["prior_lin_p"], d),
            q=jnp.asarray(z["prior_lin_q"], d),
            v=jnp.asarray(z["prior_lin_v"], d),
            ba=jnp.asarray(z["prior_lin_ba"], d),
            bg=jnp.asarray(z["prior_lin_bg"], d),
            tic=jnp.asarray(z["prior_lin_tic"], d),
            qic=jnp.asarray(z["prior_lin_qic"], d),
            td=jnp.asarray(z["prior_lin_td"], d),
            inv_depth=jnp.asarray(z["prior_lin_invd"], d)),
        weight=jnp.asarray(z["prior_weight"], d))
    est.imu_pairs = []
    for i in range(int(z["n_imu_pairs"])):
        est.imu_pairs.append({
            key: z[f"imu{i}_{key}"].copy()
            for key in ("dts", "acc", "gyr", "acc0", "gyr0")})


def save_posegraph(path: str, graph) -> None:
    """savePoseGraph parity (pose_graph.cpp:697+): keyframe poses, loop
    edges, descriptors."""
    np.savez_compressed(
        path, n=np.int64(graph.n), pos=graph.pos, yaw=graph.yaw,
        pitch_roll=graph.pitch_roll, gdesc=graph.gdesc,
        seq_id=graph.seq_id, cur_sequence=np.int64(graph.cur_sequence),
        seq_i=graph.seq_i, seq_j=graph.seq_j, seq_t=graph.seq_t,
        seq_yaw=graph.seq_yaw, seq_valid=graph.seq_valid,
        n_seq=np.int64(graph.n_seq),
        loop_i=graph.loop_i, loop_j=graph.loop_j, loop_t=graph.loop_t,
        loop_yaw=graph.loop_yaw, loop_valid=graph.loop_valid,
        n_loops=np.int64(graph.n_loops),
        t_drift=graph.t_drift, yaw_drift=np.float64(graph.yaw_drift))


def load_posegraph(path: str, graph) -> None:
    z = np.load(path)
    graph.n = int(z["n"])
    # adopt the saved capacity (pose-graph storage grows dynamically)
    graph.cfg = graph.cfg._replace(max_kf=len(z["pos"]),
                                   max_loops=len(z["loop_i"]))
    if "seq_id" in z:
        graph.seq_id = z["seq_id"].copy()
        graph.cur_sequence = int(z["cur_sequence"])
    else:
        graph.seq_id = np.zeros(len(z["pos"]), np.int32)
        graph.cur_sequence = 0
    graph.pos = z["pos"].copy()
    graph.yaw = z["yaw"].copy()
    graph.pitch_roll = z["pitch_roll"].copy()
    graph.gdesc = z["gdesc"].copy()
    graph.seq_i = z["seq_i"].copy()
    graph.seq_j = z["seq_j"].copy()
    graph.seq_t = z["seq_t"].copy()
    graph.seq_yaw = z["seq_yaw"].copy()
    graph.seq_valid = z["seq_valid"].copy()
    graph.n_seq = int(z["n_seq"])
    graph.loop_i = z["loop_i"].copy()
    graph.loop_j = z["loop_j"].copy()
    graph.loop_t = z["loop_t"].copy()
    graph.loop_yaw = z["loop_yaw"].copy()
    graph.loop_valid = z["loop_valid"].copy()
    graph.n_loops = int(z["n_loops"])
    graph.t_drift = z["t_drift"].copy()
    graph.yaw_drift = float(z["yaw_drift"])
