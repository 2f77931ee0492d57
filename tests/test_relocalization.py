"""Relocalization-factor tests (fast-relocalization parity,
estimator.cpp:760-792 + setReloFrame :1095-1129)."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.utils.sequence import SequenceSimulator
from anticipated_vins_mono_tpu.utils.synthetic import analytic_trajectory

CFG = WindowConfig(window=6, max_feats=64, iters=10)


def test_relo_recovers_relative_pose():
    traj = analytic_trajectory(4.0)
    sim = SequenceSimulator(traj, seed=0, pixel_noise=0.3, max_features=50)
    est = VioEstimator(CFG, init_state={
        "p": traj.p[0], "q": traj.q[0], "v": traj.v[0]})
    frames = list(sim.frames(24))
    for fm in frames[:20]:
        est.process_frame(fm)
    assert est.initialized

    # fabricate a "loop keyframe": the GT pose 0.4 s ago, observed with the
    # current landmarks (project sim landmarks into that camera)
    k_old = 16 * sim.frame_stride
    p_old, q_old = traj.p[k_old], traj.q[k_old]
    R_old = np.asarray(lie.quat_to_rot(jnp.asarray(q_old)))
    matches = {}
    for fid, (pt, vel, prob) in frames[19].feats.items():
        slot = est.db._find(fid)
        if slot < 0 or est.db.solved[slot] == 0:
            continue
        # true landmark position: invert the sim's id mapping
        lm_idx = next(i for i, v in sim._id_of.items() if v == fid)
        P_w = sim.landmarks[lm_idx]
        P_c = R_old.T @ (P_w - p_old)
        if P_c[2] < 0.5:
            continue
        matches[fid] = P_c / P_c[2]
    assert len(matches) >= 10

    est.set_relo_frame(p_old, q_old, matches)
    est.process_frame(frames[20])
    assert est.relo_result is not None
    rel_t, rel_q = est.relo_result

    # oracle: GT relative transform old-frame → newest window frame
    t_new = est.frame_times[-1]
    k_new = int(round(t_new * 200))
    gt_rel_t = R_old.T @ (traj.p[k_new] - p_old)
    np.testing.assert_allclose(rel_t, gt_rel_t, atol=0.05)
    gt_rel_q = np.asarray(lie.quat_mul(lie.quat_conj(jnp.asarray(q_old)),
                                       jnp.asarray(traj.q[k_new])))
    dq = np.asarray(lie.quat_mul(lie.quat_conj(jnp.asarray(rel_q)),
                                 jnp.asarray(gt_rel_q)))
    assert 2 * np.abs(dq[1:]).max() < 0.05  # < ~3 deg

    # relo state is transient: cleared after the solve
    assert est.pending_relo is None
    # pipeline continues normally
    for fm in frames[21:]:
        est.process_frame(fm)
    assert est.diag.failures == 0
