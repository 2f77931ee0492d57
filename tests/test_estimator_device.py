"""Device-resident VIO (models.estimator_device): the single-dispatch
steady-state step must reproduce the host-orchestrated `VioEstimator`
frame-for-frame, and the `lax.scan` streaming form must match the
step-by-step form."""

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import estimator_device as ed
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.utils.sequence import SequenceSimulator
from anticipated_vins_mono_tpu.utils.synthetic import analytic_trajectory

CFG = WindowConfig(window=10, max_feats=64, iters=8)


def _handoff(n_seconds=8.0, max_features=40, seed=0):
    traj = analytic_trajectory(n_seconds)
    sim = SequenceSimulator(traj, seed=seed, pixel_noise=0.3,
                            max_features=max_features)
    est = VioEstimator(CFG, init_state={
        "p": traj.p[0], "q": traj.q[0], "v": traj.v[0]})
    frames = list(sim.frames())
    i = 0
    while not (est.initialized and est.n_frames == CFG.nf - 1):
        est.process_frame(frames[i])
        i += 1
    return est, frames, i


def test_device_vio_matches_host():
    est, frames, i = _handoff()
    dst = ed.vio_init_from_host(est)
    pr = ed.DeviceVioParams(wcfg=CFG)
    n_check = 14
    # tolerance note: host and device run the SAME math in two SEPARATELY
    # jitted programs — XLA fuses them differently, so f64 reduction-order
    # noise (~1e-13/frame) enters and the LM accept/reject chaos amplifies
    # it to ~1e-5 over 14 frames. Semantic parity bugs measure 1e-2+ here
    # (the r4 aliasing corruption was 6.5e-2 on frame 1); 1e-4 cleanly
    # separates the two regimes. The DB plumbing below stays EXACT.
    for fm in frames[i:i + n_check]:
        est.process_frame(fm)
        args = ed.pack_frame(fm, CFG.max_feats)
        dst, out = ed.vio_step(pr, dst, *args)
        assert not bool(out["fail"])
        t, p_host, q_host, v_host = est.trajectory[-1]
        np.testing.assert_allclose(np.asarray(out["p"]), p_host,
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["v"]), v_host,
                                   rtol=0, atol=1e-4)
    # full window-state parity after n_check frames (slot NF-1 is
    # scratch — overwritten next frame — so compare 0..NF-2)
    nf1 = CFG.nf - 1
    np.testing.assert_allclose(np.asarray(dst.p[:nf1]), est.p[:nf1],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dst.ba[:nf1]), est.ba[:nf1],
                               rtol=0, atol=1e-3)
    # landmark DB parity: same live slots, same depths
    np.testing.assert_array_equal(np.asarray(dst.ids), est.db.ids)
    np.testing.assert_allclose(np.asarray(dst.mask), est.db.mask, atol=0)
    np.testing.assert_allclose(np.asarray(dst.inv_depth), est.db.inv_depth,
                               rtol=0, atol=1e-5)
    assert est.diag.failures == 0


def test_device_vio_scan_matches_step():
    est, frames, i = _handoff()
    dst = ed.vio_init_from_host(est)
    pr = ed.DeviceVioParams(wcfg=CFG)
    n = 8
    packed = [ed.pack_frame(fm, CFG.max_feats) for fm in frames[i:i + n]]
    stacked = tuple(jnp.stack([p[j] for p in packed]) for j in range(10))

    d1 = dst
    outs = []
    for p_ in packed:
        d1, o = ed.vio_step(pr, d1, *p_)
        outs.append(o)
    d2, so = ed.vio_scan(pr, dst, *stacked)
    np.testing.assert_allclose(np.asarray(d2.p), np.asarray(d1.p),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(so["p"]),
        np.stack([np.asarray(o["p"]) for o in outs]), rtol=0, atol=1e-8)
    np.testing.assert_array_equal(
        np.asarray(so["keyframe"]),
        np.array([bool(o["keyframe"]) for o in outs]))


def test_device_vio_nonkeyframe_branch():
    """Hover phase → low parallax → non-keyframe slides: exercises the
    margin-second-newest path (prior-only Schur drop + raw-IMU pair merge
    with the fuse-to-cap fallback) against the host."""
    from anticipated_vins_mono_tpu.ops import lie
    from anticipated_vins_mono_tpu.ops.factors import GRAVITY
    from anticipated_vins_mono_tpu.utils.synthetic import Trajectory

    tr = analytic_trajectory(9.0)
    k_stop = int(3.0 * 200)
    p, v, q = tr.p.copy(), tr.v.copy(), tr.q.copy()
    acc, gyr = tr.acc_body.copy(), tr.gyr_body.copy()
    p[k_stop:] = p[k_stop]
    v[k_stop:] = 0
    q[k_stop:] = q[k_stop]
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q[k_stop])))
    acc[k_stop:] = R.T @ np.array([0, 0, GRAVITY])
    gyr[k_stop:] = 0
    traj = Trajectory(tr.t, p, q, v, acc, gyr)
    sim = SequenceSimulator(traj, seed=0, pixel_noise=0.3, max_features=40)
    est = VioEstimator(CFG, init_state={"p": p[0], "q": q[0], "v": v[0]})
    frames = list(sim.frames())
    i = 0
    while not (est.initialized and est.n_frames == CFG.nf - 1):
        est.process_frame(frames[i])
        i += 1
    dst = ed.vio_init_from_host(est)
    pr = ed.DeviceVioParams(wcfg=CFG)
    kfs = []
    for fm in frames[i:i + 40]:
        est.process_frame(fm)
        dst, out = ed.vio_step(pr, dst, *ed.pack_frame(fm, CFG.max_feats))
        kfs.append(bool(out["keyframe"]))
        t, p_host, q_host, v_host = est.trajectory[-1]
        np.testing.assert_allclose(np.asarray(out["p"]), p_host,
                                   rtol=0, atol=1e-4)
    assert not all(kfs), "hover never produced a non-keyframe slide"
    assert est.diag.failures == 0


def test_device_vio_with_selector_budget():
    """On-device anticipation gate: the landmark working set must respect
    the κ̄ budget (tracked + newly selected ≤ κ̄ per frame) and the run
    must stay accurate."""
    from anticipated_vins_mono_tpu.models import anticipation as ant

    est, frames, i = _handoff(max_features=40)
    dst = ed.vio_init_from_host(est)
    pr = ed.DeviceVioParams(
        wcfg=CFG, sel_cfg=ant.SelectorConfig(max_features=12))
    prev_live = None
    for fm in frames[i:i + 10]:
        args = ed.pack_frame(fm, CFG.max_feats)
        # newly admitted features this frame vs the previous DB state
        ids_before = set(np.asarray(dst.ids)[np.asarray(dst.ids) >= 0])
        dst, out = ed.vio_step(pr, dst, *args)
        ids_after = set(np.asarray(dst.ids)[np.asarray(dst.ids) >= 0])
        admitted = ids_after - ids_before
        # the newest frame's observation count obeys the budget
        n_obs_new = int(np.asarray(
            dst.mask[:, CFG.nf - 2]).sum())  # after slide: newest at nf-2
        assert not bool(out["fail"])
        assert len(admitted) <= 12, admitted
    assert np.isfinite(float(out["cost"]))


def test_device_reboot_bounds_corruption():
    """Injected mid-run state corruption must trip the failure detector and
    the DEVICE-side clearState reboot (_device_reboot, estimator.cpp:612-658
    parity) must bound the damage: state stays finite, the trajectory
    restarts near the origin (clearState semantics), and the post-reboot
    velocity stays bounded (the prior holdoff + velocity damping suppress
    the tilt-gauge velocity ramp). Full metric re-initialization is the
    host init chain's job — the streaming harness re-runs it on the flag
    (device_vio_bench --corrupt-at), exactly as the reference's estimator
    thread re-runs initialStructure."""
    est, frames, i = _handoff(n_seconds=14.0)
    dst = ed.vio_init_from_host(est)
    pr = ed.DeviceVioParams(wcfg=CFG)

    # healthy run-in
    for fm in frames[i:i + 4]:
        dst, out = ed.vio_step(pr, dst, *ed.pack_frame(fm, CFG.max_feats))
        assert not bool(out["fail"])

    # corrupt the carry: +30 m/s velocity (the speed tripwire's regime)
    dst = dst._replace(v=dst.v + 30.0, p=dst.p + 50.0)

    fails, ps, speeds = [], [], []
    for fm in frames[i + 4:i + 30]:
        dst, out = ed.vio_step(pr, dst, *ed.pack_frame(fm, CFG.max_feats))
        fails.append(bool(out["fail"]))
        ps.append(np.asarray(out["p"]))
        speeds.append(float(out["speed"]))
    assert any(fails[:8]), "corruption never tripped the failure detector"
    k_fail = fails.index(True)
    ps = np.stack(ps)
    assert np.all(np.isfinite(ps))
    assert np.all(np.isfinite(np.asarray(dst.p)))
    # post-reboot trajectory restarts near the origin (clearState parity)
    assert np.linalg.norm(ps[k_fail + 1]) < 5.0, ps[k_fail + 1]
    # the velocity-damped holdoff suppresses the 30 m/s corruption: the
    # post-reboot speeds stay an order of magnitude below it
    assert max(speeds[k_fail + 1:]) < 12.0, max(speeds[k_fail + 1:])
