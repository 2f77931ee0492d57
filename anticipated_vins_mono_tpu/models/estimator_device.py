"""Device-resident sliding-window VIO (L4): the ENTIRE steady-state
per-frame estimator step as ONE jitted program — IMU propagation → feature
DB update (slot bookkeeping) → keyframe decision → triangulation → window
LM solve → outlier demotion → marginalization → window slide.

Capability parity with the reference's processImage steady state
(/root/reference/vins_estimator/src/estimator.cpp:104-205 + 817-1081 and
feature_manager.cpp:45-139/275-353), and with this repo's host-orchestrated
`models/estimator.VioEstimator` (which remains the full-featured path:
initialization chain, extrinsic calibration, relocalization input). On
failure this module performs a DEVICE-SIDE clearState reboot
(`_device_reboot`): the fused loop stays finite and IMU-odometric through
corruption (prior holdoff + velocity damping suppress the post-reboot
tilt-gauge ramp); the flag is returned so a supervisor can trigger the
full host init chain for metric re-initialization (the reference's
re-run of initialStructure) — see device_vio_bench --corrupt-at.

Why a second estimator loop next to `VioEstimator`: the host version
dispatches the solver + triangulation per frame but keeps the feature
manager, IMU-buffer surgery, and slide logic in numpy — per-frame host
round-trips that the WAN-tunneled TPU of this environment turns into
~25 ms each (measured `null_rtt_ms`, results/r4/tracker_tpu_v3.json). The
TPU-native fix is the same one `models/tracker_device` applied to the
front end: hold EVERYTHING (window states, landmark slots, raw-IMU pair
buffers, the marginalization prior) on device as fixed-size arrays, and
make the per-frame step a single `jit` — one dispatch per frame, zero
under `lax.scan`. List surgery becomes masked rolls; dict insertion
becomes one-hot id matching + cumsum-ranked slot filling; the
keyframe branch (marginalize-oldest vs second-newest) becomes `lax.cond`
between two already-jittable marginalization programs.

Composed with `models/tracker_device`, the full camera-to-trajectory VIO
loop runs as one device program per frame (`utils/streaming_bench`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import anticipation as ant
from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops import marginalization as mg
from anticipated_vins_mono_tpu.ops.preintegration import ImuNoise, preintegrate
from anticipated_vins_mono_tpu.ops.triangulation import triangulate
from anticipated_vins_mono_tpu.ops.window import (
    PriorFactor, WindowConfig, WindowMeasurements, WindowState, lm_solve)

MAX_IMU_PER_PAIR = 64   # static pad, = estimator.MAX_IMU_PER_PAIR
MIN_PARALLAX = 10.0 / 460.0


class DeviceVioParams(NamedTuple):
    """Static (hashable) configuration of the device VIO step."""
    wcfg: WindowConfig = WindowConfig()
    noise: ImuNoise = ImuNoise()
    # anticipation/attention selection ON DEVICE (the fork's core,
    # f_selector->select() placement, estimator_node.cpp:340): None = no
    # budget (all tracker features enter the DB). With a SelectorConfig,
    # each step runs the full horizon->Omega->Delta->greedy pipeline
    # (feature_selector._device_select) on the tracker's candidates with
    # the dynamic kappa_bar - tracked budget, and only tracked+selected
    # features are inserted.
    sel_cfg: "ant.SelectorConfig" = None
    sel_n_imu: int = 20             # horizon IMU substeps (frame_dt*rate)
    sel_dt_imu: float = 0.005
    min_parallax: float = MIN_PARALLAX
    demote_px: float = 5.0          # estimator.demote_px
    demote_focal: float = 460.0
    max_speed_fail: float = 10.0    # estimator.max_speed_fail [m/s]
    zupt: bool = True
    zupt_weight: float = 30.0
    zupt_gyr_thresh: float = 0.05
    zupt_gyr_mean_thresh: float = 0.03
    zupt_acc_thresh: float = 1.0
    # on the fail flag, perform the device-side clearState reboot
    # (_device_reboot) instead of freezing — the host parity path keeps its
    # own reboot (estimator.reset); False restores flag-only behavior
    reboot_on_fail: bool = True
    # weight of the post-reboot velocity-damping rows (see _measurements)
    recovery_vel_weight: float = 1.5
    # junk-slot eviction in _db_add_frame (FeatureDB._alloc parity)
    slot_evict: bool = True


class DeviceVioState(NamedTuple):
    """Fixed-size device-resident estimator state.

    Window arrays are [NF,*]; landmark slots [F,*]; raw-IMU pair buffers
    [W, S] with dt==0 padding (pair i connects frames i → i+1)."""
    p: jax.Array          # [NF,3]
    q: jax.Array          # [NF,4]
    v: jax.Array          # [NF,3]
    ba: jax.Array         # [NF,3]
    bg: jax.Array         # [NF,3]
    tic: jax.Array        # [3]
    qic: jax.Array        # [4]
    td: jax.Array         # []
    # feature DB (models/feature_db.FeatureDB as device arrays)
    ids: jax.Array        # [F] i32, -1 = free
    pts: jax.Array        # [F,NF,3]
    vel: jax.Array        # [F,NF,2]
    prob: jax.Array       # [F]
    mask: jax.Array       # [F,NF]
    inv_depth: jax.Array  # [F]
    solved: jax.Array     # [F]
    # raw IMU per adjacent pair
    imu_dts: jax.Array    # [W,S]
    imu_acc: jax.Array    # [W,S,3]
    imu_gyr: jax.Array    # [W,S,3]
    imu_a0: jax.Array     # [W,3]
    imu_g0: jax.Array     # [W,3]
    stationary: jax.Array  # [NF]
    td_at_frame: jax.Array  # [NF]
    prior: PriorFactor
    speed_hist: jax.Array  # [8] rolling ‖v[newest]‖ (tripwire)
    n_solves: jax.Array    # [] i32
    # id watermark (trackedFeatures_ semantics, feature_selector.cpp:
    # 103-110): ids ≤ watermark that are not in the DB were rejected by a
    # past selection round and stay dropped
    last_id: jax.Array     # [] i32
    # frames since the last device reboot (clearState). While < NF the
    # marginalization prior is held at weight 0 (post-reboot holdoff): the
    # reboot's attitude comes from ONE raw accel sample (g2R), and building
    # a prior before vision refills would LOCK IN the gravity misalignment
    # (measured: 0.5 m/s² residual acceleration, speed ramping 2.5→10 m/s).
    # The reference avoids this by re-running the full init chain.
    since_fail: jax.Array  # [] i32


def vio_init_from_host(est) -> DeviceVioState:
    """Snapshot a (window-full, initialized) host `VioEstimator` into the
    device state — the hand-off point after the host-side initialization
    chain (estimator.cpp:151-179: INITIAL → NON_LINEAR)."""
    import numpy as np
    cfg = est.cfg
    W, S = cfg.window, MAX_IMU_PER_PAIR
    d = est.dtype
    db = est.db
    dts = np.zeros((W, S))
    acc = np.zeros((W, S, 3))
    gyr = np.zeros((W, S, 3))
    a0 = np.zeros((W, 3))
    g0 = np.zeros((W, 3))
    for i, pair in enumerate(est.imu_pairs[:W]):
        n = min(len(pair["dts"]), S)
        dts[i, :n] = pair["dts"][:n]
        acc[i, :n] = pair["acc"][:n]
        gyr[i, :n] = pair["gyr"][:n]
        a0[i] = pair["acc0"]
        g0[i] = pair["gyr0"]
    # jnp.array (copy=True), NOT jnp.asarray: on the CPU backend
    # jnp.asarray is ZERO-COPY for aligned f64 numpy arrays, so the device
    # state would alias the host estimator's buffers — which VioEstimator
    # mutates IN PLACE every subsequent process_frame (FeatureDB's slides
    # are in-place shifts). A retained alias silently corrupts the device
    # state (measured: vel tracks shifted twice per slide in the parity
    # tests) and leaves jax buffers pointing into numpy memory.
    j = lambda x: jnp.array(x, dtype=d)
    return DeviceVioState(
        p=j(est.p), q=j(est.q), v=j(est.v), ba=j(est.ba), bg=j(est.bg),
        tic=j(est.tic), qic=j(est.qic), td=j(est.td),
        ids=jnp.array(db.ids, dtype=jnp.int32), pts=j(db.pts), vel=j(db.vel),
        prob=j(db.prob), mask=j(db.mask), inv_depth=j(db.inv_depth),
        solved=j(db.solved),
        imu_dts=j(dts), imu_acc=j(acc), imu_gyr=j(gyr),
        imu_a0=j(a0), imu_g0=j(g0),
        stationary=j(est.stationary), td_at_frame=j(est.td_at_frame),
        prior=est.prior,
        speed_hist=jnp.zeros(8, d),
        n_solves=jnp.zeros((), jnp.int32),
        last_id=jnp.asarray(
            max(int(db.ids.max()),
                getattr(est.selector, "last_feature_id", -1)),
            jnp.int32),
        since_fail=jnp.asarray(10_000, jnp.int32))


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def _propagate(p, q, v, ba, bg, dts, accs, gyrs, acc0, gyr0):
    """Midpoint IMU propagation over a dt-padded buffer (estimator._propagate
    / estimator_node.cpp:44-80 predict())."""
    def step(carry, x):
        p_, q_, v_, a_prev, w_prev = carry
        dt, a, w = x
        m = dt > 0
        un_w = 0.5 * (w_prev + w) - bg
        q_new = lie.quat_normalize(
            lie.quat_mul(q_, lie.exp_so3_quat(un_w * dt)))
        g = jnp.array([0.0, 0.0, -9.81007], p_.dtype)
        un_a = 0.5 * (lie.quat_rotate(q_, a_prev - ba)
                      + lie.quat_rotate(q_new, a - ba)) + g
        p_new = p_ + v_ * dt + 0.5 * un_a * dt * dt
        v_new = v_ + un_a * dt
        sel = lambda x_, y_: jnp.where(m, x_, y_)
        return (sel(p_new, p_), sel(q_new, q_), sel(v_new, v_),
                sel(a, a_prev), sel(w, w_prev)), None

    (p, q, v, _, _), _ = jax.lax.scan(
        step, (p, q, v, acc0, gyr0), (dts, accs, gyrs))
    return p, q, v


def _zupt_flag(pr: DeviceVioParams, dts, accs, gyrs, bg_prev):
    """Stationarity detection from the raw pair buffer (estimator ZUPT)."""
    valid = (dts > 0)[:, None]
    n = jnp.maximum(jnp.sum(valid), 1.0)
    g_mean = jnp.sum(gyrs * valid, 0) / n
    a_mean = jnp.sum(accs * valid, 0) / n
    g_fluct = jnp.max(jnp.where(valid, jnp.abs(gyrs - g_mean), 0.0))
    a_fluct = jnp.max(jnp.where(valid, jnp.abs(accs - a_mean), 0.0))
    g_norm = jnp.linalg.norm(g_mean - bg_prev)
    flag = ((g_fluct < pr.zupt_gyr_thresh)
            & (g_norm < pr.zupt_gyr_mean_thresh)
            & (a_fluct < pr.zupt_acc_thresh)
            & (jnp.sum(valid) > 0))
    return flag.astype(dts.dtype)


def _db_add_frame(st: DeviceVioState, k: int, in_ids, in_pts, in_vel,
                  in_prob, in_active, min_parallax, slot_evict: bool = True):
    """Observation insertion + keyframe decision
    (feature_manager.cpp:45-139 addFeatureCheckParallax) as masked array
    ops: id matching is a one-hot [F,N] equality; free-slot allocation is
    cumsum ranking (the tracker_device top-up trick)."""
    F = st.ids.shape[0]
    dtype = st.pts.dtype
    occupied = st.ids >= 0
    eq = (st.ids[:, None] == in_ids[None, :]) & in_active[None, :] \
        & occupied[:, None]                                  # [F,N]
    matched_slot = jnp.any(eq, axis=1)                       # [F]
    match_idx = jnp.argmax(eq, axis=1)                       # [F]
    matched_in = jnp.any(eq, axis=0)                         # [N]
    tracked = jnp.sum(matched_slot)

    is_new = in_active & ~matched_in
    rank_new = jnp.cumsum(is_new) - 1                        # [N]
    free = ~occupied
    # junk eviction (FeatureDB._alloc parity): when free slots run out,
    # occupied slots with no observation in the previous frame and <2
    # total observations are fair game — dead 1-obs tracks can never
    # become factors and otherwise stall allocation for ~NF slides after
    # a tracker dropout frame. Allocation order = all free slots (by
    # index), then junk slots (by index) — the host's loop order.
    junk = occupied & (st.mask[:, k - 1] <= 0) \
        & (jnp.sum(st.mask, axis=1) < 2)
    if not slot_evict:
        junk = jnp.zeros_like(junk)
    avail = free | junk
    F_ = st.ids.shape[0]
    arange_f = jnp.arange(F_)
    key = jnp.where(avail,
                    jnp.where(free, arange_f, F_ + arange_f),
                    2 * F_ + arange_f)
    order = jnp.argsort(key)
    rank_avail = jnp.zeros(F_, jnp.int32).at[order].set(
        jnp.arange(F_, dtype=jnp.int32))
    fill = avail[:, None] & is_new[None, :] \
        & (rank_avail[:, None] == rank_new[None, :])         # [F,N]
    fills = jnp.any(fill, axis=1)
    fill_idx = jnp.argmax(fill, axis=1)

    take = matched_slot | fills
    src = jnp.where(matched_slot, match_idx, fill_idx)
    # fresh slots: clear history, reset depth (FeatureDB._alloc)
    clr = fills[:, None]
    pts = jnp.where(clr, 0.0, st.pts.reshape(F, -1)).reshape(st.pts.shape)
    vel = jnp.where(clr, 0.0, st.vel.reshape(F, -1)).reshape(st.vel.shape)
    mask = jnp.where(clr, 0.0, st.mask)
    inv_depth = jnp.where(fills, 1.0, st.inv_depth)
    solved = jnp.where(fills, 0.0, st.solved)
    ids = jnp.where(fills, in_ids[fill_idx], st.ids)

    obs_p = in_pts[src]                                      # [F,3]
    obs_v = in_vel[src]
    obs_pr = in_prob[src]
    pts = pts.at[:, k].set(jnp.where(take[:, None], obs_p, pts[:, k]))
    vel = vel.at[:, k].set(jnp.where(take[:, None], obs_v, vel[:, k]))
    mask = mask.at[:, k].set(jnp.where(take, 1.0, mask[:, k]))
    prob = jnp.where(take, obs_pr, st.prob)
    # anchor-velocity backfill (FeatureDB.add_frame parity): a feature's
    # first observation carries the tracker's 0-velocity sentinel, and that
    # observation is the td factor's anchor — copy the now-known velocity
    # back one frame so the anchor-side td·vel correction exists
    prev_first = matched_slot & (mask[:, k - 1] > 0) \
        & ~jnp.any(vel[:, k - 1] != 0.0, axis=-1)
    vel = vel.at[:, k - 1].set(
        jnp.where(prev_first[:, None], obs_v, vel[:, k - 1]))

    # keyframe: parallax between frames k-2 and k-1 (_mean_parallax)
    both = (mask[:, k - 2] > 0) & (mask[:, k - 1] > 0)
    d2 = pts[:, k - 2, :2] - pts[:, k - 1, :2]
    dist = jnp.linalg.norm(d2, axis=-1)
    par = jnp.sum(jnp.where(both, dist, 0.0)) \
        / jnp.maximum(jnp.sum(both), 1.0)
    keyframe = (tracked < 20) | (par >= min_parallax)

    st = st._replace(ids=ids, pts=pts, vel=vel, mask=mask, prob=prob,
                     inv_depth=inv_depth, solved=solved)
    return st, keyframe, tracked.astype(dtype)


def _feat_valid(st: DeviceVioState):
    return ((st.ids >= 0) & (jnp.sum(st.mask, 1) >= 2)).astype(st.pts.dtype)


def _anchor(st: DeviceVioState):
    return jnp.argmax(st.mask > 0, axis=1).astype(jnp.int32)


def _window_state(st: DeviceVioState, cfg: WindowConfig) -> WindowState:
    return WindowState(p=st.p, q=st.q, v=st.v, ba=st.ba, bg=st.bg,
                       tic=st.tic, qic=st.qic, td=st.td,
                       inv_depth=st.inv_depth)


def _measurements(st: DeviceVioState, pr: DeviceVioParams, feat_valid):
    cfg = pr.wcfg
    W = cfg.window
    pre = jax.vmap(
        lambda dt, a, g, a0, g0, ba, bg: preintegrate(
            dt, a, g, a0, g0, ba, bg, pr.noise))(
        st.imu_dts, st.imu_acc, st.imu_gyr, st.imu_a0, st.imu_g0,
        st.ba[:W], st.bg[:W])
    zupt_w = None
    if pr.zupt or pr.reboot_on_fail:
        zupt_w = st.stationary * pr.zupt_weight if pr.zupt \
            else jnp.zeros(cfg.nf, st.pts.dtype)
        if pr.reboot_on_fail:
            # post-reboot velocity damping: a weak pull of every window
            # velocity toward 0 while the prior is held off. Without an
            # absolute velocity reference, a global attitude tilt is an
            # exact gauge mode that lets ‖v‖ ramp at g·sin(tilt) with ZERO
            # residual everywhere; σ≈0.7 m/s damping rows select the
            # minimum-velocity member of that family, which re-couples the
            # tilt to the IMU residuals and lets the solver observe it.
            recov = (st.since_fail < 2 * cfg.nf).astype(st.pts.dtype)
            zupt_w = zupt_w + recov * pr.recovery_vel_weight
    # roll/pitch anchor: pinned in normal operation (matches the host and
    # feeds absolute attitude into the first prior); FREED during the
    # post-reboot recovery window so the one-sample g2R attitude error
    # stays correctable (see window._anchor_rows pin_rp note)
    pin_rp = None
    if pr.reboot_on_fail:
        pin_rp = (st.since_fail >= 2 * cfg.nf).astype(st.pts.dtype)
    return WindowMeasurements(
        pre=pre, pre_valid=jnp.ones(W, st.pts.dtype),
        pts=st.pts, vel=st.vel, mask=st.mask, anchor=_anchor(st),
        feat_valid=feat_valid, prior=st.prior,
        anchor_pin_rp=pin_rp,
        zupt_w=zupt_w,
        td_obs=st.td_at_frame if cfg.estimate_td else None)


def _demote_outliers(st: DeviceVioState, pr: DeviceVioParams):
    """Vectorized estimator._reject_outliers: demote (solved=0, depth reset)
    landmarks whose depth collapsed or whose mean reprojection error exceeds
    demote_px — never delete (removeFailures semantics, history preserved)."""
    cfg = pr.wcfg
    dtype = st.pts.dtype
    R = lie.quat_to_rot(st.q)                                 # [NF,3,3]
    Ric = lie.quat_to_rot(st.qic)
    a = _anchor(st)
    valid = (_feat_valid(st) * st.solved) > 0
    pt_a = jnp.take_along_axis(st.pts, a[:, None, None], axis=1)[:, 0]
    ptc = pt_a / jnp.maximum(st.inv_depth, 1e-6)[:, None]
    pw = jnp.einsum("fij,fj->fi", R[a], ptc @ Ric.T + st.tic) \
        + st.p[a]                                             # [F,3]
    rel = pw[:, None, :] - st.p[None, :, :]                   # [F,NF,3]
    pc = jnp.einsum("ij,fnj->fni", Ric.T,
                    jnp.einsum("nji,fnj->fni", R, rel) - st.tic)
    proj = pc[..., :2] / jnp.maximum(pc[..., 2:], 1e-9)
    err = jnp.linalg.norm(proj - st.pts[..., :2], axis=-1) \
        * pr.demote_focal
    err = jnp.where(pc[..., 2] < 1e-3, 100.0, err)
    use = (st.mask > 0) & (jnp.arange(st.mask.shape[1])[None, :] != a[:, None])
    n = jnp.sum(use, 1)
    mean_err = jnp.sum(jnp.where(use, err, 0.0), 1) / jnp.maximum(n, 1)
    demote = valid & (
        (st.inv_depth <= cfg.min_inv_depth * 1.001)
        | ((n >= 1) & (mean_err > pr.demote_px)))
    return st._replace(
        solved=jnp.where(demote, 0.0, st.solved),
        inv_depth=jnp.where(demote, jnp.asarray(0.2, dtype), st.inv_depth))


def _shift_left(arr, k: int):
    """arr[k:-1] = arr[k+1:] along axis 0 — the host's `_shift_state`
    semantics exactly: the last row keeps its old value (it is overwritten
    by the next frame's propagation before any read)."""
    return jnp.concatenate([arr[:k], arr[k + 1:], arr[-1:]], axis=0)


def _merge_pair_buffers(dts_a, acc_a, gyr_a, dts_b, acc_b, gyr_b):
    """Concatenate two padded pair buffers; if the result exceeds the static
    cap, fuse adjacent samples pairwise (dt-summed, dt-weighted means) —
    device form of estimator._merge_imu_pairs + _fuse_to_cap."""
    S = dts_a.shape[0]
    na = jnp.sum(dts_a > 0)
    idx = jnp.arange(S)
    d2 = jnp.zeros(2 * S, dts_a.dtype).at[idx].add(dts_a)
    d2 = d2.at[na + idx].add(dts_b)
    a2 = jnp.zeros((2 * S, 3), acc_a.dtype).at[idx].add(acc_a)
    a2 = a2.at[na + idx].add(acc_b)
    g2 = jnp.zeros((2 * S, 3), gyr_a.dtype).at[idx].add(gyr_a)
    g2 = g2.at[na + idx].add(gyr_b)
    total = na + jnp.sum(dts_b > 0)

    def fuse(_):
        dp = d2.reshape(S, 2)
        w = dp / jnp.maximum(jnp.sum(dp, 1, keepdims=True), 1e-12)
        return (jnp.sum(dp, 1),
                jnp.sum(a2.reshape(S, 2, 3) * w[..., None], 1),
                jnp.sum(g2.reshape(S, 2, 3) * w[..., None], 1))

    def trunc(_):
        return d2[:S], a2[:S], g2[:S]

    return jax.lax.cond(total > S, fuse, trunc, None)


def _slide_oldest_db(st: DeviceVioState, cfg: WindowConfig):
    """Device feature_db.slide_oldest: re-anchor frame-0 depths, shift
    tracks left, gc dead slots (removeBackShiftDepth,
    feature_manager.cpp:275-313)."""
    dtype = st.pts.dtype
    R0 = lie.quat_to_rot(st.q[0])
    R1 = lie.quat_to_rot(st.q[1])
    Ric = lie.quat_to_rot(st.qic)
    anchored0 = (st.ids >= 0) & (st.mask[:, 0] > 0)
    keep = anchored0 & (jnp.sum(st.mask[:, 1:], 1) >= 1)
    pt = st.pts[:, 0] / jnp.maximum(st.inv_depth, 1e-6)[:, None]
    pw = (pt @ Ric.T + st.tic) @ R0.T + st.p[0]
    pc = ((pw - st.p[1]) @ R1 - st.tic) @ Ric
    ok = pc[:, 2] > 0.1
    re_d = jnp.where(ok, 1.0 / jnp.maximum(pc[:, 2], 1e-6), 0.2)
    upd = keep & (st.solved > 0)
    inv_depth = jnp.where(upd, re_d, st.inv_depth)
    solved = jnp.where(upd & ~ok, 0.0, st.solved)

    pts = jnp.concatenate([st.pts[:, 1:], jnp.zeros_like(st.pts[:, :1])], 1)
    vel = jnp.concatenate([st.vel[:, 1:], jnp.zeros_like(st.vel[:, :1])], 1)
    mask = jnp.concatenate([st.mask[:, 1:],
                            jnp.zeros_like(st.mask[:, :1])], 1)
    dead = (st.ids >= 0) & (jnp.sum(mask, 1) < 1)
    return st._replace(
        ids=jnp.where(dead, -1, st.ids), pts=pts, vel=vel, mask=mask,
        inv_depth=inv_depth,
        solved=jnp.where(dead, 0.0, solved))


def _slide_second_newest_db(st: DeviceVioState, cfg: WindowConfig):
    """Device feature_db.slide_second_newest (removeFront, :333-353)."""
    k = cfg.nf - 2
    pts = st.pts.at[:, k].set(st.pts[:, k + 1]).at[:, k + 1].set(0.0)
    vel = st.vel.at[:, k].set(st.vel[:, k + 1]).at[:, k + 1].set(0.0)
    mask = st.mask.at[:, k].set(st.mask[:, k + 1]).at[:, k + 1].set(0.0)
    dead = (st.ids >= 0) & (jnp.sum(mask, 1) < 1)
    return st._replace(
        ids=jnp.where(dead, -1, st.ids), pts=pts, vel=vel, mask=mask,
        solved=jnp.where(dead, 0.0, st.solved))


def _select_stage(pr: DeviceVioParams, st: DeviceVioState, k: int,
                  in_ids, in_pts, in_vel, in_prob, in_active,
                  imu_dts, imu_acc, imu_gyr):
    """On-device anticipation gate (AttentionSelector.select semantics):
    features already in the DB pass through (tracked subset, :111-120);
    candidates are active features with id above the watermark; selection
    runs the horizon/Ω/Δ/greedy pipeline with the dynamic κ̄−tracked
    budget. Returns (gated in_active, new watermark)."""
    from anticipated_vins_mono_tpu.models.feature_selector import \
        _device_select
    scfg = pr.sel_cfg
    dtype = st.pts.dtype
    occupied = st.ids >= 0
    eq = (st.ids[:, None] == in_ids[None, :]) & in_active[None, :] \
        & occupied[:, None]                                   # [F,N]
    matched_in = jnp.any(eq, axis=0)                          # [N]
    slot_matched = jnp.any(eq, axis=1)                        # [F]
    slot_in = jnp.argmax(eq, axis=1)                          # [F]
    tracked_n = jnp.sum(slot_matched)
    budget = jnp.clip(scfg.max_features - tracked_n,
                      0, scfg.max_features)

    is_new = in_active & ~matched_in & (in_ids > st.last_id)
    # latest IMU sample of the incoming batch (setNextStateFromImu
    # propagation hand-off, feature_selector.h:64-68)
    n = jnp.sum(imu_dts > 0).astype(jnp.int32)
    last = jnp.clip(n - 1, 0, imu_dts.shape[0] - 1)
    acc_l = imu_acc[last]
    gyr_l = imu_gyr[last]

    F = st.ids.shape[0]
    a = _anchor(st)
    lm_mask = (occupied & (st.solved > 0)).astype(dtype)
    lm_uv = jnp.take_along_axis(st.pts, a[:, None, None],
                                axis=1)[:, 0, :2]
    lm_depth = 1.0 / jnp.maximum(st.inv_depth, 1e-3)
    used_pts = in_pts[slot_in]                                # [F,3]
    used_depths = jnp.where(st.solved > 0, lm_depth, 5.0)
    used_valid = slot_matched.astype(dtype)

    sel, _, _, _ = _device_select(
        scfg, scfg.max_features, pr.sel_n_imu, pr.sel_dt_imu,
        st.p[k], st.q[k], st.v[k], acc_l, gyr_l,
        st.ba[k], st.bg[k], st.tic, st.qic,
        in_pts, in_prob, is_new.astype(dtype),
        used_pts, used_depths, used_valid,
        lm_uv, lm_depth, lm_mask, budget=budget)
    gated = in_active & (matched_in | (sel > 0.5))
    new_last = jnp.maximum(
        st.last_id,
        jnp.max(jnp.where(in_active, in_ids, jnp.int32(-1))))
    return gated, new_last


def _device_reboot(pr: DeviceVioParams, st: DeviceVioState,
                   acc0) -> DeviceVioState:
    """Device-side failure reboot — clearState semantics
    (estimator.cpp:612-658 failureDetection → clearState + re-init,
    :186-194) as pure state surgery, so the fused loop survives corruption
    WITHOUT a host babysitter:

    - window poses → gravity-aligned identity (g2R on the latest raw
      accelerometer, estimator.cpp:416-426), v = 0, biases = 0
    - landmark DB cleared, marginalization prior cleared
    - raw IMU pair buffers KEPT (they are measurements, not state)

    Post-reboot choreography (since_fail): the marginalization prior is
    held at weight 0 and weak velocity-damping rows are added for 2·NF
    frames (see _measurements) — without an absolute velocity reference a
    global attitude tilt is an exact zero-residual gauge mode whose ‖v‖
    ramps at g·sin(tilt). The damped window stays finite and IMU-
    odometric; METRIC re-initialization (gravity + scale + velocity) is
    the init chain's job and is triggered host-side off the fail flag,
    exactly as the reference re-runs initialStructure
    (estimator.cpp:186-194)."""
    cfg = pr.wcfg
    dtype = st.p.dtype
    nf = cfg.nf
    R0 = lie.gravity_to_rot(acc0.astype(dtype))
    q0 = lie.rot_to_quat(R0.T)
    return st._replace(
        p=jnp.zeros_like(st.p),
        q=jnp.broadcast_to(q0, (nf, 4)).astype(dtype),
        v=jnp.zeros_like(st.v),
        ba=jnp.zeros_like(st.ba),
        bg=jnp.zeros_like(st.bg),
        ids=jnp.full_like(st.ids, -1),
        pts=jnp.zeros_like(st.pts),
        vel=jnp.zeros_like(st.vel),
        mask=jnp.zeros_like(st.mask),
        inv_depth=jnp.ones_like(st.inv_depth),
        solved=jnp.zeros_like(st.solved),
        prior=PriorFactor.empty(cfg, dtype),
        speed_hist=jnp.zeros_like(st.speed_hist),
        stationary=jnp.zeros_like(st.stationary),
        since_fail=jnp.zeros_like(st.since_fail))


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pr",))
def vio_step(pr: DeviceVioParams, st: DeviceVioState,
             in_ids, in_pts, in_vel, in_prob, in_active,
             imu_dts, imu_acc, imu_gyr, acc0, gyr0):
    """One steady-state VIO frame (window full, initialized), all on device.

    Inputs are the device tracker's fixed-size measurement arrays
    ([N] ids/prob/active, [N,3] rays, [N,2] velocities — the
    [id,u,v,vx,vy,prob] contract) plus the dt-padded raw IMU batch since
    the previous frame. Returns (state', out) with out = dict of the
    newest solved pose/velocity, solver diagnostics, keyframe flag, and
    the failure flag. On failure (pr.reboot_on_fail, default): the step
    performs the clearState reboot ON DEVICE (_device_reboot — parity
    with estimator.cpp:612-658) and the output trajectory restarts
    gravity-aligned at the origin; the flag marks the discontinuity and
    tells the supervisor to re-run the host init chain (the reference's
    re-initialization, estimator.cpp:186-194).
    """
    cfg = pr.wcfg
    nf = cfg.nf
    W = cfg.window
    dtype = st.p.dtype
    k = nf - 1

    # -- IMU propagation into the new frame slot
    p_k, q_k, v_k = _propagate(
        st.p[k - 1], st.q[k - 1], st.v[k - 1], st.ba[k - 1], st.bg[k - 1],
        imu_dts, imu_acc, imu_gyr, acc0, gyr0)
    st = st._replace(
        p=st.p.at[k].set(p_k), q=st.q.at[k].set(q_k),
        v=st.v.at[k].set(v_k),
        ba=st.ba.at[k].set(st.ba[k - 1]),
        bg=st.bg.at[k].set(st.bg[k - 1]),
        imu_dts=st.imu_dts.at[W - 1].set(imu_dts),
        imu_acc=st.imu_acc.at[W - 1].set(imu_acc),
        imu_gyr=st.imu_gyr.at[W - 1].set(imu_gyr),
        imu_a0=st.imu_a0.at[W - 1].set(acc0),
        imu_g0=st.imu_g0.at[W - 1].set(gyr0),
        stationary=st.stationary.at[k].set(
            _zupt_flag(pr, imu_dts, imu_acc, imu_gyr, st.bg[k - 1])
            if pr.zupt else 0.0),
        # 0, not st.td: no stream re-stamping here -> absolute td
        # correction (see estimator.process_frame's cur_td note)
        td_at_frame=st.td_at_frame.at[k].set(0.0))

    # -- anticipation/attention gate (optional, pr.sel_cfg)
    if pr.sel_cfg is not None:
        in_active, new_last = _select_stage(
            pr, st, k, in_ids, in_pts, in_vel, in_prob, in_active,
            imu_dts, imu_acc, imu_gyr)
        st = st._replace(last_id=new_last)

    # -- feature DB insert + keyframe decision
    st, keyframe, tracked = _db_add_frame(
        st, k, in_ids, in_pts, in_vel, in_prob, in_active, pr.min_parallax,
        slot_evict=pr.slot_evict)

    # -- triangulate fresh landmarks
    fv = _feat_valid(st)
    wstate = _window_state(st, cfg)
    inv_d, good = triangulate(wstate, st.pts, st.mask, _anchor(st), cfg)
    fresh = (st.solved < 0.5) & (fv > 0)
    st = st._replace(
        inv_depth=jnp.where(fresh, inv_d, st.inv_depth),
        solved=jnp.where(fresh, good, st.solved))

    # -- window solve (only solved landmarks participate)
    wstate = _window_state(st, cfg)
    meas = _measurements(st, pr, fv * st.solved)
    new_state, sdiag = lm_solve(wstate, meas, cfg)

    # -- failure statistics (estimator._failure; flag only — see docstring)
    speed = jnp.linalg.norm(new_state.v[k])
    speed_hist = jnp.concatenate([st.speed_hist[1:], speed[None]])
    dp = new_state.p[k] - st.p[k]
    fail = (jnp.linalg.norm(new_state.ba[k]) > 2.5) \
        | (jnp.linalg.norm(new_state.bg[k]) > 1.0) \
        | (jnp.linalg.norm(dp) > 5.0) | (jnp.abs(dp[2]) > 1.0) \
        | ~jnp.all(jnp.isfinite(new_state.p)) \
        | (jnp.median(speed_hist) > pr.max_speed_fail)

    # -- adopt + demote outliers (healthy) OR device reboot (fail):
    #    clearState semantics entirely on device — see _device_reboot
    def healthy_adopt(st_):
        st_ = st_._replace(p=new_state.p, q=new_state.q, v=new_state.v,
                           ba=new_state.ba, bg=new_state.bg,
                           td=new_state.td,
                           tic=new_state.tic, qic=new_state.qic,
                           inv_depth=new_state.inv_depth,
                           speed_hist=speed_hist,
                           n_solves=st_.n_solves + 1)
        st_ = _demote_outliers(st_, pr)
        st_ = jax.lax.cond(keyframe, margin_old, margin_second, st_)
        if not pr.reboot_on_fail:
            return st_
        # post-reboot prior holdoff (see DeviceVioState.since_fail): keep
        # the freshly-built prior at weight 0 until vision has refilled a
        # full window, so the one-sample g2R attitude is never locked in.
        # Everything under this flag is STATICALLY absent when
        # reboot_on_fail=False — the parity tests compare that
        # bit-identical program against the host (any graph change, even a
        # value-preserving one, perturbs XLA reduction order enough to
        # flip LM accept/reject at the 1e-13 level and drift ~1e-6 over a
        # few frames).
        st_ = st_._replace(since_fail=jnp.minimum(st_.since_fail + 1,
                                                  10_000))
        ok = (st_.since_fail >= 2 * nf).astype(dtype)
        return st_._replace(
            prior=st_.prior._replace(weight=st_.prior.weight * ok))

    def reboot(st_):
        st_ = _device_reboot(pr, st_, acc0)
        return st_._replace(n_solves=st_.n_solves + 1)

    # -- marginalize + slide (lax.cond over the keyframe decision,
    #    estimator.cpp:817-990 + slideWindow :996-1081)
    def margin_old(st_):
        wst = _window_state(st_, cfg)
        meas_m = _measurements(st_, pr, _feat_valid(st_))
        prior = mg.marginalize_oldest(wst, meas_m, cfg)
        st_ = _slide_oldest_db(st_, cfg)
        st_ = st_._replace(
            p=_shift_left(st_.p, 0), q=_shift_left(st_.q, 0),
            v=_shift_left(st_.v, 0), ba=_shift_left(st_.ba, 0),
            bg=_shift_left(st_.bg, 0),
            stationary=_shift_left(st_.stationary, 0),
            td_at_frame=_shift_left(st_.td_at_frame, 0),
            imu_dts=_shift_left(st_.imu_dts, 0),
            imu_acc=_shift_left(st_.imu_acc, 0),
            imu_gyr=_shift_left(st_.imu_gyr, 0),
            imu_a0=_shift_left(st_.imu_a0, 0),
            imu_g0=_shift_left(st_.imu_g0, 0),
            prior=prior)
        return st_

    def margin_second(st_):
        wst = _window_state(st_, cfg)
        prior = mg.marginalize_second_newest(wst, st_.prior, cfg)
        st_ = _slide_second_newest_db(st_, cfg)
        fidx = nf - 2
        md, ma, mg_ = _merge_pair_buffers(
            st_.imu_dts[W - 2], st_.imu_acc[W - 2], st_.imu_gyr[W - 2],
            st_.imu_dts[W - 1], st_.imu_acc[W - 1], st_.imu_gyr[W - 1])
        imu_dts = st_.imu_dts.at[W - 2].set(md).at[W - 1].set(0.0)
        imu_acc = st_.imu_acc.at[W - 2].set(ma).at[W - 1].set(0.0)
        imu_gyr = st_.imu_gyr.at[W - 2].set(mg_).at[W - 1].set(0.0)
        st_ = st_._replace(
            p=_shift_left(st_.p, fidx), q=_shift_left(st_.q, fidx),
            v=_shift_left(st_.v, fidx), ba=_shift_left(st_.ba, fidx),
            bg=_shift_left(st_.bg, fidx),
            stationary=_shift_left(st_.stationary, fidx),
            td_at_frame=_shift_left(st_.td_at_frame, fidx),
            imu_dts=imu_dts, imu_acc=imu_acc, imu_gyr=imu_gyr,
            prior=prior)
        return st_

    if pr.reboot_on_fail:
        # where-blend, NOT lax.cond: a cond restructures the healthy
        # path's XLA program enough to perturb LM accept/reject rounding
        # (measured: 2.6e-6 host-parity drift). The reboot branch is a
        # handful of zeros + one g2R — computing it unconditionally is
        # free, and the healthy program keeps its exact original fusion.
        st_h = healthy_adopt(st)
        st_r = reboot(st)
        st = jax.tree_util.tree_map(
            lambda r, h: jnp.where(fail, r, h), st_r, st_h)
    else:
        st = healthy_adopt(st)

    out = {
        "t_slot": nf - 2,
        "p": st.p[nf - 2], "q": st.q[nf - 2], "v": st.v[nf - 2],
        "cost": sdiag["cost"], "cost0": sdiag["cost0"],
        "imu_chi2": sdiag["imu_chi2"],
        "keyframe": keyframe, "fail": fail, "speed": speed,
        "tracked": tracked,
        "n_live": jnp.sum(st.ids >= 0),
        "n_solved": jnp.sum(st.solved > 0),
    }
    return st, out


@functools.partial(jax.jit, static_argnames=("pr",))
def vio_scan(pr: DeviceVioParams, st: DeviceVioState,
             in_ids, in_pts, in_vel, in_prob, in_active,
             imu_dts, imu_acc, imu_gyr, acc0, gyr0):
    """Streaming VIO over stacked frames — `lax.scan`, ZERO per-frame
    dispatches. All inputs carry a leading [T] frame axis."""
    def body(s, x):
        return vio_step(pr, s, *x)
    return jax.lax.scan(
        body, st, (in_ids, in_pts, in_vel, in_prob, in_active,
                   imu_dts, imu_acc, imu_gyr, acc0, gyr0))


def pack_frame(fm, n_slots: int, dtype=jnp.float64):
    """Host helper: a `FrameMeasurement` (dict-form features) → the fixed
    arrays `vio_step` consumes. For the all-device path the tracker's
    arrays are used directly (tracker_device.tracker_step outputs)."""
    import numpy as np
    ids = np.full(n_slots, -1, np.int32)
    pts = np.zeros((n_slots, 3))
    vel = np.zeros((n_slots, 2))
    prob = np.ones(n_slots)
    act = np.zeros(n_slots, bool)
    # insertion order preserved — the host's FeatureDB.add_frame allocates
    # free slots in dict-iteration order, and slot-assignment parity
    # requires the same order here
    for j, (fid, (pt, vl, pb)) in enumerate(fm.feats.items()):
        if j >= n_slots:
            break
        ids[j] = fid
        pts[j] = pt
        vel[j] = vl
        prob[j] = pb
        act[j] = True
    S = MAX_IMU_PER_PAIR
    dts = np.zeros(S)
    acc = np.zeros((S, 3))
    gyr = np.zeros((S, 3))
    n = min(len(fm.imu_dts), S)
    dts[:n] = fm.imu_dts[:n]
    acc[:n] = fm.imu_acc[:n]
    gyr[:n] = fm.imu_gyr[:n]
    j = lambda x: jnp.asarray(x, dtype)
    return (jnp.asarray(ids), j(pts), j(vel), j(prob), jnp.asarray(act),
            j(dts), j(acc), j(gyr), j(fm.acc0), j(fm.gyr0))
