"""Synthetic VIO scenario generation — ground truth + measurements.

Role: the oracle data source for solver tests and benchmarks, replacing the
reference's dataset-replay testing (SURVEY.md §4) with a controllable
generator: an analytic smooth trajectory, simulated 200 Hz IMU (specific
force + body rates, optional noise/bias), and landmark observations with
FOV masks — packed directly into the static-shape `WindowMeasurements`.

Also used to fabricate EuRoC-like windows from real ground-truth state CSVs
(utils.euroc loads those; same packing path).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie, factors
from anticipated_vins_mono_tpu.ops.preintegration import ImuNoise, preintegrate
from anticipated_vins_mono_tpu.ops.window import (
    PriorFactor, WindowConfig, WindowMeasurements, WindowState)

G_W = np.array([0.0, 0.0, -factors.GRAVITY])  # world gravity acceleration


class Trajectory(NamedTuple):
    """Dense ground-truth trajectory sampled at IMU rate."""

    t: np.ndarray      # [N]
    p: np.ndarray      # [N,3]
    q: np.ndarray      # [N,4] wxyz
    v: np.ndarray      # [N,3]
    acc_body: np.ndarray  # [N,3] accelerometer (specific force)
    gyr_body: np.ndarray  # [N,3] gyro


def analytic_trajectory(duration: float, imu_rate: float = 200.0,
                        scale: float = 1.0) -> Trajectory:
    """Smooth sinusoidal trajectory with analytic derivatives.

    Position is analytic (exact v, a); orientation integrates an analytic
    body rate ω(t) with fine exact-exponential steps.
    """
    dt = 1.0 / imu_rate
    n = int(round(duration * imu_rate)) + 1
    t = np.arange(n) * dt

    w1, w2, w3 = 0.7, 0.5, 0.9
    A = np.array([1.2, 0.8, 0.4]) * scale

    p = np.stack([A[0] * np.sin(w1 * t), A[1] * np.cos(w2 * t),
                  A[2] * np.sin(w3 * t)], axis=-1)
    v = np.stack([A[0] * w1 * np.cos(w1 * t), -A[1] * w2 * np.sin(w2 * t),
                  A[2] * w3 * np.cos(w3 * t)], axis=-1)
    a = np.stack([-A[0] * w1 * w1 * np.sin(w1 * t),
                  -A[1] * w2 * w2 * np.cos(w2 * t),
                  -A[2] * w3 * w3 * np.sin(w3 * t)], axis=-1)

    def omega(tt):
        return np.array([0.25 * np.sin(0.9 * tt),
                         0.2 * np.cos(0.7 * tt),
                         0.3 * np.sin(0.5 * tt) + 0.1])

    q = np.zeros((n, 4))
    q[0] = [1, 0, 0, 0]
    sub = 4  # fine substeps per IMU sample for GT orientation accuracy
    for k in range(1, n):
        qq = jnp.asarray(q[k - 1])
        for s in range(sub):
            tm = t[k - 1] + (s + 0.5) * dt / sub
            qq = lie.quat_mul(qq, lie.exp_so3_quat(jnp.asarray(omega(tm) * dt / sub)))
        q[k] = np.asarray(lie.quat_normalize(qq))

    gyr = np.stack([omega(tt) for tt in t])
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    acc_body = np.einsum("nij,nj->ni", R.transpose(0, 2, 1), a - G_W)
    return Trajectory(t, p, q, v, acc_body, gyr)


def add_imu_noise(traj: Trajectory, noise: ImuNoise, rng: np.random.Generator,
                  ba: np.ndarray, bg: np.ndarray, imu_rate: float = 200.0
                  ) -> Trajectory:
    """Discrete-time noise: σ_d = σ_c·√rate, plus constant biases."""
    sq = np.sqrt(imu_rate)
    acc = traj.acc_body + ba + rng.normal(size=traj.acc_body.shape) * noise.acc_n * sq
    gyr = traj.gyr_body + bg + rng.normal(size=traj.gyr_body.shape) * noise.gyr_n * sq
    return traj._replace(acc_body=acc, gyr_body=gyr)


def sample_landmarks(traj: Trajectory, n: int, rng: np.random.Generator,
                     depth_range=(3.0, 12.0)) -> np.ndarray:
    """World landmarks scattered in front of the trajectory's viewing cone."""
    idx = rng.integers(0, len(traj.t), size=n)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q[idx])))
    depth = rng.uniform(*depth_range, size=n)
    dirs = np.stack([rng.uniform(-0.45, 0.45, n),
                     rng.uniform(-0.35, 0.35, n),
                     np.ones(n)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # camera looks along body +z here (identity-ish extrinsic assumed)
    return traj.p[idx] + np.einsum("nij,nj->ni", R, dirs * depth[:, None])


class WindowProblem(NamedTuple):
    gt: WindowState
    init: WindowState
    meas: WindowMeasurements
    frame_times: np.ndarray


def make_window_problem(cfg: WindowConfig,
                        seed: int = 0,
                        frame_hz: float = 10.0,
                        imu_rate: float = 200.0,
                        pixel_noise: float = 0.0,
                        imu_noise: ImuNoise | None = None,
                        bias_scale: float = 0.0,
                        perturb: float = 0.0,
                        dtype=jnp.float64,
                        tic: np.ndarray | None = None,
                        qic: np.ndarray | None = None) -> WindowProblem:
    """Build one full sliding-window problem with GT and a perturbed init.

    - `pixel_noise`: std of observation noise on the normalized plane,
      in *pixels* (divided by FOCAL_LENGTH internally).
    - `perturb`: magnitude of the initial-state perturbation.
    """
    rng = np.random.default_rng(seed)
    nf = cfg.nf
    duration = cfg.window / frame_hz
    traj = analytic_trajectory(duration + 0.01, imu_rate)
    noise = imu_noise or ImuNoise()

    ba_true = rng.normal(size=3) * 0.05 * bias_scale
    bg_true = rng.normal(size=3) * 0.01 * bias_scale
    traj_meas = add_imu_noise(traj, noise if imu_noise else
                              ImuNoise(0, 0, 0, 0), rng, ba_true, bg_true,
                              imu_rate)

    stride = int(round(imu_rate / frame_hz))
    fidx = np.arange(nf) * stride
    frame_times = traj.t[fidx]

    if tic is None:
        tic = np.array([0.05, 0.02, 0.0])
    if qic is None:
        qic = np.array([1.0, 0, 0, 0])

    # --- preintegrate each adjacent pair (same padded-batch path as runtime)
    pres = []
    for i in range(cfg.window):
        s, e = fidx[i], fidx[i + 1]
        dts = np.full(e - s, 1.0 / imu_rate)
        pre = preintegrate(
            jnp.asarray(dts, dtype),
            jnp.asarray(traj_meas.acc_body[s + 1:e + 1], dtype),
            jnp.asarray(traj_meas.gyr_body[s + 1:e + 1], dtype),
            jnp.asarray(traj_meas.acc_body[s], dtype),
            jnp.asarray(traj_meas.gyr_body[s], dtype),
            jnp.asarray(ba_true * 0.0, dtype), jnp.asarray(bg_true * 0.0, dtype),
            noise)
        pres.append(pre)
    import jax
    pre_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)

    # --- landmarks + observations
    F = cfg.max_feats
    lms = sample_landmarks(traj, F, rng)
    R_bw = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q[fidx])))  # [NF,3,3]
    R_ic = np.asarray(lie.quat_to_rot(jnp.asarray(qic)))
    pts = np.zeros((F, nf, 3))
    mask = np.zeros((F, nf))
    for j in range(nf):
        P_b = np.einsum("ij,nj->ni", R_bw[j].T, lms - traj.p[fidx[j]])
        P_c = np.einsum("ij,nj->ni", R_ic.T, P_b - tic)
        z = P_c[:, 2]
        ok = (z > 0.5) & (np.abs(P_c[:, 0] / np.maximum(z, 1e-6)) < 0.55) & \
             (np.abs(P_c[:, 1] / np.maximum(z, 1e-6)) < 0.42)
        ptsj = P_c / np.maximum(z[:, None], 1e-6)
        if pixel_noise > 0:
            ptsj[:, :2] += rng.normal(size=(F, 2)) * pixel_noise / factors.FOCAL_LENGTH
        ptsj[:, 2] = 1.0
        pts[:, j] = ptsj
        mask[:, j] = ok

    # landmarks need >= 2 observations; anchor = first observed frame
    nobs = mask.sum(1)
    feat_valid = (nobs >= 2).astype(float)
    anchor = np.argmax(mask > 0, axis=1).astype(np.int32)

    # GT inverse depth in anchor camera
    inv_depth = np.ones(F)
    for l in range(F):
        a = anchor[l]
        P_b = R_bw[a].T @ (lms[l] - traj.p[fidx[a]])
        P_c = R_ic.T @ (P_b - tic)
        inv_depth[l] = 1.0 / max(P_c[2], 0.1)

    gt = WindowState(
        p=jnp.asarray(traj.p[fidx], dtype), q=jnp.asarray(traj.q[fidx], dtype),
        v=jnp.asarray(traj.v[fidx], dtype),
        ba=jnp.tile(jnp.asarray(ba_true, dtype), (nf, 1)),
        bg=jnp.tile(jnp.asarray(bg_true, dtype), (nf, 1)),
        tic=jnp.asarray(tic, dtype), qic=jnp.asarray(qic, dtype),
        td=jnp.zeros((), dtype), inv_depth=jnp.asarray(inv_depth, dtype))

    # --- perturbed initial guess (first pose kept = gauge)
    def pert(shape, s):
        out = rng.normal(size=shape) * s
        out[0] = 0
        return out

    q0 = np.asarray(gt.q)
    dth = pert((nf, 3), perturb * 0.02)
    q_init = np.asarray(lie.quat_mul(jnp.asarray(q0),
                                     lie.exp_so3_quat(jnp.asarray(dth))))
    init = WindowState(
        p=jnp.asarray(np.asarray(gt.p) + pert((nf, 3), perturb * 0.05), dtype),
        q=jnp.asarray(q_init, dtype),
        v=jnp.asarray(np.asarray(gt.v) + pert((nf, 3), perturb * 0.05), dtype),
        ba=jnp.zeros((nf, 3), dtype), bg=jnp.zeros((nf, 3), dtype),
        tic=gt.tic, qic=gt.qic, td=gt.td,
        inv_depth=jnp.asarray(
            inv_depth * (1 + rng.normal(size=F) * 0.05 * perturb), dtype))

    meas = WindowMeasurements(
        pre=pre_stack,
        pre_valid=jnp.ones(cfg.window, dtype),
        pts=jnp.asarray(pts, dtype),
        vel=jnp.zeros((F, nf, 2), dtype),
        mask=jnp.asarray(mask, dtype),
        anchor=jnp.asarray(anchor),
        feat_valid=jnp.asarray(feat_valid, dtype),
        prior=PriorFactor.empty(cfg, dtype))
    return WindowProblem(gt, init, meas, frame_times)


def loop_trajectory(duration: float, laps: float = 3.0, radius: float = 3.0,
                    imu_rate: float = 200.0, bob: float = 0.25,
                    wobble: float = 0.12, rate_mod: float = 0.4,
                    rate_mod_freq: float = 2.0, wiggle: float = 0.0,
                    wiggle_freq: float = 3.0) -> Trajectory:
    """Multi-lap circuit with the camera (body +z) looking along the
    direction of travel — the canonical loop-closure scenario: every lap
    revisits the same poses, so place recognition has ground-truth positives
    and the pose graph has real loops to close. Analytic p/v/a; orientation
    is pure yaw following the base-circle tangent (ω_body = (0, −θ̇, 0)
    with body y down).

    The radius wobbles at 3θ and the height bobs at 2θ — both functions of
    the lap angle, so revisits stay exact, BUT the body-frame accelerometer
    is no longer constant. A pure circle at constant rate has constant
    specific force in the body frame (centripetal + gravity both fixed),
    which is a degenerate case for visual-inertial alignment — scale and
    velocity are barely observable and the estimator drifts meters even
    noise-free (cf. the IMU-excitation check, estimator.cpp:214-241).

    `rate_mod` additionally modulates the lap rate in TIME,
    θ̇(t) = ω̄·(1 + m·cos(ω_m t)) — every pose is still a pure function of
    θ so revisits stay exact, but the first seconds (where visual-inertial
    alignment estimates scale/gravity from a ~1 s window) now see strongly
    time-varying specific force AND gyro rate. Without it the init window
    is near-degenerate: measured scale 2.5× off at init, recovering only
    after ~8 s of flight (v-ratio 0.41 → 0.97 over the run).
    """
    dt = 1.0 / imu_rate
    n = int(round(duration * imu_rate)) + 1
    t = np.arange(n) * dt
    th_rate = 2.0 * np.pi * laps / duration
    if rate_mod != 0.0:
        wm = rate_mod_freq
        th = th_rate * (t + (rate_mod / wm) * np.sin(wm * t))
        th_dot = th_rate * (1.0 + rate_mod * np.cos(wm * t))
        th_ddot = -th_rate * rate_mod * wm * np.sin(wm * t)
    else:
        th = th_rate * t
        th_dot = np.full(n, th_rate)
        th_ddot = np.zeros(n)

    a3 = wobble * radius
    r = radius + a3 * np.sin(3 * th)
    dr = 3 * a3 * np.cos(3 * th)          # d r / dθ
    ddr = -9 * a3 * np.sin(3 * th)
    cth, sth = np.cos(th), np.sin(th)
    # p(θ), dp/dθ, d²p/dθ² — chain rule with time-varying θ̇:
    # v = p′(θ)·θ̇, a = p″(θ)·θ̇² + p′(θ)·θ̈
    x, y = r * cth, r * sth
    dx = dr * cth - r * sth
    dy = dr * sth + r * cth
    ddx = ddr * cth - 2 * dr * sth - r * cth
    ddy = ddr * sth + 2 * dr * cth - r * sth
    z = bob * np.sin(2 * th)
    dz = 2 * bob * np.cos(2 * th)
    ddz = -4 * bob * np.sin(2 * th)
    p = np.stack([x, y, z], axis=-1)
    dp = np.stack([dx, dy, dz], axis=-1)
    ddp = np.stack([ddx, ddy, ddz], axis=-1)
    v = dp * th_dot[:, None]
    a = ddp * th_dot[:, None] ** 2 + dp * th_ddot[:, None]

    if wiggle != 0.0:
        # TIME-domain radial wiggle u(t)·e_r(θ): every θ-based excitation
        # term above scales with θ̇² and dies on slow laps (the IMU-
        # degeneracy noted in the docstring) — but slow laps are exactly
        # the explore-and-return regime loop closure exists for (60 s
        # revisit gaps vs 10 s). The wiggle keeps specific force finite
        # independent of lap rate, at the cost of revisits being exact
        # only up to its amplitude (the loop edge geometry is measured by
        # PnP, which sees the true relative pose — findConnection parity).
        #   p += u·e_r,  e_r = (cosθ, sinθ, 0),  ė_r = θ̇·e_t
        #   v += u̇·e_r + u·θ̇·e_t
        #   a += (ü − u·θ̇²)·e_r + (2·u̇·θ̇ + u·θ̈)·e_t
        w = wiggle_freq
        u = wiggle * np.sin(w * t)
        du = wiggle * w * np.cos(w * t)
        ddu = -wiggle * w * w * np.sin(w * t)
        e_r = np.stack([cth, sth, np.zeros(n)], -1)
        e_t = np.stack([-sth, cth, np.zeros(n)], -1)
        p = p + u[:, None] * e_r
        v = v + du[:, None] * e_r + (u * th_dot)[:, None] * e_t
        a = a + (ddu - u * th_dot ** 2)[:, None] * e_r \
            + (2 * du * th_dot + u * th_ddot)[:, None] * e_t

    # R_wb(θ) = Rz(θ)·R0 with the camera (+z body) pointing RADIALLY
    # OUTWARD and body y down. Outward-looking matters: along-track (+z =
    # tangent) viewing puts every feature near the focus of expansion,
    # where translational parallax vanishes — the degenerate monocular
    # geometry (measured: scale error 0.35-1.4× on this circuit). Lateral
    # viewing sweeps the walls sideways → strong parallax per frame, and
    # each lap re-images the same wall head-on for loop closure.
    # R0 = [[0,0,1],[−1,0,0],[0,−1,0]] (columns: x_b=−ŷ_w, y_b=−ẑ_w,
    # z_b=x̂_w at θ=0); ω_body = R_wbᵀ(0,0,θ̇) = (0,−θ̇,0) as before.
    R0 = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    q0 = np.asarray(lie.rot_to_quat(jnp.asarray(R0)))
    half = 0.5 * th
    c, s = np.cos(half), np.sin(half)
    qz = np.stack([c, np.zeros_like(c), np.zeros_like(c), s], -1)
    q = np.asarray(lie.quat_mul(jnp.asarray(qz),
                                jnp.broadcast_to(jnp.asarray(q0), qz.shape)))

    gyr = np.stack([np.zeros(n), -th_dot, np.zeros(n)], axis=-1)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    acc_body = np.einsum("nij,nj->ni", R.transpose(0, 2, 1), a - G_W)
    return Trajectory(t, p, q, v, acc_body, gyr)


def wall_landmarks(world_lo: np.ndarray, world_hi: np.ndarray, n: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Landmarks ON the box-world walls (utils.render.BoxWorld AABB): points
    a camera anywhere inside sees at consistent surface texture — required
    for cross-visit BRIEF matching (a floating landmark's backdrop changes
    with viewpoint; a wall point's does not)."""
    lo, hi = np.asarray(world_lo, float), np.asarray(world_hi, float)
    face = rng.integers(0, 6, size=n)
    u = rng.uniform(size=(n, 3))
    pts = lo + u * (hi - lo)
    axis = face % 3
    side = face // 3
    pts[np.arange(n), axis] = np.where(side == 0, lo[axis], hi[axis])
    return pts
