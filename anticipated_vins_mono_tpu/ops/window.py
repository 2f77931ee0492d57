"""The sliding-window VIO optimizer — one jitted LM solve, TPU-first.

This replaces the reference's Ceres problem construction + DENSE_SCHUR/DOGLEG
solve (/root/reference/vins_estimator/src/estimator.cpp:661-994) with a
pure-functional, statically-shaped Levenberg-Marquardt optimizer:

- all factor residuals/Jacobians are evaluated **batched** with `vmap`
  (projection factors over a dense [F, NF] landmark×frame grid with validity
  masks; IMU factors over the W adjacent pairs; one marginalization prior);
- per-factor tangent Jacobians are scattered into dense [*, D] rows with
  `lax.dynamic_update_slice` (XLA scatter) and the Gauss-Newton normal
  equations come from ONE big `einsum` — an MXU matmul — instead of Ceres'
  per-block accumulation;
- inverse-depth landmarks are eliminated with a **Schur complement**; their
  cross-landmark Hessian block is exactly diagonal, so the reduction is a
  batched rank-1 update (what DENSE_SCHUR does, without the bookkeeping);
- the LM loop is a fixed-iteration `lax.fori_loop` with branchless
  accept/reject — mirroring the reference's hard 8-iteration budget
  (estimator.cpp:799-806) while staying a single XLA program;
- Cauchy robust loss on projection factors via sqrt-weight reweighting
  (estimator.cpp:666,717 uses ceres::CauchyLoss(1.0)).

State-vector tangent layout (D = 6·NF + 9·NF + 6 + 1):
  [6i:6i+6]          pose i       (δp, δθ)        i = 0..NF-1
  [6NF+9i : +9]      speed/bias i (δv, δba, δbg)
  [15NF : 15NF+6]    camera-IMU extrinsic (δtic, δθic)
  [15NF+6]           time offset td
Inverse depths are separate (Schur-eliminated), one per landmark slot.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import factors, lie
from anticipated_vins_mono_tpu.ops.preintegration import Preintegrated


class WindowConfig(NamedTuple):
    """Static solver configuration (hashable → jit static arg).

    Defaults mirror the reference: WINDOW_SIZE=10 (parameters.h:14), 8 LM
    iterations (euroc_config.yaml:55), CauchyLoss(1.0) (estimator.cpp:666).
    """

    window: int = 10            # keyframe pairs; NF = window+1 frames
    max_feats: int = 128        # landmark slots F
    iters: int = 8              # LM outer iterations
    estimate_extrinsic: bool = True
    estimate_td: bool = False
    # rolling-shutter compensation (projection_td_factor.cpp:50-52):
    # per-observation time shift TR/ROW · (row − ROW/2). Rows are recovered
    # from the normalized y-coordinate (row ≈ fy·y + cy), accurate to a few
    # pixels for radtan distortion at EuRoC FOV.
    tr_over_row: float = 0.0       # TR / ROW  [s per pixel row]
    row_fy: float = 460.0          # fy for row recovery
    row_c0: float = 8.1            # cy − ROW/2
    cauchy_scale: float = 1.0
    anchor_weight: float = 1e3  # gauge anchor on pose 0 when no prior
    lm_lambda_init: float = 1e-4
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.5
    min_inv_depth: float = 0.01  # clamp: depths beyond 100 m
    # triangulation acceptance: subtended parallax (baseline/depth) must
    # exceed this [rad] ≈ px/focal. Guards against hover-born zero-baseline
    # depths (see ops/triangulation.py gate comment)
    tri_min_parallax: float = 1.5 / 460.0
    lm_strategy: str = "halving"  # "halving" | "nielsen"
    # fused Pallas Schur-reduction/solve kernel (f32, TPU): one launch
    # instead of XLA's einsum→cholesky→cho_solve chain. Perf-path only —
    # the f64 accuracy path keeps the XLA solve.
    pallas_schur: bool = False
    # blocked batched Cholesky + matmul substitutions (ops/blocked_chol):
    # replaces XLA's row-serial triangular kernels in the perf path —
    # measured 74% of the Schur stage on TPU (results/r3/bench_profile.json)
    fast_chol: bool = False
    # accumulation precision for the numerically-delicate steps (cost sums,
    # Schur cancellation, Cholesky solve, marginalization keep−drop):
    #   "f64"  — cast to f64 (real f64 on CPU/x64; silently f32 without x64)
    #   "df32" — native-f32 double-float compensated arithmetic (ops/df32):
    #            the TPU path, no x64 emulation needed. Matches the f64
    #            path to ~47-bit accumulator precision.
    accum: str = "f64"

    @property
    def nf(self) -> int:
        return self.window + 1

    @property
    def dim(self) -> int:
        # + 6 trailing dims for the relocalization pose tangent (used only
        # when a relo frame is attached; zero columns otherwise)
        return 15 * self.nf + 6 + 1 + 6


class WindowState(NamedTuple):
    """Optimizable window state (pytree). Mirrors Estimator's
    Ps/Rs/Vs/Bas/Bgs[WINDOW+1] + tic/ric + td + per-feature inverse depth
    (estimator.h:74-83, feature depth via FeatureManager::getDepthVector)."""

    p: jax.Array          # [NF,3]
    q: jax.Array          # [NF,4] wxyz
    v: jax.Array          # [NF,3]
    ba: jax.Array         # [NF,3]
    bg: jax.Array         # [NF,3]
    tic: jax.Array        # [3]
    qic: jax.Array        # [4]
    td: jax.Array         # []
    inv_depth: jax.Array  # [F]
    relo_p: jax.Array = None   # [3] relocalization-frame pose (optional)
    relo_q: jax.Array = None   # [4]

    @staticmethod
    def identity(cfg: WindowConfig, dtype=jnp.float64) -> "WindowState":
        nf, f = cfg.nf, cfg.max_feats
        qI = jnp.tile(lie.quat_identity(dtype), (nf, 1))
        return WindowState(
            p=jnp.zeros((nf, 3), dtype), q=qI, v=jnp.zeros((nf, 3), dtype),
            ba=jnp.zeros((nf, 3), dtype), bg=jnp.zeros((nf, 3), dtype),
            tic=jnp.zeros(3, dtype), qic=lie.quat_identity(dtype),
            td=jnp.zeros((), dtype), inv_depth=jnp.ones(f, dtype))


class PriorFactor(NamedTuple):
    """Marginalization prior: r(x) = r0 + J0 · ⊟(x, x_lin).

    Mirrors MarginalizationFactor::Evaluate
    (factor/marginalization_factor.cpp:333-381): linearized_jacobians J0 and
    residuals r0 stored at the linearization state; replayed with a
    quaternion-aware dx. Rows are padded to D; `weight` gates validity."""

    J0: jax.Array        # [D, D]
    r0: jax.Array        # [D]
    lin: WindowState     # linearization point (inv_depth ignored)
    weight: jax.Array    # [] 0.0 or 1.0

    @staticmethod
    def empty(cfg: WindowConfig, dtype=jnp.float64) -> "PriorFactor":
        d = cfg.dim
        return PriorFactor(
            J0=jnp.zeros((d, d), dtype), r0=jnp.zeros(d, dtype),
            lin=WindowState.identity(cfg, dtype), weight=jnp.zeros((), dtype))


class WindowMeasurements(NamedTuple):
    """Static-shape measurement bundle for one window solve."""

    pre: Preintegrated    # leading dim [W]
    pre_valid: jax.Array  # [W] 1/0 — pair participates
    pts: jax.Array        # [F,NF,3] normalized-plane obs (z=1)
    vel: jax.Array        # [F,NF,2] normalized-plane velocity (for td)
    mask: jax.Array       # [F,NF] 1/0 observation validity
    anchor: jax.Array     # [F] int32 first observing frame
    feat_valid: jax.Array # [F] 1/0 slot in use
    prior: PriorFactor
    # relocalization block (setReloFrame parity, estimator.cpp:1095-1129;
    # factors added to the BA at :760-792). None = no relo frame attached.
    relo_pts: jax.Array = None    # [F,3] matched obs in the relo frame
    relo_valid: jax.Array = None  # [F] 1/0 match per landmark slot
    # roll/pitch anchor scaling (see _anchor_rows pin_rp); None = pin.
    # The device reboot path passes (since_fail >= 2·NF) so the one-sample
    # g2R attitude stays correctable during recovery.
    anchor_pin_rp: jax.Array = None
    # zero-velocity pseudo-measurements (EXTENSION over the reference): the
    # accel-bias↔tilt direction is unobservable during long stationary
    # phases and runs away at small feature budgets — the reference's own
    # MH_05 runs diverge there (results.tex:49). Per-frame sqrt-weights,
    # nonzero only when the IMU stream flags the frame stationary.
    zupt_w: jax.Array = None      # [NF] sqrt-information on v_i ≈ 0
    # td at each frame's capture (the reference stores td per observation,
    # feature_manager.h FeaturePerFrame::cur_td); None → zeros
    td_obs: jax.Array = None      # [NF]
    # per-landmark sqrt-information multiplier from the tracker's prob
    # channel (EXTENSION): the GFTT-score probability predicts slip-prone
    # tracks (feature_tracker.cpp:300-343 publishes it; the reference
    # strips it before the backend, estimator_node.cpp:350). Round-3
    # ablation: self-consistent slipped tracks are invisible to robust
    # loss AND outlier rejection (the phantom landmark reprojects
    # consistently); discounting by predicted quality is the only channel
    # that sees them coming. None → 1.0 everywhere.
    feat_w: jax.Array = None      # [F]


# ----------------------------------------------------------------------------
# Tangent-vector plumbing
# ----------------------------------------------------------------------------


def state_boxminus(x: WindowState, lin: WindowState, cfg: WindowConfig) -> jax.Array:
    """dx = x ⊟ lin as a flat [D] tangent (quaternion-aware, matching
    marginalization_factor.cpp:347-367: δθ = 2·vec(q_lin⁻¹ ⊗ q))."""
    dp = (x.p - lin.p).reshape(-1)
    dth = 2.0 * lie.quat_mul(lie.quat_conj(lin.q), x.q)[..., 1:4]
    # keep sign consistent with w>0 branch of the reference
    sign = jnp.where(lie.quat_mul(lie.quat_conj(lin.q), x.q)[..., :1] >= 0, 1.0, -1.0)
    dth = (dth * sign).reshape(-1)
    pose = jnp.stack([(x.p - lin.p), lie.quat_mul(lie.quat_conj(lin.q), x.q)[..., 1:4] * sign],
                     axis=-2).reshape(cfg.nf, 6)  # [NF, (dp,dθ)]
    sb = jnp.concatenate([x.v - lin.v, x.ba - lin.ba, x.bg - lin.bg], axis=-1)
    dext_p = x.tic - lin.tic
    qrel = lie.quat_mul(lie.quat_conj(lin.qic), x.qic)
    dext_th = 2.0 * qrel[1:4] * jnp.where(qrel[0] >= 0, 1.0, -1.0)
    return jnp.concatenate([
        pose.reshape(-1), sb.reshape(-1), dext_p, dext_th,
        (x.td - lin.td)[None],
        jnp.zeros(6, x.p.dtype)])  # relo block: never in the prior


def retract(x: WindowState, dx: jax.Array, d_rho: jax.Array,
            cfg: WindowConfig) -> WindowState:
    """x ⊞ dx — boxplus on every block (pose_local_parameterization.cpp:3-21)."""
    nf = cfg.nf
    pose_dx = dx[: 6 * nf].reshape(nf, 6)
    sb_dx = dx[6 * nf: 15 * nf].reshape(nf, 9)
    ext_dx = dx[15 * nf: 15 * nf + 6]
    td_dx = dx[15 * nf + 6]
    p, q = lie.pose_boxplus(x.p, x.q, pose_dx)
    tic, qic = lie.pose_boxplus(x.tic, x.qic, ext_dx)
    inv_depth = x.inv_depth + d_rho
    inv_depth = jnp.maximum(inv_depth, cfg.min_inv_depth)
    relo_p, relo_q = x.relo_p, x.relo_q
    if relo_p is not None:
        relo_dx = dx[15 * nf + 7: 15 * nf + 13]
        relo_p, relo_q = lie.pose_boxplus(relo_p, relo_q, relo_dx)
    return WindowState(
        p=p, q=q, v=x.v + sb_dx[:, 0:3], ba=x.ba + sb_dx[:, 3:6],
        bg=x.bg + sb_dx[:, 6:9], tic=tic, qic=qic, td=x.td + td_dx,
        inv_depth=inv_depth, relo_p=relo_p, relo_q=relo_q)


# ----------------------------------------------------------------------------
# Linearization (batched)
# ----------------------------------------------------------------------------


def _proj_factor_rows(state: WindowState, meas: WindowMeasurements,
                      cfg: WindowConfig, feat: jax.Array, frame: jax.Array):
    """One projection factor (landmark `feat`, target frame `frame`):
    residual [2], tangent Jacobian blocks (anchor/frame/extrinsic/td),
    landmark column [2], robust×validity weight []. vmapped over the F×NF
    grid; placement into dense rows happens in `linearize` via one-hot
    einsums (static layout → MXU-friendly, no per-factor scatter)."""
    d = cfg.dim
    a = meas.anchor[feat]
    pt_i = meas.pts[feat, a]
    pt_j = meas.pts[feat, frame]
    invd = state.inv_depth[feat]

    pose_a = factors.PoseTangent(state.p[a], state.q[a])
    pose_j = factors.PoseTangent(state.p[frame], state.q[frame])
    pose_e = factors.PoseTangent(state.tic, state.qic)

    if cfg.estimate_td:
        vel_i = meas.vel[feat, a]
        vel_j = meas.vel[feat, frame]
        zero = jnp.zeros((), pt_i.dtype)
        td_i = meas.td_obs[a] if meas.td_obs is not None else zero
        td_j = meas.td_obs[frame] if meas.td_obs is not None else zero
        # centered pixel rows from normalized y (projection_td_factor.cpp:18)
        row_i = cfg.row_fy * pt_i[1] + cfg.row_c0
        row_j = cfg.row_fy * pt_j[1] + cfg.row_c0

        def res_fn(pa, pj, pe, rho, td):
            return factors.projection_td_residual(
                pa.p, pa.q, pj.p, pj.q, pe.p, pe.q, rho, td,
                pt_i, pt_j, vel_i, vel_j,
                td_i, td_j, row_i, row_j, cfg.tr_over_row)

        res, (J_a, J_j, J_e, J_rho, J_td) = factors.tangent_jacobian(
            res_fn, (pose_a, pose_j, pose_e), (invd, state.td))
    else:
        def res_fn(pa, pj, pe, rho):
            return factors.projection_residual(
                pa.p, pa.q, pj.p, pj.q, pe.p, pe.q, rho, pt_i, pt_j)

        res, (J_a, J_j, J_e, J_rho) = factors.tangent_jacobian(
            res_fn, (pose_a, pose_j, pose_e), (invd,))
        J_td = jnp.zeros((2,), res.dtype)

    valid = (meas.mask[feat, a] * meas.mask[feat, frame]
             * meas.feat_valid[feat] * (frame != a))
    fw = meas.feat_w[feat] if meas.feat_w is not None \
        else jnp.ones((), res.dtype)
    sq = jnp.sum(res * res) * fw * fw
    w = factors.cauchy_weight(sq, cfg.cauchy_scale) * valid * fw
    if not cfg.estimate_extrinsic:
        J_e = jnp.zeros_like(J_e)
    return res, (J_a, J_j, J_e, J_td), J_rho, w, sq * valid


def _imu_factor_rows(state: WindowState, meas: WindowMeasurements,
                     cfg: WindowConfig, i: jax.Array):
    """One IMU factor between frames i and i+1: whitened residual [15],
    tangent Jacobian blocks, validity weight []. vmapped over W pairs;
    dense placement happens in `linearize` via one-hot einsums."""
    d = cfg.dim
    pre_i = jax.tree_util.tree_map(lambda x: x[i], meas.pre)
    sb_i = jnp.concatenate([state.v[i], state.ba[i], state.bg[i]])
    sb_j = jnp.concatenate([state.v[i + 1], state.ba[i + 1], state.bg[i + 1]])
    pose_i = factors.PoseTangent(state.p[i], state.q[i])
    pose_j = factors.PoseTangent(state.p[i + 1], state.q[i + 1])

    def res_fn(pi, pj, si, sj):
        return factors.imu_residual(
            pi.p, pi.q, si[0:3], si[3:6], si[6:9],
            pj.p, pj.q, sj[0:3], sj[3:6], sj[6:9], pre_i)

    res, (J_pi, J_pj, J_si, J_sj) = factors.tangent_jacobian(
        res_fn, (pose_i, pose_j), (sb_i, sb_j))
    return res, (J_pi, J_pj, J_si, J_sj), meas.pre_valid[i]


def _relo_factor_rows(state: WindowState, meas: WindowMeasurements,
                      cfg: WindowConfig, feat: jax.Array):
    """Relocalization projection factor for one landmark: residual of the
    landmark (anchored in the window) reprojected into the relo pose against
    its matched observation. Mirrors the relo factors the reference adds to
    the BA (estimator.cpp:760-792, ProjectionFactor on relo_Pose)."""
    a = meas.anchor[feat]
    pt_i = meas.pts[feat, a]
    pt_r = meas.relo_pts[feat]
    invd = state.inv_depth[feat]

    pose_a = factors.PoseTangent(state.p[a], state.q[a])
    pose_r = factors.PoseTangent(state.relo_p, state.relo_q)
    pose_e = factors.PoseTangent(state.tic, state.qic)

    def res_fn(pa, pr, pe, rho):
        return factors.projection_residual(
            pa.p, pa.q, pr.p, pr.q, pe.p, pe.q, rho, pt_i, pt_r)

    res, (J_a, J_r, J_e, J_rho) = factors.tangent_jacobian(
        res_fn, (pose_a, pose_r, pose_e), (invd,))
    valid = meas.mask[feat, a] * meas.feat_valid[feat] * meas.relo_valid[feat]
    sq = jnp.sum(res * res)
    w = factors.cauchy_weight(sq, cfg.cauchy_scale) * valid
    if not cfg.estimate_extrinsic:
        J_e = jnp.zeros_like(J_e)
    return res, (J_a, J_r, J_e), J_rho, w, sq * valid


def _anchor_rows(state: WindowState, anchor_ref, cfg: WindowConfig,
                 has_prior: jax.Array, pin_rp=None):
    """Gauge anchor: soft prior pinning pose 0 to its value at solve entry,
    active only when no marginalization prior exists yet. The reference
    leaves gauge to the prior + yaw re-anchoring (estimator.cpp:521-568);
    this anchor makes the very first solves deterministic and well-posed.

    `pin_rp` (traced, default 1.0) scales the ROLL/PITCH rows. Healthy
    paths pin the full rotation: the init chain has just gravity-aligned
    the window, the pin is correct, and it flows into the first
    marginalization prior as absolute attitude information (dropping it
    costs measurable accuracy on weakly-excited circuits — capstone A/B
    0.45 → 1.6 m). The device REBOOT path passes 0: there the anchor
    attitude is one raw g2R sample whose error must stay correctable —
    a hard 6-dof pin locks it in and the trajectory accelerates at
    g·sin(err) forever (measured 26° tilt, imu_chi2 1e-18, +4.5 m/s²)."""
    d = cfg.dim
    dtype = state.p.dtype
    p_ref, q_ref = anchor_ref
    if pin_rp is None:
        pin_rp = jnp.asarray(1.0, dtype)
    w = jnp.sqrt(jnp.asarray(cfg.anchor_weight, dtype)) * (1.0 - has_prior)
    qrel = lie.quat_mul(lie.quat_conj(q_ref), state.q[0])
    dth = 2.0 * qrel[1:4] * jnp.where(qrel[0] >= 0, 1.0, -1.0)
    # rotation error expressed on world axes: rows of R_ref whiten the
    # body-tangent error; the world-z row is yaw (always pinned), the
    # world-x/y rows are roll/pitch (scaled by pin_rp)
    R_ref = lie.quat_to_rot(q_ref)
    w_rows = jnp.stack([w * pin_rp, w * pin_rp, w])
    r_rot = w_rows * (R_ref @ dth)
    r = jnp.concatenate([w * (state.p[0] - p_ref), r_rot])
    J = jnp.zeros((6, d), dtype).at[:3, :3].set(jnp.eye(3, dtype=dtype) * w)
    J = J.at[3:6, 3:6].set(w_rows[:, None] * R_ref)
    return r, J


def linearize(state: WindowState, meas: WindowMeasurements, cfg: WindowConfig,
              anchor_ref=None):
    """All residual rows + dense Jacobian blocks, fully batched.

    Returns (r_all [N], J_all [N,D], p_res [F,NFx,2], p_rows [F,NFx,2,D],
    p_rho [F,NFx,2], p_sq [F,NFx]) where NFx = NF (+1 when a relo frame is
    attached): the landmark columns stay factored out for the Schur step and
    p_sq carries the raw robust-loss arguments for cost evaluation.
    """
    F, NF, W, D = cfg.max_feats, cfg.nf, cfg.window, cfg.dim
    dtype = state.p.dtype
    f_grid = jnp.arange(F, dtype=jnp.int32)
    j_grid = jnp.arange(NF, dtype=jnp.int32)

    proj_fn = jax.vmap(jax.vmap(
        lambda l, j: _proj_factor_rows(state, meas, cfg, l, j),
        in_axes=(None, 0)), in_axes=(0, None))
    p_res, (J_a, J_j, J_e, J_td), p_rho, p_w, p_sq = proj_fn(f_grid, j_grid)
    # weight applied to both residual and Jacobian (Triggs sqrt(ρ') scaling)
    p_res = p_res * p_w[..., None]
    wj = p_w[..., None, None]
    J_a, J_j, J_e = J_a * wj, J_j * wj, J_e * wj
    J_td = J_td * p_w[..., None]
    p_rho = p_rho * p_w[..., None]

    # dense row assembly WITHOUT scatter: anchor blocks via one-hot of the
    # (dynamic) anchor index; frame blocks land at their own (static) grid
    # column; extrinsic/td columns are a static concat. All einsums → MXU.
    onehot_a = jax.nn.one_hot(meas.anchor, NF, dtype=dtype)       # [F,NF]
    pose_a = jnp.einsum("fn,fjrc->fjrnc", onehot_a, J_a)
    pose_j = jnp.einsum("jn,fjrc->fjrnc", jnp.eye(NF, dtype=dtype), J_j)
    pose_cols = (pose_a + pose_j).reshape(F, NF, 2, 6 * NF)
    sb_cols = jnp.zeros((F, NF, 2, 9 * NF), dtype)
    p_rows = jnp.concatenate(
        [pose_cols, sb_cols, J_e, J_td[..., None],
         jnp.zeros((F, NF, 2, 6), dtype)], axis=-1)                # [F,NF,2,D]

    if meas.relo_pts is not None:
        # relo factors enter as one extra pseudo-frame column of the
        # projection grid so the Schur elimination sees their landmark terms
        rr, (rJ_a, rJ_r, rJ_e), r_rho, r_w, r_sq = jax.vmap(
            lambda l: _relo_factor_rows(state, meas, cfg, l))(f_grid)
        rr = rr * r_w[..., None]
        rw2 = r_w[..., None, None]
        rJ_a, rJ_r, rJ_e = rJ_a * rw2, rJ_r * rw2, rJ_e * rw2
        r_rho = r_rho * r_w[..., None]
        rpose = jnp.einsum("fn,frc->frnc", onehot_a, rJ_a).reshape(F, 2, 6 * NF)
        r_rows = jnp.concatenate(
            [rpose, jnp.zeros((F, 2, 9 * NF), dtype), rJ_e,
             jnp.zeros((F, 2, 1), dtype), rJ_r], axis=-1)          # [F,2,D]
        p_res = jnp.concatenate([p_res, rr[:, None]], axis=1)
        p_rows = jnp.concatenate([p_rows, r_rows[:, None]], axis=1)
        p_rho = jnp.concatenate([p_rho, r_rho[:, None]], axis=1)
        p_sq = jnp.concatenate([p_sq, r_sq[:, None]], axis=1)

    imu_fn = jax.vmap(lambda i: _imu_factor_rows(state, meas, cfg, i))
    i_res, (J_pi, J_pj, J_si, J_sj), i_w = imu_fn(
        jnp.arange(W, dtype=jnp.int32))
    i_res = i_res * i_w[..., None]
    wi = i_w[..., None, None]
    J_pi, J_pj, J_si, J_sj = J_pi * wi, J_pj * wi, J_si * wi, J_sj * wi
    eye_nf = jnp.eye(NF, dtype=dtype)
    ipose = jnp.einsum("wn,wrc->wrnc", eye_nf[:W], J_pi) + \
        jnp.einsum("wn,wrc->wrnc", eye_nf[1:W + 1], J_pj)
    isb = jnp.einsum("wn,wrc->wrnc", eye_nf[:W], J_si) + \
        jnp.einsum("wn,wrc->wrnc", eye_nf[1:W + 1], J_sj)
    i_rows = jnp.concatenate(
        [ipose.reshape(W, 15, 6 * NF), isb.reshape(W, 15, 9 * NF),
         jnp.zeros((W, 15, 13), dtype)], axis=-1)                  # [W,15,D]

    # marginalization prior rows
    dx_lin = state_boxminus(state, meas.prior.lin, cfg)
    pr_res = (meas.prior.r0 + meas.prior.J0 @ dx_lin) * meas.prior.weight
    pr_rows = meas.prior.J0 * meas.prior.weight

    if anchor_ref is None:
        anchor_ref = (state.p[0], state.q[0])
    a_res, a_rows = _anchor_rows(state, anchor_ref, cfg, meas.prior.weight,
                 pin_rp=meas.anchor_pin_rp)

    extra_res, extra_rows = [], []
    if meas.zupt_w is not None:
        z_res = (meas.zupt_w[:, None] * state.v).reshape(-1)     # [3NF]
        # rows [NF,3,D]: identity on each frame's velocity block
        zrows = jnp.zeros((NF, 3, cfg.dim), dtype)
        for i_f in range(NF):
            zrows = zrows.at[i_f, :, 6 * NF + 9 * i_f: 6 * NF + 9 * i_f + 3]\
                .set(jnp.eye(3, dtype=dtype))
        zrows = zrows * meas.zupt_w[:, None, None]
        extra_res.append(z_res)
        extra_rows.append(zrows.reshape(-1, cfg.dim))

    r_all = jnp.concatenate([
        p_res.reshape(-1), i_res.reshape(-1), pr_res, a_res] + extra_res)
    J_all = jnp.concatenate([
        p_rows.reshape(-1, cfg.dim), i_rows.reshape(-1, cfg.dim),
        pr_rows, a_rows] + extra_rows)
    return r_all, J_all, p_res, p_rows, p_rho, p_sq


def _cost_terms(state: WindowState, meas: WindowMeasurements,
                cfg: WindowConfig, anchor_ref=None) -> jax.Array:
    """Per-factor cost contributions 0.5·ρ(‖r‖²) as ONE flat vector in the
    native dtype; accumulation precision is the caller's choice
    (`robust_cost` → f64 cast, `robust_cost_df` → df32 compensated sum)."""
    f_grid = jnp.arange(cfg.max_feats, dtype=jnp.int32)
    j_grid = jnp.arange(cfg.nf, dtype=jnp.int32)

    def proj_cost(l, j):
        a = meas.anchor[l]
        if cfg.estimate_td:
            # the td/rolling-shutter observation model must match the
            # linearization's (projection_td_factor.cpp:50-52) — LM accepts
            # steps against this objective
            zero = jnp.zeros((), meas.pts.dtype)
            td_i = meas.td_obs[a] if meas.td_obs is not None else zero
            td_j = meas.td_obs[j] if meas.td_obs is not None else zero
            row_i = cfg.row_fy * meas.pts[l, a, 1] + cfg.row_c0
            row_j = cfg.row_fy * meas.pts[l, j, 1] + cfg.row_c0
            res = factors.projection_td_residual(
                state.p[a], state.q[a], state.p[j], state.q[j],
                state.tic, state.qic, state.inv_depth[l], state.td,
                meas.pts[l, a], meas.pts[l, j],
                meas.vel[l, a], meas.vel[l, j],
                td_i, td_j, row_i, row_j, cfg.tr_over_row)
        else:
            res = factors.projection_residual(
                state.p[a], state.q[a], state.p[j], state.q[j],
                state.tic, state.qic, state.inv_depth[l],
                meas.pts[l, a], meas.pts[l, j])
        valid = (meas.mask[l, a] * meas.mask[l, j]
                 * meas.feat_valid[l] * (j != a))
        fw = meas.feat_w[l] if meas.feat_w is not None \
            else jnp.ones((), res.dtype)
        s2 = jnp.sum(res * res) * fw * fw
        c2 = cfg.cauchy_scale ** 2
        return 0.5 * c2 * jnp.log1p(s2 / c2) * valid

    pc = jax.vmap(jax.vmap(proj_cost, in_axes=(None, 0)),
                  in_axes=(0, None))(f_grid, j_grid).reshape(-1)

    def imu_cost(i):
        pre_i = jax.tree_util.tree_map(lambda x: x[i], meas.pre)
        res = factors.imu_residual(
            state.p[i], state.q[i], state.v[i], state.ba[i], state.bg[i],
            state.p[i + 1], state.q[i + 1], state.v[i + 1], state.ba[i + 1],
            state.bg[i + 1], pre_i)
        return 0.5 * jnp.sum(res * res) * meas.pre_valid[i]

    ic = jax.vmap(imu_cost)(jnp.arange(cfg.window, dtype=jnp.int32))

    terms = [pc, ic]
    if meas.relo_pts is not None:
        def relo_cost(l):
            a = meas.anchor[l]
            res = factors.projection_residual(
                state.p[a], state.q[a], state.relo_p, state.relo_q,
                state.tic, state.qic, state.inv_depth[l],
                meas.pts[l, a], meas.relo_pts[l])
            valid = (meas.mask[l, a] * meas.feat_valid[l]
                     * meas.relo_valid[l])
            s2 = jnp.sum(res * res)
            c2 = cfg.cauchy_scale ** 2
            return 0.5 * c2 * jnp.log1p(s2 / c2) * valid
        terms.append(jax.vmap(relo_cost)(f_grid))

    dx_lin = state_boxminus(state, meas.prior.lin, cfg)
    pr = (meas.prior.r0 + meas.prior.J0 @ dx_lin) * meas.prior.weight
    terms.append(0.5 * pr * pr)

    if anchor_ref is None:
        anchor_ref = (state.p[0], state.q[0])
    a_res, _ = _anchor_rows(state, anchor_ref, cfg, meas.prior.weight,
                 pin_rp=meas.anchor_pin_rp)
    terms.append(0.5 * a_res * a_res)
    if meas.zupt_w is not None:
        terms.append(0.5 * ((meas.zupt_w[:, None] * state.v) ** 2)
                     .reshape(-1))
    return jnp.concatenate(terms)


def imu_chi2_mean(state: WindowState, meas: WindowMeasurements,
                  cfg: WindowConfig) -> jax.Array:
    """Mean whitened IMU-residual chi² per valid preintegration pair at
    `state` — a noise-model consistency diagnostic.

    Under a correct noise model each pair's ‖r‖² ~ chi²₁₅ (mean 15).
    Recorded per solve in EstimatorDiagnostics.imu_chi2s. NOTE: measured
    NOT to detect the MH_04 slow scale runaway (it stays ≤ 10 throughout a
    km-scale blow-up, results/r4/imu_chi2_traces_all.json) — a rigid drift
    of the whole window is residual-free, so the inconsistency is absorbed
    by the marginalization prior, not the in-window factors. The failure
    tripwire therefore uses the velocity-state magnitude instead
    (estimator.max_speed_fail)."""
    def pair_chi2(i):
        pre_i = jax.tree_util.tree_map(lambda x: x[i], meas.pre)
        res = factors.imu_residual(
            state.p[i], state.q[i], state.v[i], state.ba[i], state.bg[i],
            state.p[i + 1], state.q[i + 1], state.v[i + 1], state.ba[i + 1],
            state.bg[i + 1], pre_i)
        return jnp.sum(res * res) * meas.pre_valid[i]

    chi2 = jax.vmap(pair_chi2)(jnp.arange(cfg.window, dtype=jnp.int32))
    return jnp.sum(chi2) / jnp.maximum(jnp.sum(meas.pre_valid), 1.0)


def prior_chi2(state: WindowState, meas: WindowMeasurements,
               cfg: WindowConfig) -> jax.Array:
    """‖r₀ + J₀·⊟(x, x_lin)‖² of the marginalization prior at `state` —
    the tension between the current solution and everything already
    marginalized out. The slow MH_04 scale/position runaway is residual-
    free in the in-window factors (imu_chi2 stays ≤10 through a km-scale
    blow-up — see imu_chi2_mean's note) because a rigid drift of the
    window is only resisted by the PRIOR; this statistic reads that
    tension directly."""
    dx_lin = state_boxminus(state, meas.prior.lin, cfg)
    pr = (meas.prior.r0 + meas.prior.J0 @ dx_lin) * meas.prior.weight
    return jnp.sum(pr * pr)


def robust_cost(state: WindowState, meas: WindowMeasurements,
                cfg: WindowConfig, anchor_ref=None) -> jax.Array:
    """0.5·Σ ρ(‖r‖²) over all factors, accumulated in f64 (identity when
    x64 is off): LM's accept/reject compares costs whose difference is
    ~1e-7 relative — f32 summation noise over thousands of terms stalls
    convergence (SURVEY.md §7 hard part 4 mixed-precision plan)."""
    t = _cost_terms(state, meas, cfg, anchor_ref)
    return jnp.sum(t.astype(jnp.float64))


def robust_cost_df(state: WindowState, meas: WindowMeasurements,
                   cfg: WindowConfig, anchor_ref=None) -> "df32.DF":
    """Same objective, accumulated with the native-f32 compensated tree sum
    (the TPU path: no x64 emulation). Returns a df32.DF scalar pair."""
    from anticipated_vins_mono_tpu.ops import df32
    t = _cost_terms(state, meas, cfg, anchor_ref)
    return df32.tree_sum(t)

# ----------------------------------------------------------------------------
# Normal equations + Schur complement + LM loop
# ----------------------------------------------------------------------------


def build_normal_equations(r_all, J_all, p_res, p_rows, p_rho, cfg: WindowConfig):
    """H_pp, g_p, plus the landmark blocks for Schur elimination.

    H_pp = ΣJᵀJ is ONE [N,D]ᵀ[N,D] matmul (MXU). Landmark blocks never form a
    matrix: H_ll is diagonal by construction (no factor touches two
    landmarks), H_pl is a [F, D] segment-sum over each landmark's factors —
    here a plain reshape-sum because the factor grid is [F, NF].
    """
    H = J_all.T @ J_all                           # [D,D]
    g = J_all.T @ r_all                           # [D]
    # landmark blocks: p_rows [F,NF,2,D], p_rho [F,NF,2]
    H_lp = jnp.einsum("fnr,fnrd->fd", p_rho, p_rows)   # [F,D]
    h_ll = jnp.einsum("fnr,fnr->f", p_rho, p_rho)      # [F]
    g_l = jnp.einsum("fnr,fnr->f", p_rho, p_res)       # [F]
    return H, g, H_lp, h_ll, g_l


def normal_equations_fast(state: WindowState, meas: WindowMeasurements,
                          cfg: WindowConfig, anchor_ref=None):
    """Blockwise normal equations for the LM hot loop.

    `linearize` materializes dense projection rows [F,NF,2,D] (the
    bandwidth hog of the solve: ~2 MB/scenario/iteration written+read);
    here H's projection contribution is assembled directly from the 6-dim
    factor blocks with one-hot anchor einsums — identical math (the outer
    product of a row whose only nonzero blocks are (anchor, frame, ext, td)
    expands into block-pair terms), ~20× less HBM traffic. The small row
    groups (IMU, prior, anchor, ZUPT: ~370 rows) stay dense — they are
    negligible. Used when no relo frame is attached (the relo pseudo-frame
    keeps the general path).
    """
    F, NF, W, D = cfg.max_feats, cfg.nf, cfg.window, cfg.dim
    dtype = state.p.dtype
    f_grid = jnp.arange(F, dtype=jnp.int32)
    j_grid = jnp.arange(NF, dtype=jnp.int32)

    proj_fn = jax.vmap(jax.vmap(
        lambda l, j: _proj_factor_rows(state, meas, cfg, l, j),
        in_axes=(None, 0)), in_axes=(0, None))
    p_res, (J_a, J_j, J_e, J_td), p_rho, p_w, p_sq = proj_fn(f_grid, j_grid)
    p_res = p_res * p_w[..., None]
    wj = p_w[..., None, None]
    J_a, J_j, J_e = J_a * wj, J_j * wj, J_e * wj
    J_td = J_td * p_w[..., None]
    p_rho = p_rho * p_w[..., None]

    A = jax.nn.one_hot(meas.anchor, NF, dtype=dtype)          # [F,NF]
    # pose-pose block grid [NF,NF,6,6]
    T_aa = jnp.einsum("fn,fjra,fjrb->nab", A, J_a, J_a)
    T_jj = jnp.einsum("fjra,fjrb->jab", J_j, J_j)
    T_aj = jnp.einsum("fn,fjra,fjrb->njab", A, J_a, J_j)
    eyeNF = jnp.eye(NF, dtype=dtype)
    H_pp = (eyeNF[:, :, None, None] * (T_aa + T_jj)[:, None]
            + T_aj + T_aj.transpose(1, 0, 3, 2))
    H_pp = H_pp.transpose(0, 2, 1, 3).reshape(6 * NF, 6 * NF)
    # pose-ext / pose-td columns
    H_pe = (jnp.einsum("fn,fjra,fjrb->nab", A, J_a, J_e)
            + jnp.einsum("fjra,fjrb->jab", J_j, J_e)).reshape(6 * NF, 6)
    H_pt = (jnp.einsum("fn,fjra,fjr->na", A, J_a, J_td)
            + jnp.einsum("fjra,fjr->ja", J_j, J_td)).reshape(6 * NF)
    H_ee = jnp.einsum("fjra,fjrb->ab", J_e, J_e)
    H_et = jnp.einsum("fjra,fjr->a", J_e, J_td)
    H_tt = jnp.einsum("fjr,fjr->", J_td, J_td)
    g_p = (jnp.einsum("fn,fjra,fjr->na", A, J_a, p_res)
           + jnp.einsum("fjra,fjr->ja", J_j, p_res)).reshape(6 * NF)
    g_e = jnp.einsum("fjra,fjr->a", J_e, p_res)
    g_t = jnp.einsum("fjr,fjr->", J_td, p_res)

    P, E, T = 6 * NF, 15 * NF, 15 * NF + 6
    H = jnp.zeros((D, D), dtype)
    H = H.at[:P, :P].set(H_pp)
    H = H.at[:P, E:E + 6].set(H_pe).at[E:E + 6, :P].set(H_pe.T)
    H = H.at[:P, T].set(H_pt).at[T, :P].set(H_pt)
    H = H.at[E:E + 6, E:E + 6].set(H_ee)
    H = H.at[E:E + 6, T].set(H_et).at[T, E:E + 6].set(H_et)
    H = H.at[T, T].set(H_tt)
    g = jnp.zeros(D, dtype)
    g = g.at[:P].set(g_p).at[E:E + 6].set(g_e).at[T].set(g_t)

    # small dense row groups: IMU + prior + anchor + ZUPT
    imu_fn = jax.vmap(lambda i: _imu_factor_rows(state, meas, cfg, i))
    i_res, (J_pi, J_pj, J_si, J_sj), i_w = imu_fn(
        jnp.arange(W, dtype=jnp.int32))
    i_res = i_res * i_w[..., None]
    wi = i_w[..., None, None]
    J_pi, J_pj, J_si, J_sj = J_pi * wi, J_pj * wi, J_si * wi, J_sj * wi
    ipose = jnp.einsum("wn,wrc->wrnc", eyeNF[:W], J_pi) + \
        jnp.einsum("wn,wrc->wrnc", eyeNF[1:W + 1], J_pj)
    isb = jnp.einsum("wn,wrc->wrnc", eyeNF[:W], J_si) + \
        jnp.einsum("wn,wrc->wrnc", eyeNF[1:W + 1], J_sj)
    i_rows = jnp.concatenate(
        [ipose.reshape(W, 15, 6 * NF), isb.reshape(W, 15, 9 * NF),
         jnp.zeros((W, 15, 13), dtype)], axis=-1)

    dx_lin = state_boxminus(state, meas.prior.lin, cfg)
    pr_res = (meas.prior.r0 + meas.prior.J0 @ dx_lin) * meas.prior.weight
    pr_rows = meas.prior.J0 * meas.prior.weight

    if anchor_ref is None:
        anchor_ref = (state.p[0], state.q[0])
    a_res, a_rows = _anchor_rows(state, anchor_ref, cfg, meas.prior.weight,
                 pin_rp=meas.anchor_pin_rp)

    extra_res, extra_rows = [], []
    if meas.zupt_w is not None:
        z_res = (meas.zupt_w[:, None] * state.v).reshape(-1)
        zrows = jnp.zeros((NF, 3, D), dtype)
        for i_f in range(NF):
            zrows = zrows.at[i_f, :, 6 * NF + 9 * i_f: 6 * NF + 9 * i_f + 3]\
                .set(jnp.eye(3, dtype=dtype))
        zrows = zrows * meas.zupt_w[:, None, None]
        extra_res.append(z_res)
        extra_rows.append(zrows.reshape(-1, D))

    r_s = jnp.concatenate([i_res.reshape(-1), pr_res, a_res] + extra_res)
    J_s = jnp.concatenate([i_rows.reshape(-1, D), pr_rows, a_rows]
                          + extra_rows)
    H = H + J_s.T @ J_s
    g = g + J_s.T @ r_s

    # landmark blocks
    lp_a = jnp.einsum("fn,fa->fna", A, jnp.einsum("fjr,fjra->fa", p_rho, J_a))
    lp_j = jnp.einsum("fjr,fjra->fja", p_rho, J_j)
    H_lp = jnp.concatenate(
        [(lp_a + lp_j).reshape(F, 6 * NF), jnp.zeros((F, 9 * NF), dtype),
         jnp.einsum("fjr,fjra->fa", p_rho, J_e),
         jnp.einsum("fjr,fjr->f", p_rho, J_td)[:, None],
         jnp.zeros((F, 6), dtype)], axis=1)
    h_ll = jnp.einsum("fjr,fjr->f", p_rho, p_rho)
    g_l = jnp.einsum("fjr,fjr->f", p_rho, p_res)
    return H, g, H_lp, h_ll, g_l


def schur_solve(H, g, H_lp, h_ll, g_l, lam, cfg: WindowConfig):
    """Damped Schur-reduced solve.

    H_red = H − H_plᵀ diag(1/h_ll) H_pl  (DENSE_SCHUR's landmark elimination,
    cf. Ceres schur_eliminator; reference solves with DENSE_SCHUR at
    estimator.cpp:795). Landmark back-substitution follows. LM damping is
    multiplicative on the diagonal (Marquardt scaling).
    """
    dtype = H.dtype
    # the Schur reduction + factorization run in f64 (identity when x64 is
    # off): H − H_lpᵀ diag⁻¹ H_lp cancels catastrophically in f32 when
    # landmark information dominates; the promoted block is only
    # [F,D]·[D,D]-sized — negligible next to the einsum assembly even under
    # TPU f64 emulation (SURVEY.md §7 hard part 4)
    H = H.astype(jnp.float64)
    g = g.astype(jnp.float64)
    H_lp = H_lp.astype(jnp.float64)
    h_ll = h_ll.astype(jnp.float64)
    g_l = g_l.astype(jnp.float64)
    lam = lam.astype(jnp.float64)
    h_ll_d = h_ll * (1.0 + lam) + 1e-12           # damp landmarks too
    inv_h = jnp.where(h_ll > 1e-10, 1.0 / h_ll_d, 0.0)
    H_red = H - jnp.einsum("fd,f,fe->de", H_lp, inv_h, H_lp)
    g_red = g - H_lp.T @ (inv_h * g_l)

    diag = jnp.diagonal(H_red)
    damp = lam * jnp.maximum(diag, 1e-8) + 1e-10
    A = H_red + jnp.diag(damp)
    # Jacobi preconditioning: the IMU whitening spreads H's diagonal over
    # ~10 decades, which wrecks a float32 Cholesky on TPU; normalizing to a
    # unit diagonal keeps the factorization well-scaled (SURVEY.md §7
    # hard part 4 mixed-precision plan).
    dscale = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(A), 1e-20))
    An = A * dscale[:, None] * dscale[None, :]
    if cfg.fast_chol:
        from anticipated_vins_mono_tpu.ops.blocked_chol import (
            blocked_cho_solve, blocked_cholesky)
        L, Linv, D0 = blocked_cholesky(An)
        y = -blocked_cho_solve(L, Linv, D0, g_red * dscale)
    else:
        L = jnp.linalg.cholesky(An)
        y = -jax.scipy.linalg.cho_solve((L, True), g_red * dscale)
    dx = y * dscale
    d_rho = -inv_h * (g_l + H_lp @ dx)
    # predicted cost reduction of the damped quadratic model (for the LM
    # gain ratio); landmark part uses its own damping term.
    pred = 0.5 * jnp.sum(dx * (damp * dx - g_red)) + \
        0.5 * jnp.sum(d_rho * (lam * h_ll * d_rho - g_l))
    return dx.astype(dtype), d_rho.astype(dtype), pred


def schur_solve_df(H, g, H_lp, h_ll, g_l, lam, cfg: WindowConfig):
    """`schur_solve` with native-f32 double-float accumulation (ops/df32)
    in place of the f64 casts — the TPU accuracy path (no x64 emulation).

    The delicate steps, each kept as (hi, lo) pairs:
    - the Schur cancellation H − H_lpᵀ diag⁻¹ H_lp (exact products,
      compensated accumulation over landmarks);
    - the reduced gradient g − H_lpᵀ(diag⁻¹ g_l);
    - the damped, Jacobi-normalized solve: f32 Cholesky + 2 rounds of
      iterative refinement with DF residuals (classical mixed precision —
      forward error ~eps_f32 of the TRUE solution, not κ·eps);
    - landmark back-substitution and the LM model-reduction `pred`.
    Everything else (assembly) is plain f32, which round-2 CPU evidence
    showed is sufficient (results/mixed_precision_cpu.json).
    """
    from anticipated_vins_mono_tpu.ops import df32

    h_ll_d = h_ll * (1.0 + lam) + 1e-12
    inv_h = jnp.where(h_ll > 1e-10, 1.0 / h_ll_d, 0.0)
    C = df32.outer_acc(H_lp, inv_h)                       # DF [D,D]
    H_red = df32.sub(df32.df(H), C)
    g_corr = df32.matmul_acc(H_lp, g_l[:, None], w=inv_h)  # DF [D,1]
    g_red = df32.sub(df32.df(g), df32.DF(g_corr.hi[:, 0], g_corr.lo[:, 0]))

    diag = df32.to_f32(df32.DF(jnp.diagonal(H_red.hi),
                               jnp.diagonal(H_red.lo)))
    damp = lam * jnp.maximum(diag, 1e-8) + 1e-10
    # add damping to the diagonal pair-preserving
    d_hi, e = df32.two_sum(jnp.diagonal(H_red.hi), damp)
    d_lo = jnp.diagonal(H_red.lo) + e
    eye = jnp.eye(H.shape[0], dtype=H.dtype)
    A = df32.DF(H_red.hi * (1 - eye) + jnp.diag(d_hi),
                H_red.lo * (1 - eye) + jnp.diag(d_lo))
    # Jacobi normalization: any consistent scale is algebraically exact,
    # so plain-f32 scale values are fine
    dscale = jax.lax.rsqrt(jnp.maximum(d_hi + d_lo, 1e-20))
    S = dscale[:, None] * dscale[None, :]
    An = df32.mul_f(A, S)
    gn = df32.mul_f(g_red, dscale)
    y = df32.cho_solve_refined(An, gn, iters=2)
    dx = -y * dscale

    # landmark back-substitution with a compensated H_lp @ dx
    p, e = df32.two_prod(H_lp, dx[None, :])
    hd = df32.add_f(df32.tree_sum(p, axis=1), jnp.sum(e, axis=1))
    d_rho = -inv_h * df32.to_f32(df32.add_f(hd, g_l))

    # predicted reduction: dxᵀ(damp·dx − g_red)/2 + landmark part, in DF
    t1 = df32.tree_sum(dx * (damp * dx), axis=0)
    t2_p, t2_e = df32.two_prod(dx, g_red.hi)
    t2 = df32.add_f(df32.tree_sum(t2_p, axis=0),
                    jnp.sum(t2_e + dx * g_red.lo, axis=0))
    lp = jnp.sum(d_rho * (lam * h_ll * d_rho - g_l))
    pred = 0.5 * (df32.to_f32(df32.sub(t1, t2)) + lp)
    return dx, d_rho, pred


@functools.partial(jax.jit, static_argnames=("cfg",))
def lm_solve(state: WindowState, meas: WindowMeasurements, cfg: WindowConfig):
    """Fixed-iteration branchless Levenberg-Marquardt.

    The whole solve — linearize, normal equations, Schur, Cholesky, retract,
    accept/reject — is one XLA program; batching over scenarios is an outer
    vmap. Returns (state, diagnostics dict).
    """

    anchor_ref = (state.p[0], state.q[0])
    use_df = cfg.accum == "df32"
    if use_df:
        from anticipated_vins_mono_tpu.ops import df32

    def body(_, carry):
        st, lam, cost = carry
        if meas.relo_pts is None:
            H, g, H_lp, h_ll, g_l = normal_equations_fast(
                st, meas, cfg, anchor_ref)
        else:
            r_all, J_all, p_res, p_rows, p_rho, p_sq = linearize(
                st, meas, cfg, anchor_ref)
            H, g, H_lp, h_ll, g_l = build_normal_equations(
                r_all, J_all, p_res, p_rows, p_rho, cfg)
        if cfg.pallas_schur:
            from anticipated_vins_mono_tpu.ops.pallas_kernels import \
                schur_solve_fused
            dx, d_rho, pred = schur_solve_fused(H, g, H_lp, h_ll, g_l, lam)
            dx = dx.astype(st.p.dtype)
            d_rho = d_rho.astype(st.p.dtype)
        elif use_df:
            dx, d_rho, pred = schur_solve_df(H, g, H_lp, h_ll, g_l, lam, cfg)
        else:
            dx, d_rho, pred = schur_solve(H, g, H_lp, h_ll, g_l, lam, cfg)
        # a failed factorization (possible in f32 when λ underflows the
        # representable curvature) yields NaN dx; the branchless blend below
        # multiplies by 0 — which does NOT stop NaN (0·NaN = NaN). Sanitize
        # the step and treat the iteration as rejected instead.
        finite = (jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(d_rho))
                  & jnp.isfinite(pred))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        d_rho = jnp.where(jnp.isfinite(d_rho), d_rho, 0.0)
        cand = retract(st, dx, d_rho, cfg)
        # NOTE: carrying the candidate's linearization across iterations to
        # skip this residual pass was tried and is SLOWER on TPU — blending
        # the [N,D] Jacobian pytrees through the branchless accept/reject is
        # bandwidth-bound and costs more than the residual re-evaluation.
        if use_df:
            new_cost = robust_cost_df(cand, meas, cfg, anchor_ref)
            # the compensated difference keeps the ~1e-7-relative cost drop
            # that decides accept/reject (the f32 sums alone cannot)
            drop = df32.to_f32(df32.sub(cost, new_cost))
            ok = (drop > 0) & (pred > 0) & finite
        else:
            new_cost = robust_cost(cand, meas, cfg, anchor_ref)
            drop = cost - new_cost
            ok = (new_cost < cost) & (pred > 0) & finite
        rho = (drop / jnp.maximum(pred, 1e-30))\
            .astype(lam.dtype)   # keep the fori_loop carry dtype stable
        okf = ok.astype(dx.dtype)
        sel = lambda a, b: okf * b + (1.0 - okf) * a
        st_next = jax.tree_util.tree_map(sel, st, cand)
        st_next = st_next._replace(q=lie.quat_normalize(st_next.q),
                                   qic=lie.quat_normalize(st_next.qic))
        if cfg.lm_strategy == "nielsen":
            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_next = jnp.where(ok, lam * shrink, lam * 2.0)
        else:
            lam_next = jnp.where(ok, lam * cfg.lm_lambda_down,
                                 lam * cfg.lm_lambda_up)
        lam_floor = 1e-7 if use_df else 1e-12
        lam_next = jnp.clip(lam_next, lam_floor, 1e8)
        if use_df:
            cost_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, b, a), cost, new_cost)
        else:
            cost_next = jnp.where(ok, new_cost, cost)
        return st_next, lam_next, cost_next

    lam0 = jnp.asarray(cfg.lm_lambda_init, state.p.dtype)
    if use_df:
        cost0 = robust_cost_df(state, meas, cfg, anchor_ref)
        st, lam, cost = jax.lax.fori_loop(
            0, cfg.iters, body, (state, lam0, cost0))
        return st, {"cost0": df32.to_f32(cost0),
                    "cost": df32.to_f32(cost), "lambda": lam,
                    "imu_chi2": imu_chi2_mean(st, meas, cfg),
                    "prior_chi2": prior_chi2(st, meas, cfg)}
    cost0 = robust_cost(state, meas, cfg, anchor_ref)
    st, lam, cost = jax.lax.fori_loop(
        0, cfg.iters, body, (state, lam0, cost0))
    return st, {"cost0": cost0, "cost": cost, "lambda": lam,
                "imu_chi2": imu_chi2_mean(st, meas, cfg),
                "prior_chi2": prior_chi2(st, meas, cfg)}
