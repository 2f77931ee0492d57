"""Factor residuals for the sliding-window VIO backend — pure functions.

Capability parity with the reference's Ceres cost functions:
- IMU factor      (/root/reference/vins_estimator/src/factor/imu_factor.h:19-179)
- Projection      (factor/projection_factor.cpp:21-121)
- Projection+td   (factor/projection_td_factor.cpp:21-121)

TPU-first design: residuals are small pure functions of (state, measurement);
Jacobians w.r.t. the *minimal* tangent (6 per pose, 9 per speed/bias, 1 per
inverse depth, 1 for td) are obtained by forward-mode autodiff of
residual∘boxplus at δ=0 — exactly the analytic Jacobians the reference
hand-derives, but fused by XLA and batched with vmap over all factors.
Whitening uses the preintegrated covariance via Cholesky solves
(imu_factor.h:64-66 does LLT(P⁻¹)).

Gravity: world-frame g = (0,0,+9.81) *subtracted* the same way the reference
does (G at parameters.cpp, used as +0.5·G·dt² inside the residual).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.preintegration import Preintegrated, corrected_deltas

GRAVITY = 9.81007  # matches reference state_defs.h:37-41 (EuRoC magnitude)
FOCAL_LENGTH = 460.0  # parameters.h:13


def gravity_vec(dtype=jnp.float64) -> jax.Array:
    return jnp.array([0.0, 0.0, GRAVITY], dtype=dtype)


# ----------------------------------------------------------------------------
# IMU factor
# ----------------------------------------------------------------------------


def imu_residual_raw(p_i, q_i, v_i, ba_i, bg_i,
                     p_j, q_j, v_j, ba_j, bg_j,
                     pre: Preintegrated) -> jax.Array:
    """Unwhitened 15-vector IMU residual.

    Mirrors IntegrationBase::evaluate (integration_base.h:160-186): the
    preintegrated deltas are first-order bias-corrected, then compared with
    the state-implied deltas. Layout (O_P,O_R,O_V,O_BA,O_BG) = (0,3,6,9,12).
    """
    g = gravity_vec(p_i.dtype)
    dt = pre.dt_sum
    dp, dq, dv = corrected_deltas(pre, ba_i, bg_i)

    q_i_inv = lie.quat_conj(q_i)  # unit quaternions
    r_p = lie.quat_rotate(q_i_inv, 0.5 * g * dt * dt + p_j - p_i - v_i * dt) - dp
    r_q = 2.0 * lie.quat_mul(lie.quat_conj(dq),
                             lie.quat_mul(q_i_inv, q_j))[..., 1:4]
    r_v = lie.quat_rotate(q_i_inv, g * dt + v_j - v_i) - dv
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg], axis=-1)


def sqrt_info_from_cov(P: jax.Array, jitter: float = 1e-11) -> jax.Array:
    """Upper-triangular S with SᵀS = P⁻¹ (so ‖S r‖² = rᵀP⁻¹r).

    Reference whitening: LLT(P⁻¹).matrixL().T (imu_factor.h:64-66). We avoid
    forming P⁻¹: P = LLᵀ ⇒ S = L⁻¹ (lower-tri); use triangular solve.
    """
    n = P.shape[-1]
    L = jnp.linalg.cholesky(P + jitter * jnp.eye(n, dtype=P.dtype))
    eye = jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), P.shape)
    S = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return S


def imu_residual(p_i, q_i, v_i, ba_i, bg_i,
                 p_j, q_j, v_j, ba_j, bg_j,
                 pre: Preintegrated) -> jax.Array:
    """Whitened IMU residual (what enters the least-squares objective)."""
    r = imu_residual_raw(p_i, q_i, v_i, ba_i, bg_i,
                         p_j, q_j, v_j, ba_j, bg_j, pre)
    S = pre.S if pre.S is not None else sqrt_info_from_cov(pre.P)
    return jnp.einsum("...ij,...j->...i", S, r)


# ----------------------------------------------------------------------------
# Projection factor (inverse depth, between first observation i and frame j)
# ----------------------------------------------------------------------------


def proj_sqrt_info(dtype=jnp.float64) -> jax.Array:
    """sqrt_info = FOCAL/1.5 · I₂ (estimator.cpp:17)."""
    return (FOCAL_LENGTH / 1.5) * jnp.eye(2, dtype=dtype)


def projection_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                            inv_dep_i, pt_i, pt_j) -> jax.Array:
    """Unwhitened 2-vector reprojection residual.

    Mirrors ProjectionFactor::Evaluate (projection_factor.cpp:21-60):
    landmark at inverse depth `inv_dep_i` along the normalized ray `pt_i`
    in camera i, transformed IMU←cam (tic,qic), world←IMU_i, IMU_j←world,
    cam←IMU, then perspective-divided against `pt_j`.
    pt_i/pt_j are [...,3] normalized-plane points (z=1).
    """
    pts_cam_i = pt_i / inv_dep_i[..., None]
    pts_imu_i = lie.quat_rotate(qic, pts_cam_i) + tic
    pts_w = lie.quat_rotate(q_i, pts_imu_i) + p_i
    pts_imu_j = lie.quat_rotate(lie.quat_conj(q_j), pts_w - p_j)
    pts_cam_j = lie.quat_rotate(lie.quat_conj(qic), pts_imu_j - tic)
    z = pts_cam_j[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return pts_cam_j[..., :2] / z - pt_j[..., :2]


def projection_residual(p_i, q_i, p_j, q_j, tic, qic,
                        inv_dep_i, pt_i, pt_j) -> jax.Array:
    r = projection_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                                inv_dep_i, pt_i, pt_j)
    return (FOCAL_LENGTH / 1.5) * r


def _tangent_basis_2(u: jax.Array) -> jax.Array:
    """[...,3] unit bearing → [...,2,3] orthonormal tangent basis."""
    tmp = jnp.where(jnp.abs(u[..., 2:3]) < 0.9,
                    jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], u.dtype),
                                     u.shape),
                    jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], u.dtype),
                                     u.shape))
    b1 = jnp.cross(u, tmp)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(u, b1)
    return jnp.stack([b1, b2], axis=-2)


def projection_residual_unit_sphere(p_i, q_i, p_j, q_j, tic, qic,
                                    inv_dep_i, pt_i, pt_j) -> jax.Array:
    """UNIT_SPHERE_ERROR variant (projection_factor.cpp:36-44, used for
    wide-FOV rigs): residual = tangent-basis projection of the predicted
    bearing against the measured bearing on the unit sphere."""
    pts_cam_i = pt_i / inv_dep_i[..., None]
    pts_imu_i = lie.quat_rotate(qic, pts_cam_i) + tic
    pts_w = lie.quat_rotate(q_i, pts_imu_i) + p_i
    pts_imu_j = lie.quat_rotate(lie.quat_conj(q_j), pts_w - p_j)
    pts_cam_j = lie.quat_rotate(lie.quat_conj(qic), pts_imu_j - tic)
    pred = pts_cam_j / jnp.maximum(
        jnp.linalg.norm(pts_cam_j, axis=-1, keepdims=True), 1e-9)
    meas = pt_j / jnp.maximum(jnp.linalg.norm(pt_j, axis=-1, keepdims=True),
                              1e-9)
    B = _tangent_basis_2(meas)
    r = jnp.einsum("...ij,...j->...i", B, pred - meas)
    return (FOCAL_LENGTH / 1.5) * r


def projection_td_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                               inv_dep_i, td,
                               pt_i, pt_j, vel_i, vel_j,
                               td_i, td_j, row_i, row_j,
                               tr_over_row: float = 0.0) -> jax.Array:
    """Projection residual with time-offset td + rolling-shutter compensation.

    Mirrors ProjectionTdFactor::Evaluate (projection_td_factor.cpp:38-60):
    observations are shifted along their image velocity by
    (td - td_i + TR/ROW·row) before the standard reprojection chain.
    vel_* are [...,2] normalized-plane velocities; row_* pixel rows.
    """
    shift_i = td - td_i + tr_over_row * row_i
    shift_j = td - td_j + tr_over_row * row_j
    pt_i_c = pt_i - shift_i[..., None] * jnp.concatenate(
        [vel_i, jnp.zeros_like(vel_i[..., :1])], axis=-1)
    pt_j_c = pt_j - shift_j[..., None] * jnp.concatenate(
        [vel_j, jnp.zeros_like(vel_j[..., :1])], axis=-1)
    return projection_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                                   inv_dep_i, pt_i_c, pt_j_c)


def projection_td_residual(*args, **kw) -> jax.Array:
    return (FOCAL_LENGTH / 1.5) * projection_td_residual_raw(*args, **kw)


# ----------------------------------------------------------------------------
# Robust loss (Cauchy) — Triggs-style reweighting for IRLS/GN
# ----------------------------------------------------------------------------


def cauchy_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    """sqrt-weight w with the property: replacing r ← w·r in GN approximates
    the Cauchy-robustified problem ρ(s) = c²·log(1 + s/c²).

    Reference uses ceres::CauchyLoss(1.0) on projection factors
    (estimator.cpp:666,717) and rescales residual/Jacobian by sqrt(ρ')
    inside marginalization (marginalization_factor.cpp:33-66). We use the
    simple sqrt(ρ') reweighting (alpha=0 case).
    """
    c2 = scale * scale
    rho_p = 1.0 / (1.0 + sq_norm / c2)
    return jnp.sqrt(rho_p)


# ----------------------------------------------------------------------------
# Tangent-space Jacobians via autodiff of residual ∘ boxplus
# ----------------------------------------------------------------------------


class PoseTangent(NamedTuple):
    """Helper wrapping a pose (p,q) for tangent-space differentiation."""

    p: jax.Array
    q: jax.Array


def apply_pose_delta(pose: PoseTangent, dx6: jax.Array) -> PoseTangent:
    """Boxplus matching PoseLocalParameterization::Plus
    (factor/pose_local_parameterization.cpp:3-21)."""
    p, q = lie.pose_boxplus(pose.p, pose.q, dx6)
    return PoseTangent(p, q)


def tangent_jacobian(res_fn, poses: tuple, linear_args: tuple):
    """Jacobian of `res_fn(poses..., linear...)` w.r.t. minimal coordinates.

    `res_fn` takes len(poses) PoseTangent plus linear (vector) args and
    returns a residual vector. Returns (residual, [J_pose... , J_linear...])
    where pose Jacobians are [...xres,6] and linear ones [...xres,dim].
    Forward-mode (jacfwd) — small tangent dims, fuses under vmap.
    """
    n_p = len(poses)

    def f(*deltas):
        pd = [apply_pose_delta(poses[k], deltas[k]) for k in range(n_p)]
        la = [linear_args[k] + deltas[n_p + k] for k in range(len(linear_args))]
        return res_fn(*pd, *la)

    zeros = tuple(jnp.zeros(6, dtype=poses[0].p.dtype) for _ in range(n_p)) + \
        tuple(jnp.zeros_like(a) for a in linear_args)
    res = res_fn(*poses, *linear_args)
    jacs = jax.jacfwd(f, argnums=tuple(range(len(zeros))))(*zeros)
    return res, list(jacs)
