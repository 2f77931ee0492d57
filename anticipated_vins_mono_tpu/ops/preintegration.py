"""IMU preintegration as a `lax.scan` — TPU-native form of the reference's
per-sample propagation loop.

Capability parity with IntegrationBase
(/root/reference/vins_estimator/src/factor/integration_base.h):
- midpoint-rule propagation of (Δp, Δq, Δv)           (midPointIntegration, :54-128)
- 15x15 first-order bias Jacobian J and covariance P  (F/V matrices, :90-125)
- `repropagate` on bias update                        (:38-52)
- bias-corrected delta evaluation for the factor      (evaluate, :160-186)

Design differences (TPU-first):
- raw IMU samples live in *padded, masked* static-shape buffers
  [MAX_SAMPLES, ...]; invalid samples carry dt=0, which makes the midpoint
  update an exact no-op — masking by construction, no `cond` needed;
- the whole propagation is one `lax.scan`, vmappable over the window's
  frame-pairs AND over scenario batches (the reference loops per sample on
  one CPU thread);
- covariance/Jacobian propagation is 15x15 matmuls — batched onto the MXU.

State-block layout (matches integration_base.h O_P..O_BG = 0,3,6,9,12):
  [0:3]=δp, [3:6]=δθ, [6:9]=δv, [9:12]=δba, [12:15]=δbg.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie


class ImuNoise(NamedTuple):
    """Continuous-time IMU noise densities (config euroc_config.yaml:44-49)."""

    acc_n: float = 0.08
    gyr_n: float = 0.004
    acc_w: float = 0.00004
    gyr_w: float = 2.0e-6
    dt_ref: float = 0.005  # nominal sample period the noise values assume

    def noise_cov18(self, dtype=jnp.float64) -> jax.Array:
        """18x18 diagonal noise covariance, layout matching
        integration_base.h:21-27 (na0, ng0, na1, ng1, nba, nbg)."""
        d = jnp.concatenate([
            jnp.full((3,), self.acc_n**2),
            jnp.full((3,), self.gyr_n**2),
            jnp.full((3,), self.acc_n**2),
            jnp.full((3,), self.gyr_n**2),
            jnp.full((3,), self.acc_w**2),
            jnp.full((3,), self.gyr_w**2),
        ]).astype(dtype)
        return jnp.diag(d)


class Preintegrated(NamedTuple):
    """Result of preintegrating one frame-to-frame IMU batch."""

    dp: jax.Array        # [...,3]  Δ position
    dq: jax.Array        # [...,4]  Δ orientation (wxyz)
    dv: jax.Array        # [...,3]  Δ velocity
    J: jax.Array         # [...,15,15] first-order Jacobian w.r.t. (state, biases)
    P: jax.Array         # [...,15,15] covariance
    dt_sum: jax.Array    # [...]    total integration time
    ba: jax.Array        # [...,3]  linearization accel bias
    bg: jax.Array        # [...,3]  linearization gyro bias
    S: jax.Array = None  # [...,15,15] whitening sqrt-info (L⁻¹ of P=LLᵀ),
    #                      precomputed once — the factor re-whitens per LM
    #                      iteration otherwise (imu_factor.h:64-66 analog)


def _midpoint_step(carry, inp, noise_cov, with_cov, dt_ref):
    """One midpoint update. Mirrors midPointIntegration
    (integration_base.h:54-128) including the F,V block structure at :90-125.

    carry: (dp, dq, dv, J, P, acc_prev, gyr_prev, ba, bg, dt_sum)
    inp:   (dt, acc, gyr); dt == 0 rows are exact no-ops (padding).
    """
    dp, dq, dv, J, P, acc0, gyr0, ba, bg, dt_sum = carry
    dt, acc1, gyr1 = inp
    dtype = dp.dtype

    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    dq_new = lie.quat_normalize(lie.quat_mul(dq, lie.delta_q(un_gyr * dt)))
    un_acc0 = lie.quat_rotate(dq, acc0 - ba)
    un_acc1 = lie.quat_rotate(dq_new, acc1 - ba)
    un_acc = 0.5 * (un_acc0 + un_acc1)
    dp_new = dp + dv * dt + 0.5 * un_acc * dt * dt
    dv_new = dv + un_acc * dt

    if with_cov:
        I3 = jnp.eye(3, dtype=dtype)
        R0 = lie.quat_to_rot(dq)
        R1 = lie.quat_to_rot(dq_new)
        a0x = lie.skew(acc0 - ba)
        a1x = lie.skew(acc1 - ba)
        wx = lie.skew(un_gyr)

        # F blocks (integration_base.h:90-108)
        f_pq = -0.25 * R0 @ a0x * dt * dt + \
            -0.25 * R1 @ a1x @ (I3 - wx * dt) * dt * dt
        f_pv = I3 * dt
        f_pba = -0.25 * (R0 + R1) * dt * dt
        f_pbg = 0.25 * R1 @ a1x * dt * dt * dt
        f_qq = I3 - wx * dt
        f_qbg = -I3 * dt
        f_vq = -0.5 * R0 @ a0x * dt + -0.5 * R1 @ a1x @ (I3 - wx * dt) * dt
        f_vba = -0.5 * (R0 + R1) * dt
        f_vbg = 0.5 * R1 @ a1x * dt * dt

        Z = jnp.zeros((3, 3), dtype=dtype)
        F = jnp.block([
            [I3, f_pq, f_pv, f_pba, f_pbg],
            [Z, f_qq, Z, Z, f_qbg],
            [Z, f_vq, I3, f_vba, f_vbg],
            [Z, Z, Z, I3, Z],
            [Z, Z, Z, Z, I3],
        ])

        # V blocks (integration_base.h:110-125)
        v_p0 = 0.25 * R0 * dt * dt
        v_pq = -0.125 * R1 @ a1x * dt * dt * dt  # 0.25 * R1 a1x dt^2 * 0.5 dt
        v_p1 = 0.25 * R1 * dt * dt
        v_q = 0.5 * I3 * dt
        v_v0 = 0.5 * R0 * dt
        v_vq = -0.25 * R1 @ a1x * dt * dt
        v_v1 = 0.5 * R1 * dt
        V = jnp.block([
            [v_p0, v_pq, v_p1, v_pq, Z, Z],
            [Z, v_q, Z, v_q, Z, Z],
            [v_v0, v_vq, v_v1, v_vq, Z, Z],
            [Z, Z, Z, Z, I3 * dt, Z],
            [Z, Z, Z, Z, Z, I3 * dt],
        ])

        J_new = F @ J
        # Noise model follows the reference convention (per-sample values at
        # the nominal rate, integration_base.h:21-27) — exactly preserved
        # for dt == dt_ref. Samples SPANNING LONGER intervals (dt-weighted
        # decimation of merged non-keyframe buffers) carry unmodeled
        # quadrature error; their noise is inflated by (dt/dt_ref)², which
        # keeps multi-second merged pairs honestly weak instead of dragging
        # the window at ~27σ during long hovers.
        nscale = jnp.maximum(dt / dt_ref, 1.0) ** 2
        P_new = F @ P @ F.T + nscale * (V @ noise_cov @ V.T)
    else:
        J_new, P_new = J, P

    # dt == 0 (padding) must be an exact no-op; the update already is one
    # for dp/dv/dt_sum, and delta_q(0)=identity for dq, F=I,V=0 for J/P.
    new_carry = (dp_new, dq_new, dv_new, J_new, P_new,
                 acc1, gyr1, ba, bg, dt_sum + dt)
    return new_carry, None


def preintegrate(dts: jax.Array, accs: jax.Array, gyrs: jax.Array,
                 acc0: jax.Array, gyr0: jax.Array,
                 ba: jax.Array, bg: jax.Array,
                 noise: ImuNoise,
                 with_cov: bool = True) -> Preintegrated:
    """Preintegrate a (padded) IMU batch between two frames.

    Args:
      dts:  [N] per-sample dt; 0 for padding rows (exact no-op).
      accs: [N,3], gyrs: [N,3] raw samples at the *end* of each dt.
      acc0/gyr0: the sample at the start of the interval
        (reference: linearized_acc/gyr, integration_base.h:16-18).
      ba/bg: linearization-point biases.

    Replaces IntegrationBase::propagate's per-sample loop
    (integration_base.h:130-158) with one `lax.scan`; vmap over frame pairs
    and scenario batches for MXU utilization.
    """
    dtype = accs.dtype
    ncov = noise.noise_cov18(dtype)
    init = (
        jnp.zeros(3, dtype), lie.quat_identity(dtype), jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype), jnp.zeros((15, 15), dtype),
        acc0.astype(dtype), gyr0.astype(dtype),
        ba.astype(dtype), bg.astype(dtype), jnp.zeros((), dtype),
    )

    def step(carry, inp):
        return _midpoint_step(carry, inp, ncov, with_cov, noise.dt_ref)

    carry, _ = jax.lax.scan(step, init, (dts.astype(dtype), accs, gyrs))
    dp, dq, dv, J, P, _, _, _, _, dt_sum = carry
    S = None
    if with_cov:
        L = jnp.linalg.cholesky(P + 1e-11 * jnp.eye(15, dtype=dtype))
        S = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(15, dtype=dtype), lower=True)
    return Preintegrated(dp, dq, dv, J, P, dt_sum, ba.astype(dtype),
                         bg.astype(dtype), S)


def corrected_deltas(pre: Preintegrated, ba: jax.Array, bg: jax.Array):
    """First-order bias-corrected deltas (integration_base.h:160-174).

    Returns (dp, dq, dv) at the new biases using the preintegrated Jacobian —
    the cheap alternative to `repropagate`.
    """
    dba = ba - pre.ba
    dbg = bg - pre.bg
    dp = pre.dp + pre.J[..., 0:3, 9:12] @ dba + pre.J[..., 0:3, 12:15] @ dbg
    dv = pre.dv + pre.J[..., 6:9, 9:12] @ dba + pre.J[..., 6:9, 12:15] @ dbg
    dq = lie.quat_mul(pre.dq, lie.delta_q(pre.J[..., 3:6, 12:15] @ dbg))
    return dp, lie.quat_normalize(dq), dv
