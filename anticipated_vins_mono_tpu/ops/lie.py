"""SO(3)/SE(3)/quaternion primitives — the L0 math substrate.

Capability parity with the reference `Utility` helpers
(/root/reference/vins_estimator/src/utility/utility.h:11-167: deltaQ,
skewSymmetric, Qleft, Qright, R2ypr, ypr2R, g2R, logdet), written as pure,
vmappable JAX functions with static shapes.

Quaternion convention: Hamilton, stored as `[w, x, y, z]` (matches Eigen's
`Quaterniond(w,x,y,z)` constructor order used throughout the reference).
All functions broadcast over leading batch dimensions via `vmap`/`jnp`
broadcasting and are safe to `jit`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Quaternion algebra
# ----------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q: jax.Array, p: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ p, both [..., 4] in wxyz."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v [...,3] by unit quaternion(s) q [...,4].

    Uses the expanded Rodrigues form (no intermediate 3x3 materialization),
    which XLA fuses into a handful of VPU ops.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion [...,4] → rotation matrix [...,3,3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] → unit quaternion [...,4] (wxyz, w>=0).

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the numerically best by the largest diagonal combination — avoids
    data-dependent control flow so it vmaps/jits cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the max.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5

    c0 = jnp.stack([qw[..., 0],
                    (m21 - m12) / (4 * qw[..., 0]),
                    (m02 - m20) / (4 * qw[..., 0]),
                    (m10 - m01) / (4 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]),
                    qw[..., 1],
                    (m01 + m10) / (4 * qw[..., 1]),
                    (m02 + m20) / (4 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]),
                    (m01 + m10) / (4 * qw[..., 2]),
                    qw[..., 2],
                    (m12 + m21) / (4 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]),
                    (m02 + m20) / (4 * qw[..., 3]),
                    (m12 + m21) / (4 * qw[..., 3]),
                    qw[..., 3]], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [...,4cand,4]
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ----------------------------------------------------------------------------
# so(3) maps and the reference Utility helpers
# ----------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [...,3,3] of v [...,3].

    Reference: Utility::skewSymmetric (utility/utility.h:76-84).
    """
    z = jnp.zeros_like(v[..., 0])
    m = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def delta_q(theta: jax.Array) -> jax.Array:
    """Small-angle rotation vector [...,3] → quaternion [...,4].

    First-order approximant matching the reference
    Utility::deltaQ (utility/utility.h:64-74): q = [1, θ/2], then normalized.
    Used in preintegration propagation and manifold retraction.
    """
    half = 0.5 * theta
    w = jnp.ones_like(half[..., :1])
    return quat_normalize(jnp.concatenate([w, half], axis=-1))


def exp_so3_quat(theta: jax.Array) -> jax.Array:
    """Exact SO(3) exponential as a quaternion (for larger angles)."""
    angle = jnp.linalg.norm(theta, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-7
    # sinc(half)/2, guarded for the small-angle limit.
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-20))
    w = jnp.cos(half)
    return jnp.concatenate([w, k * theta], axis=-1)


def log_so3(q: jax.Array) -> jax.Array:
    """Unit quaternion [...,4] → rotation vector [...,3] (inverse of exp)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(vn < 1e-7, 2.0 / jnp.maximum(w, 1e-7), angle / jnp.maximum(vn, 1e-20))
    return k * q[..., 1:]


def q_left(q: jax.Array) -> jax.Array:
    """Left quaternion product matrix: q ⊗ p = Qleft(q) @ p (wxyz layout).

    Reference: Utility::Qleft (utility/utility.h:86-95).
    """
    w = q[..., 0]
    v = q[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_left = v[..., :, None]
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def q_right(p: jax.Array) -> jax.Array:
    """Right quaternion product matrix: q ⊗ p = Qright(p) @ q (wxyz layout).

    Reference: Utility::Qright (utility/utility.h:97-106).
    """
    w = p[..., 0]
    v = p[..., 1:]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom_left = v[..., :, None]
    bottom_right = w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rot_to_ypr(R: jax.Array) -> jax.Array:
    """Rotation matrix → yaw/pitch/roll in degrees.

    Reference: Utility::R2ypr (utility/utility.h:108-122).
    """
    n, o, a = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    yaw = jnp.arctan2(n[..., 1], n[..., 0])
    pitch = jnp.arctan2(-n[..., 2],
                        n[..., 0] * jnp.cos(yaw) + n[..., 1] * jnp.sin(yaw))
    roll = jnp.arctan2(
        a[..., 0] * jnp.sin(yaw) - a[..., 1] * jnp.cos(yaw),
        -o[..., 0] * jnp.sin(yaw) + o[..., 1] * jnp.cos(yaw),
    )
    return jnp.stack([yaw, pitch, roll], axis=-1) / jnp.pi * 180.0


def ypr_to_rot(ypr_deg: jax.Array) -> jax.Array:
    """Yaw/pitch/roll (degrees) → rotation matrix Rz(y)Ry(p)Rx(r).

    Reference: Utility::ypr2R (utility/utility.h:124-141).
    """
    y, p, r = jnp.moveaxis(ypr_deg / 180.0 * jnp.pi, -1, 0)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    one = jnp.ones_like(y)
    zero = jnp.zeros_like(y)
    Rz = jnp.stack([cy, -sy, zero, sy, cy, zero, zero, zero, one],
                   axis=-1).reshape(y.shape + (3, 3))
    Ry = jnp.stack([cp, zero, sp, zero, one, zero, -sp, zero, cp],
                   axis=-1).reshape(y.shape + (3, 3))
    Rx = jnp.stack([one, zero, zero, zero, cr, -sr, zero, sr, cr],
                   axis=-1).reshape(y.shape + (3, 3))
    return Rz @ Ry @ Rx


def gravity_to_rot(g: jax.Array) -> jax.Array:
    """Rotation R0 aligning measured gravity g to +z with zero yaw.

    Reference: Utility::g2R (utility/utility.cpp, used at estimator.cpp:416-426
    and initial alignment) — rotate ĝ onto e_z then remove induced yaw.
    """
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.array([0.0, 0.0, 1.0], dtype=g.dtype)
    axis = jnp.cross(ng1, ng2)
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(ng1 * ng2, axis=-1, keepdims=True)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, 1e-12)
    R0 = quat_to_rot(exp_so3_quat(axis * angle))
    yaw = rot_to_ypr(R0)[..., 0]
    fix = ypr_to_rot(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return fix @ R0


# ----------------------------------------------------------------------------
# Pose boxplus (manifold retraction)
# ----------------------------------------------------------------------------


def pose_boxplus(p: jax.Array, q: jax.Array, dx: jax.Array):
    """SE(3)-style retraction: p += δp; q ← q ⊗ deltaQ(δθ).

    Matches the reference PoseLocalParameterization::Plus
    (factor/pose_local_parameterization.cpp:3-21): translation is additive,
    rotation is a *right* quaternion perturbation. dx is [...,6] = (δp, δθ).
    """
    return p + dx[..., :3], quat_normalize(quat_mul(q, delta_q(dx[..., 3:6])))


# ----------------------------------------------------------------------------
# Linear algebra helpers
# ----------------------------------------------------------------------------


def logdet_psd(M: jax.Array) -> jax.Array:
    """log-determinant of an SPD matrix via Cholesky.

    Reference: Utility::logdet (utility/utility.h:143-167), which also uses
    an LLT path. Batched: accepts [...,n,n].
    """
    L = jnp.linalg.cholesky(M)
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(d), axis=-1)
