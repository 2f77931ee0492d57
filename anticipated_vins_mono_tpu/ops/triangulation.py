"""Batched multi-view triangulation (inverse depth in the anchor camera).

Capability parity with FeatureManager::triangulate
(/root/reference/vins_estimator/src/feature_manager.cpp:202-257): per
landmark, stack the DLT rows of every (masked) observation relative to the
anchor camera and take the smallest-singular-vector solution; depths < 0.1 m
reset to the 5 m default (feature_manager.cpp:252-256).

TPU-first: one `vmap` over the [F] landmark axis; rows for invalid
observations are zeroed, keeping the [2·NF, 4] DLT matrix static-shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.window import WindowConfig, WindowState


def _cam_poses(state: WindowState):
    """World→camera (R, t) per frame: T_cw = (T_wb · T_bc)⁻¹."""
    R_wb = lie.quat_to_rot(state.q)                # [NF,3,3]
    R_bc = lie.quat_to_rot(state.qic)              # [3,3]
    R_wc = R_wb @ R_bc
    t_wc = state.p + jnp.einsum("nij,j->ni", R_wb, state.tic)
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    t_cw = -jnp.einsum("nij,nj->ni", R_cw, t_wc)
    return R_cw, t_cw


@functools.partial(jax.jit, static_argnames=("cfg",))
def triangulate(state: WindowState, pts: jax.Array, mask: jax.Array,
                anchor: jax.Array, cfg: WindowConfig):
    """Triangulate every landmark slot.

    Args: pts [F,NF,3] normalized-plane obs; mask [F,NF]; anchor [F].
    Returns (inv_depth [F], good [F]): good=0 where depth implausible.
    """
    R_cw, t_cw = _cam_poses(state)

    def one(pt_row, m_row, a):
        # poses relative to the anchor camera: P_rel = T_j←w · T_w←a
        R_a = R_cw[a].T                     # cam_a → world rotation
        t_a = -R_cw[a].T @ t_cw[a]          # cam_a origin in world
        R_rel = R_cw @ R_a                  # [NF,3,3] cam_a → cam_j
        t_rel = jnp.einsum("nij,j->ni", R_cw, t_a) + t_cw

        # DLT rows: x·P[2] − P[0], y·P[2] − P[1] with P = [R_rel | t_rel]
        P = jnp.concatenate([R_rel, t_rel[..., None]], axis=-1)  # [NF,3,4]
        r0 = pt_row[:, 0:1] * P[:, 2] - P[:, 0]
        r1 = pt_row[:, 1:2] * P[:, 2] - P[:, 1]
        A = jnp.concatenate([r0, r1], axis=0) * jnp.concatenate(
            [m_row, m_row], axis=0)[:, None]                    # [2NF,4]
        # smallest right singular vector via eigh of AᵀA (4x4, cheap & stable)
        M = A.T @ A
        w, V = jnp.linalg.eigh(M)
        X = V[:, 0]
        depth = X[2] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        # parallax gate (round-3): with ~zero baseline (hover) the DLT depth
        # is noise-determined yet positive — MEASURED on MH_04's hover→
        # acceleration transition, a κ=30 window accumulates ~44 such
        # landmarks whose wrong depths then outvote the IMU 2-3× on scale
        # (7 m ATE; κ=10 admits 2 and holds 0.1 m). Require the subtended
        # parallax baseline/depth to exceed ~1.5 px at EuRoC focal length.
        base = jnp.max(jnp.linalg.norm(t_rel, axis=-1) * m_row)
        good = ((depth > 0.1) & (m_row.sum() >= 2)
                & (base > cfg.tri_min_parallax * depth))
        depth = jnp.where(good, depth, 5.0)   # reference default INIT_DEPTH
        return 1.0 / depth, good.astype(pt_row.dtype)

    return jax.vmap(one)(pts, mask, anchor)
