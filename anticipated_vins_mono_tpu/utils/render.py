"""Textured-world renderer: full-resolution imagery along EuRoC GT
trajectories.

Raw EuRoC imagery is not shipped with the reference (it distributes only the
GT CSVs, /root/reference/benchmark_publisher/config/*/data.csv), but the
full-fidelity evaluation path of the reference — camera images → CLAHE → LK
tracking → selection → estimation (feature_tracker.cpp:27-138) — needs
pixels. This module renders a deterministic, richly-textured axis-aligned
box world around the GT trajectory and ray-casts 752×480 views through the
*real* EuRoC camera model (including radtan distortion, inverted per pixel
once via lift_projective), so the tracker is exercised with realistic
optics, parallax, and motion blur-free imagery at the true motion.

TPU-first: the renderer is one jitted program — per-pixel ray → AABB exit
intersection → multi-octave 3-D value noise (hashed lattice gathers +
trilinear blends). No data-dependent control flow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import cameras

_LATTICE_BITS = 16
_LATTICE_N = 1 << _LATTICE_BITS


class BoxWorld(NamedTuple):
    lo: jax.Array        # [3] box min corner
    hi: jax.Array        # [3] box max corner
    lattice: jax.Array   # [_LATTICE_N] random values in [0,1)
    octaves: jax.Array   # [K] spatial frequencies (cycles / meter)
    weights: jax.Array   # [K] octave amplitudes


def make_box_world(traj_p: np.ndarray, margin: float = 4.0,
                   seed: int = 0) -> BoxWorld:
    """Box walls `margin` meters beyond the trajectory's bounding box."""
    rng = np.random.default_rng(seed)
    lo = traj_p.min(0) - margin
    hi = traj_p.max(0) + margin
    octaves = np.array([0.45, 0.9, 1.8, 3.6, 7.2], np.float32)
    weights = np.array([0.42, 0.27, 0.17, 0.09, 0.05], np.float32)
    return BoxWorld(
        lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32),
        lattice=jnp.asarray(rng.random(_LATTICE_N), jnp.float32),
        octaves=jnp.asarray(octaves), weights=jnp.asarray(weights))


def _hash3(ix: jax.Array, iy: jax.Array, iz: jax.Array) -> jax.Array:
    """Integer lattice hash → index into the value table."""
    h = (ix * 73856093) ^ (iy * 19349663) ^ (iz * 83492791)
    return (h & (_LATTICE_N - 1)).astype(jnp.int32)


def _value_noise(lattice: jax.Array, X: jax.Array) -> jax.Array:
    """Trilinear 3-D value noise at points X [...,3] (unit lattice)."""
    Xf = jnp.floor(X)
    f = X - Xf
    f = f * f * (3.0 - 2.0 * f)          # smoothstep fade
    I = Xf.astype(jnp.int32)

    def corner(dx, dy, dz):
        idx = _hash3(I[..., 0] + dx, I[..., 1] + dy, I[..., 2] + dz)
        return jnp.take(lattice, idx)

    wx, wy, wz = f[..., 0], f[..., 1], f[..., 2]
    c00 = corner(0, 0, 0) * (1 - wx) + corner(1, 0, 0) * wx
    c10 = corner(0, 1, 0) * (1 - wx) + corner(1, 1, 0) * wx
    c01 = corner(0, 0, 1) * (1 - wx) + corner(1, 0, 1) * wx
    c11 = corner(0, 1, 1) * (1 - wx) + corner(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c10 * wy
    c1 = c01 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def _texture(world: BoxWorld, X: jax.Array) -> jax.Array:
    """Multi-octave noise + quantization → corner-rich wall texture."""
    v = jnp.zeros(X.shape[:-1], jnp.float32)
    for k in range(world.octaves.shape[0]):
        v = v + world.weights[k] * _value_noise(world.lattice,
                                                X * world.octaves[k])
    # mild posterization sharpens blobs into trackable corner structure
    steps = 7.0
    vq = jnp.floor(v * steps) / steps
    return jnp.clip(0.15 + 0.8 * (0.35 * v + 0.65 * vq * 1.18), 0.0, 1.0)


def camera_rays(cam) -> jax.Array:
    """Per-pixel unit ray directions [H*W, 3] in the camera frame (inverts
    the radtan distortion once; reused across all frames)."""
    H, W = cam.height, cam.width
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2), jnp.float32)
    rays = cameras.lift_projective(cam, uv)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


@jax.jit
def render_rays(world: BoxWorld, rays_c: jax.Array, p_wc: jax.Array,
                R_wc: jax.Array) -> jax.Array:
    """Ray-cast one frame: camera at (p_wc, R_wc), rays [N,3] → values [N].

    The camera is inside the AABB, so each ray hits the exit face: per axis
    the positive boundary distance, then the minimum across axes.
    """
    d = rays_c @ R_wc.T                                   # [N,3] world dirs
    d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t_axis = jnp.where(d > 0,
                       (world.hi[None, :] - p_wc[None, :]) / d,
                       (world.lo[None, :] - p_wc[None, :]) / d)   # [N,3]
    t_hit = jnp.min(t_axis, axis=-1)
    X = p_wc[None, :] + t_hit[:, None] * d
    # slight per-face shading so edges between faces are visible
    face = jnp.argmin(t_axis, axis=-1)
    shade = 1.0 - 0.06 * face.astype(jnp.float32)
    return jnp.clip(_texture(world, X) * shade, 0.0, 1.0)


def render_frame(world: BoxWorld, cam, rays_c: jax.Array,
                 p_wc: np.ndarray, R_wc: np.ndarray) -> np.ndarray:
    """[H,W] float image for one camera pose."""
    vals = render_rays(world, rays_c, jnp.asarray(p_wc, jnp.float32),
                       jnp.asarray(R_wc, jnp.float32))
    return np.asarray(vals).reshape(cam.height, cam.width)


def backproject(world: BoxWorld, cam, uv: np.ndarray, p_wc: np.ndarray,
                R_wc: np.ndarray) -> np.ndarray:
    """Pixel coords [N,2] → 3-D hit points on the box walls (the renderer's
    exact ray-AABB geometry) for the camera at (p_wc, R_wc). Grounds image
    corners as world landmarks: a detected texture corner backprojected here
    IS a revisit-consistent wall point (the visual anchor BRIEF matching
    needs across visits)."""
    rays = np.array(cameras.lift_projective(
        cam, jnp.asarray(uv, jnp.float32)))
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    d = rays @ np.asarray(R_wc).T
    d = np.where(np.abs(d) < 1e-9, 1e-9, d)
    lo, hi = np.asarray(world.lo), np.asarray(world.hi)
    t_axis = np.where(d > 0, (hi[None] - p_wc[None]) / d,
                      (lo[None] - p_wc[None]) / d)
    t_hit = t_axis.min(-1)
    return p_wc[None] + t_hit[:, None] * d
