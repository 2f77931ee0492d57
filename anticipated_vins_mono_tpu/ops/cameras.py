"""Camera-model library (L1) — vmappable projection / unprojection.

Capability parity with the reference `camodocal` package
(/root/reference/camera_model): the abstract interface is
`space_to_plane` (3-D ray → pixel; Camera.h:12-22) and `lift_projective`
(pixel → normalized ray; PinholeCamera.cc:450, EquidistantCamera.cc,
CataCamera.cc). Models are NamedTuples (auto-pytrees) of parameter arrays,
so a *batch of cameras* is just a batch of leaves and every function is
`vmap`/`jit` friendly with static shapes. Undistortion is a fixed-iteration
contraction (no data-dependent loops), which XLA unrolls and fuses.

Only PINHOLE is exercised by the EuRoC path in the reference
(config/euroc/euroc_config.yaml:8); KANNALA_BRANDT and MEI are provided for
model parity. Jacobians come for free via `jax.jacfwd` (the reference's
hand-written spaceToPlane Jacobian at PinholeCamera.cc:552 is unnecessary
under autodiff).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

UNDISTORT_ITERS = 20  # fixed-point iterations for lift_projective


class PinholeCamera(NamedTuple):
    """fx fy cx cy + radial-tangential distortion (k1 k2 p1 p2).

    Reference: camera_model/src/camera_models/PinholeCamera.cc.
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array
    width: int = 752
    height: int = 480

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
               width=752, height=480, dtype=jnp.float32) -> "PinholeCamera":
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return PinholeCamera(a(fx), a(fy), a(cx), a(cy),
                             a(k1), a(k2), a(p1), a(p2), width, height)


def _radtan_distort(cam: PinholeCamera, xy: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords [...,2]."""
    x, y = xy[..., 0], xy[..., 1]
    x2, y2 = x * x, y * y
    r2 = x2 + y2
    xy2 = 2.0 * x * y
    rad = cam.k1 * r2 + cam.k2 * r2 * r2
    dx = x * rad + cam.p1 * xy2 + cam.p2 * (r2 + 2.0 * x2)
    dy = y * rad + cam.p1 * (r2 + 2.0 * y2) + cam.p2 * xy2
    return xy + jnp.stack([dx, dy], axis=-1)


def pinhole_space_to_plane(cam: PinholeCamera, P: jax.Array) -> jax.Array:
    """3-D point in camera frame [...,3] → pixel [...,2].

    Reference: PinholeCamera::spaceToPlane (PinholeCamera.cc:520-550).
    Points behind the camera are still projected (caller masks on z > 0,
    as the selector's FOV check does at feature_selector.cpp:296-307).
    """
    z = jnp.where(jnp.abs(P[..., 2:3]) < 1e-9, 1e-9, P[..., 2:3])
    xy = P[..., :2] / z
    d = _radtan_distort(cam, xy)
    u = cam.fx * d[..., 0] + cam.cx
    v = cam.fy * d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pinhole_lift_projective(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Pixel [...,2] → unit-depth ray [...,3] (normalized image plane, z=1).

    Reference: PinholeCamera::liftProjective (PinholeCamera.cc:450-518),
    recursive-undistortion branch — here a fixed UNDISTORT_ITERS-step
    contraction x_{n+1} = x_d - d(x_n), unrolled by XLA.
    """
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    xd = jnp.stack([mx, my], axis=-1)
    x = xd
    for _ in range(UNDISTORT_ITERS):
        x = xd - (_radtan_distort(cam, x) - x)
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


class EquidistantCamera(NamedTuple):
    """Kannala-Brandt fisheye: r(θ) = θ + k2 θ³ + k3 θ⁵ + k4 θ⁷ + k5 θ⁹.

    Reference: camera_model/src/camera_models/EquidistantCamera.cc.
    """

    mu: jax.Array
    mv: jax.Array
    u0: jax.Array
    v0: jax.Array
    k2: jax.Array
    k3: jax.Array
    k4: jax.Array
    k5: jax.Array
    width: int = 752
    height: int = 480

    @staticmethod
    def create(mu, mv, u0, v0, k2=0.0, k3=0.0, k4=0.0, k5=0.0,
               width=752, height=480, dtype=jnp.float32) -> "EquidistantCamera":
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return EquidistantCamera(a(mu), a(mv), a(u0), a(v0),
                                 a(k2), a(k3), a(k4), a(k5), width, height)


def _kb_r(cam: EquidistantCamera, theta: jax.Array) -> jax.Array:
    t2 = theta * theta
    return theta * (1.0 + t2 * (cam.k2 + t2 * (cam.k3 + t2 * (cam.k4 + t2 * cam.k5))))


def equidistant_space_to_plane(cam: EquidistantCamera, P: jax.Array) -> jax.Array:
    """Reference: EquidistantCamera::spaceToPlane."""
    rxy = jnp.linalg.norm(P[..., :2], axis=-1)
    theta = jnp.arctan2(rxy, P[..., 2])
    phi = jnp.arctan2(P[..., 1], P[..., 0])
    r = _kb_r(cam, theta)
    u = cam.mu * r * jnp.cos(phi) + cam.u0
    v = cam.mv * r * jnp.sin(phi) + cam.v0
    return jnp.stack([u, v], axis=-1)


def equidistant_lift_projective(cam: EquidistantCamera, uv: jax.Array) -> jax.Array:
    """Pixel → ray; inverts r(θ) with fixed Newton iterations.

    Reference: EquidistantCamera::liftProjective + backprojectSymmetric.
    """
    px = (uv[..., 0] - cam.u0) / cam.mu
    py = (uv[..., 1] - cam.v0) / cam.mv
    r = jnp.sqrt(px * px + py * py)
    phi = jnp.arctan2(py, px)
    theta = r
    for _ in range(UNDISTORT_ITERS):
        t2 = theta * theta
        f = _kb_r(cam, theta) - r
        df = 1.0 + t2 * (3 * cam.k2 + t2 * (5 * cam.k3 + t2 * (7 * cam.k4 + t2 * 9 * cam.k5)))
        theta = theta - f / jnp.maximum(df, 1e-9)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    ray = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    z = jnp.where(jnp.abs(ray[..., 2:3]) < 1e-9, 1e-9, ray[..., 2:3])
    return ray / z  # normalized plane, z = 1 (matches reference usage)


class MeiCamera(NamedTuple):
    """Unified omnidirectional (Mei): mirror ξ + radtan + pinhole.

    Reference: camera_model/src/camera_models/CataCamera.cc.
    """

    xi: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    k1: jax.Array
    k2: jax.Array
    p1: jax.Array
    p2: jax.Array
    width: int = 752
    height: int = 480

    @staticmethod
    def create(xi, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
               width=752, height=480, dtype=jnp.float32) -> "MeiCamera":
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return MeiCamera(a(xi), a(fx), a(fy), a(cx), a(cy),
                         a(k1), a(k2), a(p1), a(p2), width, height)


def mei_space_to_plane(cam: MeiCamera, P: jax.Array) -> jax.Array:
    """Reference: CataCamera::spaceToPlane."""
    norm = jnp.linalg.norm(P, axis=-1, keepdims=True)
    z = P[..., 2:3] + cam.xi * norm
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = P[..., :2] / z
    pin = PinholeCamera(cam.fx, cam.fy, cam.cx, cam.cy,
                        cam.k1, cam.k2, cam.p1, cam.p2)
    d = _radtan_distort(pin, xy)
    u = cam.fx * d[..., 0] + cam.cx
    v = cam.fy * d[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def mei_lift_projective(cam: MeiCamera, uv: jax.Array) -> jax.Array:
    """Reference: CataCamera::liftProjective (unified-model unprojection)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    xd = jnp.stack([mx, my], axis=-1)
    pin = PinholeCamera(cam.fx, cam.fy, cam.cx, cam.cy,
                        cam.k1, cam.k2, cam.p1, cam.p2)
    x = xd
    for _ in range(UNDISTORT_ITERS):
        x = xd - (_radtan_distort(pin, x) - x)
    r2 = jnp.sum(x * x, axis=-1, keepdims=True)
    xi = cam.xi
    zs = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * r2)) / (1.0 + r2)
    ray = jnp.concatenate([zs * x, zs - xi], axis=-1)
    z = jnp.where(jnp.abs(ray[..., 2:3]) < 1e-9, 1e-9, ray[..., 2:3])
    return ray / z


class ScaramuzzaCamera(NamedTuple):
    """Scaramuzza polynomial omnidirectional model.

    Reference: camera_model/src/camera_models/ScaramuzzaCamera.cc — cam2world
    polynomial `poly` over the image radius, world2cam inverse polynomial
    `inv_poly` over the incidence angle, plus the affine (c,d,e) + center.
    Polynomials are fixed-degree arrays (SCARAMUZZA_POLY_SIZE=5,
    SCARAMUZZA_INV_POLY_SIZE=12 in the reference; configurable here).
    """

    poly: jax.Array       # [Np] a0..a_{Np-1}, cam2world: z = Σ a_k ρ^k
    inv_poly: jax.Array   # [Ni] world2cam: ρ(θ) = Σ b_k θ^k
    c: jax.Array
    d: jax.Array
    e: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = 752
    height: int = 480

    @staticmethod
    def create(poly, inv_poly, c=1.0, d=0.0, e=0.0, cx=376.0, cy=240.0,
               width=752, height=480, dtype=jnp.float32) -> "ScaramuzzaCamera":
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return ScaramuzzaCamera(a(poly), a(inv_poly), a(c), a(d), a(e),
                                a(cx), a(cy), width, height)


def _polyval(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Σ coeffs[k]·x^k (ascending order), Horner."""
    out = jnp.zeros_like(x)
    for k in range(coeffs.shape[0] - 1, -1, -1):
        out = out * x + coeffs[k]
    return out


def scaramuzza_space_to_plane(cam: ScaramuzzaCamera, P: jax.Array) -> jax.Array:
    """Reference: ScaramuzzaCamera::spaceToPlane — angle of incidence from
    the optical axis → image radius via the inverse polynomial → affine."""
    norm_xy = jnp.linalg.norm(P[..., :2], axis=-1)
    # theta measured from the xy-plane toward -z (Scaramuzza convention)
    theta = jnp.arctan2(-P[..., 2], jnp.maximum(norm_xy, 1e-12))
    rho = _polyval(cam.inv_poly, theta)
    inv_n = 1.0 / jnp.maximum(norm_xy, 1e-12)
    xn = P[..., 0] * inv_n * rho
    yn = P[..., 1] * inv_n * rho
    u = xn * cam.c + yn * cam.d + cam.cx
    v = xn * cam.e + yn + cam.cy
    return jnp.stack([u, v], axis=-1)


def scaramuzza_lift_projective(cam: ScaramuzzaCamera,
                               uv: jax.Array) -> jax.Array:
    """Reference: ScaramuzzaCamera::liftProjective — invert the affine, read
    z from the forward polynomial at the image radius."""
    inv_det = 1.0 / (cam.c - cam.d * cam.e)
    xp = inv_det * ((uv[..., 0] - cam.cx) - cam.d * (uv[..., 1] - cam.cy))
    yp = inv_det * (-cam.e * (uv[..., 0] - cam.cx) + cam.c * (uv[..., 1] - cam.cy))
    rho = jnp.sqrt(xp * xp + yp * yp)
    zp = _polyval(cam.poly, rho)
    ray = jnp.stack([xp, yp, -zp], axis=-1)   # -z: mirror convention
    z = jnp.where(jnp.abs(ray[..., 2:3]) < 1e-9, 1e-9, ray[..., 2:3])
    return ray / z


def space_to_plane(cam, P: jax.Array) -> jax.Array:
    """Polymorphic dispatch on the (static) camera type.

    Reference analog: virtual Camera::spaceToPlane
    (camera_model/include/camodocal/camera_models/Camera.h:12-22) built by
    CameraFactory::generateCameraFromYamlFile.
    """
    if isinstance(cam, PinholeCamera):
        return pinhole_space_to_plane(cam, P)
    if isinstance(cam, EquidistantCamera):
        return equidistant_space_to_plane(cam, P)
    if isinstance(cam, MeiCamera):
        return mei_space_to_plane(cam, P)
    if isinstance(cam, ScaramuzzaCamera):
        return scaramuzza_space_to_plane(cam, P)
    raise TypeError(f"unknown camera type {type(cam)}")


def lift_projective(cam, uv: jax.Array) -> jax.Array:
    """Polymorphic pixel → normalized ray (z=1)."""
    if isinstance(cam, PinholeCamera):
        return pinhole_lift_projective(cam, uv)
    if isinstance(cam, EquidistantCamera):
        return equidistant_lift_projective(cam, uv)
    if isinstance(cam, MeiCamera):
        return mei_lift_projective(cam, uv)
    if isinstance(cam, ScaramuzzaCamera):
        return scaramuzza_lift_projective(cam, uv)
    raise TypeError(f"unknown camera type {type(cam)}")


def euroc_camera(dtype=jnp.float32) -> PinholeCamera:
    """The EuRoC cam0 intrinsics used by the reference
    (config/euroc/euroc_config.yaml:8-19)."""
    return PinholeCamera.create(
        fx=4.616e02, fy=4.603e02, cx=3.630e02, cy=2.481e02,
        k1=-2.917e-01, k2=8.228e-02, p1=5.333e-05, p2=-1.578e-04,
        width=752, height=480, dtype=dtype)
