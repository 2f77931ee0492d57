"""Camera model tests: project/unproject round trips and Jacobian sanity.

Mirrors the role of the reference's (manual) camera checks; EuRoC pinhole
intrinsics from config/euroc/euroc_config.yaml:8-19."""

import jax
import jax.numpy as jnp
import numpy as np

from anticipated_vins_mono_tpu.ops import cameras


def _grid_pixels(cam, margin=60, n=9):
    us = np.linspace(margin, cam.width - margin, n)
    vs = np.linspace(margin, cam.height - margin, n)
    uu, vv = np.meshgrid(us, vs)
    return jnp.asarray(np.stack([uu.ravel(), vv.ravel()], -1))


def test_pinhole_roundtrip_euroc():
    cam = cameras.euroc_camera(dtype=jnp.float64)
    uv = _grid_pixels(cam)
    ray = cameras.lift_projective(cam, uv)
    np.testing.assert_allclose(ray[:, 2], 1.0)
    uv2 = cameras.space_to_plane(cam, ray * 3.7)  # scale invariance too
    np.testing.assert_allclose(uv2, uv, atol=1e-6)


def test_pinhole_no_distortion_is_linear():
    cam = cameras.PinholeCamera.create(400.0, 400.0, 376.0, 240.0, dtype=jnp.float64)
    P = jnp.array([[0.1, -0.2, 2.0]])
    uv = cameras.space_to_plane(cam, P)
    np.testing.assert_allclose(uv[0], [400 * 0.05 + 376, 400 * -0.1 + 240], atol=1e-12)


def test_equidistant_roundtrip():
    cam = cameras.EquidistantCamera.create(
        380.8, 380.3, 376.8, 240.5, k2=-0.011, k3=0.021, k4=-0.021, k5=0.0065,
        dtype=jnp.float64)
    uv = _grid_pixels(cam)
    ray = cameras.lift_projective(cam, uv)
    uv2 = cameras.space_to_plane(cam, ray * 2.0)
    np.testing.assert_allclose(uv2, uv, atol=1e-5)


def test_mei_roundtrip():
    cam = cameras.MeiCamera.create(
        xi=0.9, fx=700.0, fy=700.0, cx=376.0, cy=240.0,
        k1=-0.1, k2=0.02, dtype=jnp.float64)
    uv = _grid_pixels(cam, margin=150)
    ray = cameras.lift_projective(cam, uv)
    uv2 = cameras.space_to_plane(cam, ray * 1.5)
    np.testing.assert_allclose(uv2, uv, atol=1e-5)


def test_projection_jacobian_finite_diff():
    cam = cameras.euroc_camera(dtype=jnp.float64)
    P = jnp.array([0.3, -0.1, 2.5], dtype=jnp.float64)
    J = jax.jacfwd(lambda p: cameras.space_to_plane(cam, p))(P)
    eps = 1e-7
    for k in range(3):
        dP = jnp.zeros(3, jnp.float64).at[k].set(eps)
        fd = (cameras.space_to_plane(cam, P + dP)
              - cameras.space_to_plane(cam, P - dP)) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-5)


def test_vmap_batch_of_points():
    cam = cameras.euroc_camera(dtype=jnp.float64)
    P = jax.random.normal(jax.random.PRNGKey(0), (256, 3)) * 0.3 + jnp.array([0, 0, 3.0])
    uv = jax.jit(lambda p: cameras.space_to_plane(cam, p))(P)
    assert uv.shape == (256, 2)
