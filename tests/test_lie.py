"""Unit tests for the SO(3)/quaternion substrate (ops/lie.py).

Oracles: scipy-free closed forms + round-trip identities + random fuzzing,
mirroring the role Eigen plays for the reference Utility helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anticipated_vins_mono_tpu.ops import lie


def rand_quat(key, n=()):
    q = jax.random.normal(key, n + (4,))
    return lie.quat_normalize(q)


def test_quat_mul_vs_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    q, p = rand_quat(k1, (32,)), rand_quat(k2, (32,))
    Rq, Rp = lie.quat_to_rot(q), lie.quat_to_rot(p)
    R_mul = lie.quat_to_rot(lie.quat_mul(q, p))
    np.testing.assert_allclose(R_mul, Rq @ Rp, atol=1e-12)


def test_quat_rotate_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = rand_quat(k1, (16,))
    v = jax.random.normal(k2, (16, 3))
    out = lie.quat_rotate(q, v)
    ref = jnp.einsum("bij,bj->bi", lie.quat_to_rot(q), v)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_rot_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(2), (64,))
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = lie.rot_to_quat(lie.quat_to_rot(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_rot_to_quat_degenerate_traces():
    # 180-degree rotations hit every Shepperd pivot branch.
    for axis in range(3):
        theta = np.zeros(3)
        theta[axis] = np.pi
        q = lie.exp_so3_quat(jnp.asarray(theta))
        R = lie.quat_to_rot(q)
        q2 = lie.rot_to_quat(R)
        np.testing.assert_allclose(lie.quat_to_rot(q2), R, atol=1e-9)


def test_exp_log_roundtrip():
    th = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 2.0
    back = lie.log_so3(lie.exp_so3_quat(th))
    # log returns the representative in (-pi, pi]; restrict test to |th|<pi
    mask = np.linalg.norm(np.asarray(th), axis=-1) < np.pi
    np.testing.assert_allclose(np.asarray(back)[mask], np.asarray(th)[mask], atol=1e-9)


def test_exp_small_angle():
    th = jnp.array([1e-9, -2e-9, 1e-10])
    q = lie.exp_so3_quat(th)
    np.testing.assert_allclose(q[1:], th / 2, rtol=1e-6)
    np.testing.assert_allclose(q[0], 1.0, atol=1e-12)


def test_delta_q_first_order():
    th = jnp.array([1e-4, -2e-4, 3e-4])
    np.testing.assert_allclose(lie.delta_q(th), lie.exp_so3_quat(th), atol=1e-9)


def test_skew_cross():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    a, b = jax.random.normal(k1, (8, 3)), jax.random.normal(k2, (8, 3))
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", lie.skew(a), b), jnp.cross(a, b), atol=1e-12)


def test_qleft_qright():
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    q, p = rand_quat(k1), rand_quat(k2)
    prod = lie.quat_mul(q, p)
    np.testing.assert_allclose(lie.q_left(q) @ p, prod, atol=1e-12)
    np.testing.assert_allclose(lie.q_right(p) @ q, prod, atol=1e-12)


def test_ypr_roundtrip():
    ypr = jnp.array([[30.0, 10.0, -20.0], [-100.0, 40.0, 5.0]])
    back = lie.rot_to_ypr(lie.ypr_to_rot(ypr))
    np.testing.assert_allclose(back, ypr, atol=1e-9)


def test_gravity_to_rot():
    g = jnp.array([0.3, -0.2, 9.7])
    R0 = lie.gravity_to_rot(g)
    out = R0 @ g
    np.testing.assert_allclose(out[:2], 0.0, atol=1e-9)
    np.testing.assert_allclose(out[2], jnp.linalg.norm(g), atol=1e-9)
    assert abs(float(lie.rot_to_ypr(R0)[0])) < 1e-6  # zero yaw


def test_pose_boxplus_zero():
    p = jnp.array([1.0, 2.0, 3.0])
    q = rand_quat(jax.random.PRNGKey(6))
    p2, q2 = lie.pose_boxplus(p, q, jnp.zeros(6))
    np.testing.assert_allclose(p2, p)
    np.testing.assert_allclose(q2, q, atol=1e-12)


def test_logdet_psd():
    A = jax.random.normal(jax.random.PRNGKey(7), (5, 9, 9))
    M = A @ jnp.swapaxes(A, -1, -2) + 9 * jnp.eye(9)
    ref = jnp.linalg.slogdet(M)[1]
    np.testing.assert_allclose(lie.logdet_psd(M), ref, rtol=1e-10)


def test_jit_vmap_composability():
    f = jax.jit(jax.vmap(lambda q, v: lie.quat_rotate(q, v)))
    q = rand_quat(jax.random.PRNGKey(8), (128,))
    v = jax.random.normal(jax.random.PRNGKey(9), (128, 3))
    out = f(q, v)
    assert out.shape == (128, 3)
