"""Preintegration tests vs closed-form oracles and finite differences.

Replicates the role of the reference's (commented) IntegrationBase
checkJacobian self-check (integration_base.h:279-445)."""

import jax
import jax.numpy as jnp
import numpy as np

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.preintegration import (
    ImuNoise, corrected_deltas, preintegrate)

NOISE = ImuNoise()


def make_batch(n, dt, acc_fn, gyr_fn):
    ts = np.arange(1, n + 1) * dt
    accs = jnp.asarray(np.stack([acc_fn(t) for t in ts]))
    gyrs = jnp.asarray(np.stack([gyr_fn(t) for t in ts]))
    dts = jnp.full((n,), dt)
    return dts, accs, gyrs, jnp.asarray(acc_fn(0.0)), jnp.asarray(gyr_fn(0.0))


def test_constant_accel_no_rotation():
    a = np.array([0.3, -0.2, 9.9])
    dts, accs, gyrs, a0, g0 = make_batch(
        200, 0.005, lambda t: a, lambda t: np.zeros(3))
    pre = preintegrate(dts, accs, gyrs, a0, g0,
                       jnp.zeros(3), jnp.zeros(3), NOISE)
    T = 200 * 0.005
    np.testing.assert_allclose(pre.dv, a * T, rtol=1e-9)
    np.testing.assert_allclose(pre.dp, 0.5 * a * T * T, rtol=1e-6)
    np.testing.assert_allclose(pre.dq, [1, 0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(pre.dt_sum, T)


def test_constant_rotation_rate():
    w = np.array([0.1, -0.4, 0.25])
    dts, accs, gyrs, a0, g0 = make_batch(
        400, 0.005, lambda t: np.zeros(3), lambda t: w)
    pre = preintegrate(dts, accs, gyrs, a0, g0,
                       jnp.zeros(3), jnp.zeros(3), NOISE)
    T = 400 * 0.005
    q_ref = lie.exp_so3_quat(jnp.asarray(w * T))
    np.testing.assert_allclose(pre.dq, q_ref, atol=1e-6)


def test_padding_is_noop():
    rng = np.random.default_rng(0)
    acc = lambda t: np.array([0.1, 9.8, 0.3]) + 0.05 * np.sin(5 * t)
    gyr = lambda t: np.array([0.2, -0.1, 0.05]) * np.cos(3 * t)
    dts, accs, gyrs, a0, g0 = make_batch(50, 0.005, acc, gyr)
    ba, bg = jnp.array([0.01, -0.02, 0.005]), jnp.array([0.001, 0.002, -0.001])
    pre = preintegrate(dts, accs, gyrs, a0, g0, ba, bg, NOISE)
    # pad with 30 garbage samples at dt=0
    pad = 30
    dts_p = jnp.concatenate([dts, jnp.zeros(pad)])
    accs_p = jnp.concatenate([accs, jnp.asarray(rng.normal(size=(pad, 3)))])
    gyrs_p = jnp.concatenate([gyrs, jnp.asarray(rng.normal(size=(pad, 3)))])
    pre_p = preintegrate(dts_p, accs_p, gyrs_p, a0, g0, ba, bg, NOISE)
    np.testing.assert_allclose(pre_p.dp, pre.dp, atol=1e-14)
    np.testing.assert_allclose(pre_p.dq, pre.dq, atol=1e-14)
    np.testing.assert_allclose(pre_p.dv, pre.dv, atol=1e-14)
    np.testing.assert_allclose(pre_p.P, pre.P, atol=1e-14)
    np.testing.assert_allclose(pre_p.J, pre.J, atol=1e-14)


def test_bias_jacobian_vs_repropagation():
    """First-order corrected deltas must match re-preintegration at the new
    bias (the reference's repropagate, integration_base.h:38-52)."""
    acc = lambda t: np.array([0.4, 9.7, -0.2]) + 0.3 * np.sin(2 * t)
    gyr = lambda t: np.array([0.3, -0.2, 0.1]) + 0.1 * np.cos(4 * t)
    dts, accs, gyrs, a0, g0 = make_batch(100, 0.005, acc, gyr)
    ba0, bg0 = jnp.zeros(3), jnp.zeros(3)
    pre = preintegrate(dts, accs, gyrs, a0, g0, ba0, bg0, NOISE)

    dba = jnp.array([2e-3, -1e-3, 3e-3])
    dbg = jnp.array([-1e-3, 2e-3, 1e-3])
    dp_c, dq_c, dv_c = corrected_deltas(pre, ba0 + dba, bg0 + dbg)
    pre2 = preintegrate(dts, accs, gyrs, a0, g0, ba0 + dba, bg0 + dbg, NOISE,
                        with_cov=False)
    # first-order correction: error is O(|db|^2)
    np.testing.assert_allclose(dp_c, pre2.dp, atol=5e-6)
    np.testing.assert_allclose(dv_c, pre2.dv, atol=5e-6)
    ang = 2 * np.abs(np.asarray(lie.quat_mul(lie.quat_conj(dq_c), pre2.dq))[1:])
    assert ang.max() < 5e-6


def test_covariance_psd_and_growth():
    acc = lambda t: np.array([0.0, 0.0, 9.81])
    gyr = lambda t: np.array([0.01, 0.02, -0.01])
    dts, accs, gyrs, a0, g0 = make_batch(100, 0.005, acc, gyr)
    pre = preintegrate(dts, accs, gyrs, a0, g0, jnp.zeros(3), jnp.zeros(3), NOISE)
    P = np.asarray(pre.P)
    np.testing.assert_allclose(P, P.T, atol=1e-18)
    eig = np.linalg.eigvalsh(P)
    assert eig.min() > 0
    # halving the batch must give strictly smaller trace
    pre_half = preintegrate(dts[:50], accs[:50], gyrs[:50], a0, g0,
                            jnp.zeros(3), jnp.zeros(3), NOISE)
    assert np.trace(np.asarray(pre_half.P)) < np.trace(P)


def test_vmap_over_frame_pairs():
    acc = lambda t: np.array([0.1, 9.8, 0.0])
    gyr = lambda t: np.array([0.0, 0.1, 0.0])
    dts, accs, gyrs, a0, g0 = make_batch(40, 0.005, acc, gyr)
    batch = 7
    f = jax.vmap(lambda d, a, g: preintegrate(
        d, a, g, a0, g0, jnp.zeros(3), jnp.zeros(3), NOISE))
    out = f(jnp.tile(dts[None], (batch, 1)),
            jnp.tile(accs[None], (batch, 1, 1)),
            jnp.tile(gyrs[None], (batch, 1, 1)))
    assert out.dp.shape == (batch, 3)
    assert out.P.shape == (batch, 15, 15)
    np.testing.assert_allclose(out.dp[0], out.dp[-1])
