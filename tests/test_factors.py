"""Factor residual/Jacobian tests.

Replicates ProjectionFactor::check (projection_factor.cpp:123-225): analytic
(here: autodiff-tangent) Jacobians vs central finite differences through the
boxplus retraction; plus zero-residual consistency oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from anticipated_vins_mono_tpu.ops import factors, lie
from anticipated_vins_mono_tpu.ops.factors import PoseTangent
from anticipated_vins_mono_tpu.ops.preintegration import ImuNoise, preintegrate

NOISE = ImuNoise()


def simulate_imu(p0, v0, q0, n=100, dt=0.005, seed=0):
    """Simulate true trajectory + perfect IMU readings (body frame)."""
    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -factors.GRAVITY])  # world gravity acceleration
    w_body = np.array([0.2, -0.3, 0.1])
    a_world = np.array([0.3, 0.1, -0.2])

    p, v, q = np.array(p0, float), np.array(v0, float), np.array(q0, float)
    accs, gyrs = [], []
    # body accelerometer measures R^T (a_world - g)
    def acc_meas(qq):
        R = np.asarray(lie.quat_to_rot(jnp.asarray(qq)))
        return R.T @ (a_world - g)

    accs0, gyrs0 = acc_meas(q), w_body.copy()
    states = [(p.copy(), v.copy(), q.copy())]
    for k in range(n):
        # midpoint ground-truth integration in world frame
        q_new = np.asarray(lie.quat_mul(jnp.asarray(q),
                                        lie.exp_so3_quat(jnp.asarray(w_body * dt))))
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        q = q_new / np.linalg.norm(q_new)
        accs.append(acc_meas(q))
        gyrs.append(w_body.copy())
        states.append((p.copy(), v.copy(), q.copy()))
    return (jnp.full((n,), dt), jnp.asarray(np.stack(accs)),
            jnp.asarray(np.stack(gyrs)), jnp.asarray(accs0), jnp.asarray(gyrs0),
            states)


def test_imu_residual_zero_on_consistent_states():
    p0, v0, q0 = np.zeros(3), np.array([0.1, -0.2, 0.05]), np.array([1.0, 0, 0, 0])
    dts, accs, gyrs, a0, g0, states = simulate_imu(p0, v0, q0, n=60)
    pre = preintegrate(dts, accs, gyrs, a0, g0, jnp.zeros(3), jnp.zeros(3), NOISE)
    pj, vj, qj = states[-1]
    r = factors.imu_residual_raw(
        jnp.asarray(p0), jnp.asarray(q0), jnp.asarray(v0),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(pj), jnp.asarray(qj), jnp.asarray(vj),
        jnp.zeros(3), jnp.zeros(3), pre)
    # midpoint integration truncation only
    assert float(jnp.abs(r).max()) < 1e-4


def _random_projection_setup(seed=0):
    rng = np.random.default_rng(seed)
    q_i = np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.3)))
    q_j = np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.3)))
    p_i = rng.normal(size=3)
    p_j = p_i + rng.normal(size=3) * 0.5
    qic = np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.05)))
    tic = rng.normal(size=3) * 0.05
    pt_i = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), 1.0])
    inv_dep = np.float64(0.25)
    # generate consistent pt_j by the forward chain
    args = [jnp.asarray(x) for x in (p_i, q_i, p_j, q_j, tic, qic, inv_dep)]
    pc_i = jnp.asarray(pt_i) / inv_dep
    pw = lie.quat_rotate(args[1], lie.quat_rotate(args[5], pc_i) + args[4]) + args[0]
    pc_j = lie.quat_rotate(lie.quat_conj(args[5]),
                           lie.quat_rotate(lie.quat_conj(args[3]), pw - args[2]) - args[4])
    pt_j = np.asarray(pc_j / pc_j[2])
    return args, jnp.asarray(pt_i), jnp.asarray(pt_j)


def test_projection_residual_zero_consistent():
    (p_i, q_i, p_j, q_j, tic, qic, inv_dep), pt_i, pt_j = _random_projection_setup()
    r = factors.projection_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                                        inv_dep, pt_i, pt_j)
    np.testing.assert_allclose(r, 0.0, atol=1e-12)


def test_projection_jacobians_finite_diff():
    (p_i, q_i, p_j, q_j, tic, qic, inv_dep), pt_i, pt_j = _random_projection_setup(1)
    pt_j = pt_j + jnp.array([0.01, -0.005, 0.0])  # nonzero residual

    def res_fn(pose_i, pose_j, pose_ic, invd):
        return factors.projection_residual(
            pose_i.p, pose_i.q, pose_j.p, pose_j.q, pose_ic.p, pose_ic.q,
            invd, pt_i, pt_j)

    poses = (PoseTangent(p_i, q_i), PoseTangent(p_j, q_j), PoseTangent(tic, qic))
    res, jacs = factors.tangent_jacobian(res_fn, poses, (inv_dep,))

    eps = 1e-7
    for pi, pose in enumerate(poses):
        for k in range(6):
            d = jnp.zeros(6, jnp.float64).at[k].set(eps)
            pp = [factors.apply_pose_delta(p, d if i == pi else jnp.zeros(6))
                  for i, p in enumerate(poses)]
            rp = res_fn(*pp, inv_dep)
            pm = [factors.apply_pose_delta(p, -d if i == pi else jnp.zeros(6))
                  for i, p in enumerate(poses)]
            rm = res_fn(*pm, inv_dep)
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(jacs[pi][:, k], fd, atol=1e-5,
                                       err_msg=f"pose {pi} dim {k}")
    # inverse depth
    rp = res_fn(*poses, inv_dep + eps)
    rm = res_fn(*poses, inv_dep - eps)
    np.testing.assert_allclose(jacs[3], (rp - rm) / (2 * eps), atol=1e-5)


def test_imu_jacobians_finite_diff():
    p0, v0, q0 = np.zeros(3), np.array([0.1, -0.2, 0.05]), np.array([1.0, 0, 0, 0])
    dts, accs, gyrs, a0, g0, states = simulate_imu(p0, v0, q0, n=40)
    ba = jnp.array([0.02, -0.01, 0.03])
    bg = jnp.array([0.003, 0.001, -0.002])
    pre = preintegrate(dts, accs, gyrs, a0, g0, ba, bg, NOISE)
    pj, vj, qj = states[-1]
    pj = jnp.asarray(pj) + jnp.array([0.05, -0.03, 0.02])  # nonzero residual

    sb_i = jnp.concatenate([jnp.asarray(v0), ba * 1.1, bg * 0.9])
    sb_j = jnp.concatenate([jnp.asarray(vj) + 0.1, ba, bg])

    def res_fn(pose_i, pose_j, sbi, sbj):
        return factors.imu_residual(
            pose_i.p, pose_i.q, sbi[0:3], sbi[3:6], sbi[6:9],
            pose_j.p, pose_j.q, sbj[0:3], sbj[3:6], sbj[6:9], pre)

    poses = (PoseTangent(jnp.asarray(p0), jnp.asarray(q0)),
             PoseTangent(pj, jnp.asarray(qj)))
    res, jacs = factors.tangent_jacobian(res_fn, poses, (sb_i, sb_j))
    assert res.shape == (15,)

    eps = 1e-7
    for pi in range(2):
        for k in range(6):
            d = jnp.zeros(6, jnp.float64).at[k].set(eps)
            pp = [factors.apply_pose_delta(pr, d if i == pi else jnp.zeros(6))
                  for i, pr in enumerate(poses)]
            rp = res_fn(*pp, sb_i, sb_j)
            pm = [factors.apply_pose_delta(pr, -d if i == pi else jnp.zeros(6))
                  for i, pr in enumerate(poses)]
            rm = res_fn(*pm, sb_i, sb_j)
            np.testing.assert_allclose(jacs[pi][:, k], (rp - rm) / (2 * eps),
                                       atol=2e-4, err_msg=f"pose {pi} dim {k}")
    for si, sb in enumerate((sb_i, sb_j)):
        for k in range(9):
            d = jnp.zeros(9, jnp.float64).at[k].set(eps)
            args_p = (sb_i + d, sb_j) if si == 0 else (sb_i, sb_j + d)
            args_m = (sb_i - d, sb_j) if si == 0 else (sb_i, sb_j - d)
            fd = (res_fn(*poses, *args_p) - res_fn(*poses, *args_m)) / (2 * eps)
            np.testing.assert_allclose(jacs[2 + si][:, k], fd, atol=2e-4,
                                       err_msg=f"sb {si} dim {k}")


def test_td_factor_reduces_to_projection():
    (p_i, q_i, p_j, q_j, tic, qic, inv_dep), pt_i, pt_j = _random_projection_setup(2)
    z2 = jnp.zeros(2)
    z0 = jnp.zeros(())
    r_td = factors.projection_td_residual_raw(
        p_i, q_i, p_j, q_j, tic, qic, inv_dep, z0,
        pt_i, pt_j, z2, z2, z0, z0, z0, z0, 0.0)
    r = factors.projection_residual_raw(p_i, q_i, p_j, q_j, tic, qic,
                                        inv_dep, pt_i, pt_j)
    np.testing.assert_allclose(r_td, r, atol=1e-15)


def test_cauchy_weight_limits():
    assert abs(float(factors.cauchy_weight(jnp.zeros(()))) - 1.0) < 1e-12
    w = float(factors.cauchy_weight(jnp.asarray(100.0)))
    assert 0 < w < 0.15
