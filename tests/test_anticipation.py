"""Anticipation/attention tests vs independent NumPy oracles.

Plays the role of the reference's cross-implementation validation
(support_files/scripts/attention_feature_selection.py + MATLAB
createMatricesLinearImuFactor.m, SURVEY.md §4 item 4): every device kernel
is checked against a straight-line NumPy re-derivation in the test."""

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import anticipation as ant
from anticipated_vins_mono_tpu.ops import lie

CFG = ant.SelectorConfig(horizon=6)


def np_slerp(q0, q1, t):
    rel = np.asarray(lie.quat_mul(lie.quat_conj(jnp.asarray(q0)), jnp.asarray(q1)))
    ang = np.asarray(lie.log_so3(jnp.asarray(rel)))
    return np.asarray(lie.quat_mul(jnp.asarray(q0),
                                   lie.exp_so3_quat(jnp.asarray(t * ang))))


def test_linear_imu_matrices_vs_numpy():
    rng = np.random.default_rng(0)
    q_i = np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.2)))
    q_j = np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.2)))
    m, dt = 10, 0.005
    acc_var, bias_var = 0.0064, 1.6e-9

    omega, Ablk = ant.linear_imu_matrices(
        jnp.asarray(q_i), jnp.asarray(q_j), m, dt, acc_var, bias_var)

    # independent oracle (mirrors eq 47/48/50/52 with an explicit loop)
    N = np.zeros((3, 3))
    M = np.zeros((3, 3))
    c11 = c12 = 0.0
    for i in range(m):
        q = np_slerp(q_i, q_j, i / m)
        R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
        jkh = m - i - 0.5
        N += jkh * R
        M += R
        c11 += jkh * jkh
        c12 += jkh
    cov = np.zeros((9, 9))
    cov[0:3, 0:3] = np.eye(3) * m * c11 * dt**4 * acc_var
    cov[0:3, 3:6] = np.eye(3) * c12 * dt**3 * acc_var
    cov[3:6, 0:3] = cov[0:3, 3:6].T
    cov[3:6, 3:6] = np.eye(3) * m * dt**2 * acc_var
    cov[6:9, 6:9] = np.eye(3) * m * bias_var
    A = -np.eye(9)
    A[0:3, 3:6] = -np.eye(3) * m * dt
    A[0:3, 6:9] = N * dt**2
    A[3:6, 6:9] = M * dt
    np.testing.assert_allclose(np.asarray(Ablk), A, atol=1e-10)
    np.testing.assert_allclose(np.asarray(omega), np.linalg.inv(cov),
                               rtol=1e-8)


def test_omega_structure():
    rng = np.random.default_rng(1)
    H = CFG.horizon
    qs = np.stack([np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.1)))
                   for _ in range(H + 1)])
    Om = np.asarray(ant.omega_from_motion(jnp.asarray(qs), 10, 0.005, CFG))
    np.testing.assert_allclose(Om, Om.T, atol=1e-6)
    assert np.linalg.eigvalsh(Om).min() > -1e-5
    # banded block-tridiagonal structure: block (0, 2) must be zero
    S = ant.STATE_SIZE
    assert np.abs(Om[0:S, 2 * S:3 * S]).max() == 0
    # with the identity prior, PD
    Om2 = np.asarray(ant.add_omega_prior(jnp.asarray(Om)))
    assert np.linalg.eigvalsh(Om2 + 1e-9 * np.eye(len(Om2))).min() > 0


def test_delta_ell_properties():
    H = CFG.horizon
    # camera moving along +x, looking along +z at a landmark ahead
    p_wc = jnp.asarray(np.stack([[0.1 * h, 0, 0] for h in range(H + 1)]))
    q_wc = jnp.tile(lie.quat_identity(jnp.float64), (H + 1, 1))
    bearing = jnp.array([0.1, -0.05, 1.0])
    Delta, nvis = ant.delta_ell(bearing, jnp.asarray(4.0), p_wc, q_wc, CFG)
    D = np.asarray(Delta)
    assert int(nvis) == H  # visible everywhere
    np.testing.assert_allclose(D, D.T, atol=1e-9)
    w = np.linalg.eigvalsh(D)
    assert w.min() > -1e-8          # PSD (information)
    assert w.max() > 0
    # only position sub-blocks populated: velocity rows are zero
    S = ant.STATE_SIZE
    assert np.abs(D[S + 3: S + 9]).max() == 0
    # block h=0 (state k) untouched
    assert np.abs(D[:S]).max() == 0


def test_delta_ell_invisible_is_zero():
    H = CFG.horizon
    p_wc = jnp.asarray(np.stack([[5.0 * h, 0, 0] for h in range(H + 1)]))
    q_wc = jnp.tile(lie.quat_identity(jnp.float64), (H + 1, 1))
    bearing = jnp.array([0.0, 0.0, 1.0])
    Delta, nvis = ant.delta_ell(bearing, jnp.asarray(2.0), p_wc, q_wc, CFG)
    # landmark 2 m ahead; camera races past at 5 m/frame → visible only at k+1
    assert int(nvis) == 1
    np.testing.assert_allclose(np.asarray(Delta), 0.0)


def test_nn_depths():
    cand = jnp.asarray([[0.0, 0.0], [0.5, 0.5]])
    lm_uv = jnp.asarray([[0.01, 0.0], [0.48, 0.52], [9, 9]])
    lm_d = jnp.asarray([2.0, 7.0, 99.0])
    mask = jnp.asarray([1.0, 1.0, 0.0])
    out = np.asarray(ant.nn_depths(cand, lm_uv, lm_d, mask))
    np.testing.assert_allclose(out, [2.0, 7.0])
    # no landmarks → default
    out2 = np.asarray(ant.nn_depths(cand, lm_uv, lm_d, jnp.zeros(3)))
    np.testing.assert_allclose(out2, [5.0, 5.0])


def _random_selection_problem(F=12, seed=0):
    rng = np.random.default_rng(seed)
    D = CFG.dim
    A = rng.normal(size=(D + 3, D)) * 0.3
    Omega = jnp.asarray(A.T @ A + np.eye(D))
    Deltas = []
    for _ in range(F):
        B = rng.normal(size=(4, D))
        Deltas.append(B.T @ B)
    Deltas = jnp.asarray(np.stack(Deltas))
    probs = jnp.asarray(rng.uniform(0.5, 1.0, F))
    return Omega, Deltas, probs


def test_greedy_matches_numpy_greedy():
    Omega, Deltas, probs = _random_selection_problem()
    F, kappa = Deltas.shape[0], 4
    sel, OmF = ant.select_informative(
        Omega, Deltas, probs, jnp.ones(F), kappa)

    # NumPy exact greedy oracle
    Om = np.asarray(Omega)
    chosen = []
    for _ in range(kappa):
        lds = np.full(F, -np.inf)
        for f in range(F):
            if f in chosen:
                continue
            lds[f] = np.linalg.slogdet(Om + float(probs[f]) * np.asarray(Deltas[f]))[1]
        best = int(np.argmax(lds))
        chosen.append(best)
        Om = Om + float(probs[best]) * np.asarray(Deltas[best])

    assert set(np.nonzero(np.asarray(sel))[0].tolist()) == set(chosen)
    np.testing.assert_allclose(np.asarray(OmF), Om, rtol=1e-8)


def test_upper_bound_dominates():
    """Hadamard: Σ log diag ≥ logdet — the lazy-greedy bound is valid."""
    Omega, Deltas, probs = _random_selection_problem(seed=3)
    ub = np.asarray(ant.logdet_upper_bounds(Omega, Deltas, probs))
    for f in range(Deltas.shape[0]):
        ld = np.linalg.slogdet(np.asarray(Omega) +
                               float(probs[f]) * np.asarray(Deltas[f]))[1]
        assert ub[f] >= ld - 1e-9


def test_imu_horizon_constant_velocity():
    p = jnp.zeros(3)
    q = lie.quat_identity(jnp.float64)
    v = jnp.array([1.0, 0.0, 0.0])
    acc = jnp.array([0.0, 0.0, 9.81007])  # hover thrust: cancels gravity
    gyr = jnp.zeros(3)
    ps, qs, vs = ant.imu_horizon(p, q, v, acc, gyr, jnp.zeros(3), jnp.zeros(3),
                                 horizon=5, n_imu=20, dt_imu=0.005)
    np.testing.assert_allclose(np.asarray(ps)[:, 0],
                               np.arange(6) * 0.1, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vs), np.tile([1, 0, 0], (6, 1)),
                               atol=1e-9)


def test_gt_horizon_relative_composition():
    rng = np.random.default_rng(5)
    gt_p = jnp.asarray(rng.normal(size=(7, 3)))
    gt_q = jnp.asarray(np.stack([
        np.asarray(lie.exp_so3_quat(jnp.asarray(rng.normal(size=3) * 0.3)))
        for _ in range(7)]))
    # estimate == gt at the current frame → horizon == gt exactly
    p_est, q_est = ant.gt_horizon(gt_p[0], gt_q[0], gt_p, gt_q)
    np.testing.assert_allclose(np.asarray(p_est), np.asarray(gt_p), atol=1e-12)
    for k in range(7):
        np.testing.assert_allclose(
            np.abs(np.asarray(lie.quat_mul(lie.quat_conj(q_est[k]), gt_q[k]))[0]),
            1.0, atol=1e-12)


def test_survival_weighting():
    """p^h horizon decay: prob=1 reproduces the unweighted Δ; prob<1
    shrinks it monotonically; the greedy then prefers the robust candidate
    when two candidates are otherwise identical."""
    import jax.numpy as jnp
    from anticipated_vins_mono_tpu.models import anticipation as ant

    cfg = ant.SelectorConfig(horizon=6, survival_weighting=True)
    cfg0 = ant.SelectorConfig(horizon=6, survival_weighting=False)
    H = cfg.horizon
    # camera sliding along +x, looking down +z
    ps = jnp.stack([jnp.array([0.1 * h, 0.0, 0.0]) for h in range(H + 1)])
    qs = jnp.tile(jnp.array([1.0, 0, 0, 0]), (H + 1, 1))
    b = jnp.array([0.05, -0.02, 1.0])

    d_plain, n0 = ant.delta_ell(b, 4.0, ps, qs, cfg0)
    d_p1, n1 = ant.delta_ell(b, 4.0, ps, qs, cfg, prob=jnp.asarray(1.0))
    assert jnp.allclose(d_plain, d_p1, atol=1e-12)
    assert int(n0) == int(n1)

    d_p5, _ = ant.delta_ell(b, 4.0, ps, qs, cfg, prob=jnp.asarray(0.5))
    # information strictly decreases with survival decay
    assert float(jnp.trace(d_p5)) < float(jnp.trace(d_p1))

    # greedy with κ=1: identical geometry, different survival
    # (full-rank Ω so logdet gains are finite)
    Om = 1e-3 * jnp.eye(cfg.dim)
    D_hi, _ = ant.delta_ell(b, 4.0, ps, qs, cfg, prob=jnp.asarray(0.9))
    D_lo, _ = ant.delta_ell(b, 4.0, ps, qs, cfg, prob=jnp.asarray(0.3))
    Deltas = jnp.stack([D_lo, D_hi])
    sel, _ = ant.select_informative(Om, Deltas, jnp.ones(2), jnp.ones(2), 1)
    assert float(sel[1]) == 1.0 and float(sel[0]) == 0.0


def test_greedy_lowrank_matches_chol():
    """The determinant-lemma greedy ("lowrank" impl) must pick the same
    features with the same Ω as the batched-Cholesky greedy, given Δs with
    the true position-support structure delta_ell produces."""
    rng = np.random.default_rng(3)
    H, S, D = CFG.horizon, ant.STATE_SIZE, CFG.dim
    E = np.asarray(ant._pos_embedding(H, S, D, jnp.float64))
    F = 24
    Deltas = []
    for _ in range(F):
        B = rng.normal(size=(5, 3 * H)) * 0.8
        Deltas.append(E.T @ (B.T @ B) @ E)
    Deltas = jnp.asarray(np.stack(Deltas))
    A = rng.normal(size=(D + 3, D)) * 0.3
    Omega = jnp.asarray(A.T @ A + np.eye(D))
    probs = jnp.asarray(rng.uniform(0.4, 1.0, F))
    valid = jnp.ones(F)
    kappa = 6
    sel_c, Om_c = ant.select_informative(Omega, Deltas, probs, valid,
                                         kappa, impl="chol")
    sel_l, Om_l = ant.select_informative(Omega, Deltas, probs, valid,
                                         kappa, impl="lowrank")
    np.testing.assert_array_equal(np.asarray(sel_c), np.asarray(sel_l))
    np.testing.assert_allclose(np.asarray(Om_c), np.asarray(Om_l),
                               rtol=1e-9, atol=1e-9)


def test_blocked_greedy_near_exact():
    """Blocked greedy (group>1): ~group× fewer sequential rounds on TPU.
    group=1 must equal exact greedy bit-for-bit; larger groups must respect
    κ and stay within a small logdet gap of exact greedy (the within-round
    interaction terms it ignores are second-order for diffuse Δs)."""
    rng = np.random.default_rng(7)
    H, S, D = CFG.horizon, ant.STATE_SIZE, CFG.dim
    E = np.asarray(ant._pos_embedding(H, S, D, jnp.float64))
    F = 40
    Deltas = []
    for _ in range(F):
        B = rng.normal(size=(5, 3 * H)) * 0.8
        Deltas.append(E.T @ (B.T @ B) @ E)
    Deltas = jnp.asarray(np.stack(Deltas))
    A = rng.normal(size=(D + 3, D)) * 0.3
    Omega = jnp.asarray(A.T @ A + np.eye(D))
    probs = jnp.asarray(rng.uniform(0.4, 1.0, F))
    valid = jnp.ones(F)
    kappa = 12

    sel_ref, Om_ref = ant.select_informative(Omega, Deltas, probs, valid,
                                             kappa, impl="chol")
    sel_g1, Om_g1 = ant.select_informative(Omega, Deltas, probs, valid,
                                           kappa, impl="chol", group=1)
    np.testing.assert_array_equal(np.asarray(sel_ref), np.asarray(sel_g1))

    ld_ref = float(np.linalg.slogdet(np.asarray(Om_ref))[1])
    ld_base = float(np.linalg.slogdet(np.asarray(Omega))[1])
    for group in (4, 6, 12):
        for impl in ("chol", "lowrank"):
            sel_g, Om_g = ant.select_informative(
                Omega, Deltas, probs, valid, kappa, impl=impl, group=group)
            assert int(np.asarray(sel_g).sum()) == kappa
            ld_g = float(np.linalg.slogdet(np.asarray(Om_g))[1])
            # blocked greedy keeps ≥95% of exact greedy's logdet GAIN
            assert ld_g - ld_base >= 0.95 * (ld_ref - ld_base), \
                (group, impl, ld_g, ld_ref)


def test_blocked_greedy_budget_cap():
    """Traced budget < κ must cap total selections under grouping too."""
    rng = np.random.default_rng(11)
    H, S, D = CFG.horizon, ant.STATE_SIZE, CFG.dim
    E = np.asarray(ant._pos_embedding(H, S, D, jnp.float64))
    F = 20
    Deltas = jnp.asarray(np.stack([
        E.T @ ((lambda B: B.T @ B)(rng.normal(size=(5, 3 * H)))) @ E
        for _ in range(F)]))
    Omega = jnp.asarray(np.eye(D))
    sel, _ = ant.select_informative(Omega, Deltas, jnp.ones(F), jnp.ones(F),
                                    12, impl="chol", group=5,
                                    budget=jnp.asarray(7))
    assert int(np.asarray(sel).sum()) == 7
