"""Marginalization tests.

Oracles:
- `_masked_schur` vs a dense NumPy Schur complement on random SPD systems;
- `_sqrt_factor` reconstruction (J0ᵀJ0 = H, J0ᵀr0 = b);
- information additivity: Schur(full graph) over kept vars must equal
  prior info (from the drop-touching subset) + info of untouched factors —
  the defining property of a correct marginalization prior
  (marginalization_factor.cpp:267-291)."""

import jax
import jax.numpy as jnp
import numpy as np

from anticipated_vins_mono_tpu.ops import marginalization as mg
from anticipated_vins_mono_tpu.ops.window import (
    WindowConfig, lm_solve, linearize)
from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

CFG = WindowConfig(window=4, max_feats=40, iters=15)


def _np_schur(H, b, drop_idx):
    keep_idx = np.setdiff1d(np.arange(H.shape[0]), drop_idx)
    Hkk = H[np.ix_(keep_idx, keep_idx)]
    Hkd = H[np.ix_(keep_idx, drop_idx)]
    Hdd = H[np.ix_(drop_idx, drop_idx)]
    Hdd_inv = np.linalg.pinv(Hdd, rcond=1e-10)
    Hs = Hkk - Hkd @ Hdd_inv @ Hkd.T
    bs = b[keep_idx] - Hkd @ (Hdd_inv @ b[drop_idx])
    return Hs, bs, keep_idx


def test_masked_schur_vs_dense():
    rng = np.random.default_rng(0)
    n = 30
    A = rng.normal(size=(n + 10, n))
    H = A.T @ A
    b = rng.normal(size=n)
    drop_idx = np.array([0, 1, 2, 7, 8, 15])
    mask = np.zeros(n)
    mask[drop_idx] = 1.0
    H2, b2 = mg._masked_schur(jnp.asarray(H), jnp.asarray(b), jnp.asarray(mask))
    Hs, bs, keep = _np_schur(H, b, drop_idx)
    np.testing.assert_allclose(np.asarray(H2)[np.ix_(keep, keep)], Hs, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b2)[keep], bs, atol=1e-9)
    # dropped rows/cols fully zeroed
    assert np.abs(np.asarray(H2)[drop_idx]).max() < 1e-12


def test_sqrt_factor_reconstructs():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(50, 20))
    H = A.T @ A
    # make it rank deficient
    H[:, 5] = 0
    H[5, :] = 0
    b = H @ rng.normal(size=20)  # b in range(H)
    J0, r0 = mg._sqrt_factor(jnp.asarray(H), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(J0.T @ J0), H, atol=1e-8)
    np.testing.assert_allclose(np.asarray(J0.T @ r0), b, atol=1e-8)


def test_shift_matrix_layout():
    S = np.asarray(mg._shift_matrix(CFG, 0))
    nf, d = CFG.nf, CFG.dim
    # old pose 1 maps to new pose 0
    assert S[6:12, 0:6].trace() == 6
    # old pose 0 maps nowhere
    assert np.abs(S[0:6]).sum() == 0
    # newest-frame columns receive nothing (fresh frame)
    assert np.abs(S[:, 6 * (nf - 1): 6 * nf]).sum() == 0
    # extrinsic/td identity
    assert np.allclose(S[15 * nf:, 15 * nf:], np.eye(d - 15 * nf))


def test_information_additivity():
    """prior info + untouched-factor info == Schur(full graph) over kept."""
    prob = make_window_problem(CFG, seed=3, perturb=0.3, pixel_noise=0.5)
    st, _ = lm_solve(prob.init, prob.meas, CFG)
    meas = prob.meas
    d, f, nf = CFG.dim, CFG.max_feats, CFG.nf
    anchor_ref = (st.p[0], st.q[0])

    # full augmented system
    H_full, b_full = mg._augmented_system(st, meas, CFG, anchor_ref)

    # drop-touching subset → what marginalize_oldest absorbs (recomputed
    # unshifted from the internals so we can compare in the old indexing)
    anchored0 = (np.asarray(meas.anchor) == 0) * np.asarray(meas.feat_valid)
    meas_m = meas._replace(
        feat_valid=jnp.asarray(anchored0 * np.asarray(meas.feat_valid)),
        pre_valid=meas.pre_valid * (jnp.arange(CFG.window) == 0))
    H_t, b_t = mg._augmented_system(st, meas_m, CFG, anchor_ref)
    drop = np.zeros(d + f)
    drop[0:6] = 1
    drop[6 * nf: 6 * nf + 9] = 1
    drop[d:] = anchored0
    H_ts, b_ts = mg._masked_schur(jnp.asarray(H_t), jnp.asarray(b_t),
                                  jnp.asarray(drop))

    # untouched factors = full − touching (information is additive)
    H_rest = np.asarray(H_full) - np.asarray(H_t)
    b_rest = np.asarray(b_full) - np.asarray(b_t)

    # Schur of the full system over the same drop set
    drop_idx = np.nonzero(drop)[0]
    H_s, b_s, keep = _np_schur(np.asarray(H_full), np.asarray(b_full), drop_idx)

    H_sum = (np.asarray(H_ts) + H_rest)[np.ix_(keep, keep)]
    b_sum = (np.asarray(b_ts) + b_rest)[keep]
    scale = np.abs(H_s).max()
    np.testing.assert_allclose(H_sum, H_s, atol=1e-7 * scale)
    np.testing.assert_allclose(b_sum, b_s, atol=1e-6 * max(np.abs(b_s).max(), 1.0))


def test_second_newest_drop_is_prior_only():
    prob = make_window_problem(CFG, seed=4, perturb=0.2)
    st, _ = lm_solve(prob.init, prob.meas, CFG)
    prior1 = mg.marginalize_oldest(st, prob.meas, CFG)
    # now drop the second-newest from that prior
    prior2 = mg.marginalize_second_newest(st, prior1, CFG)
    nf, d = CFG.nf, CFG.dim
    J = np.asarray(prior2.J0)
    H = J.T @ J
    assert np.all(np.isfinite(J))
    # newest-frame block receives nothing
    blk = slice(6 * (nf - 1), 6 * nf)
    assert np.abs(H[blk, blk]).max() < 1e-9
    # info remains PSD
    assert np.linalg.eigvalsh(H).min() > -1e-8
