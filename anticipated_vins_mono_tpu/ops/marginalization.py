"""Marginalization: fold sliding-out states into a Gaussian prior.

Capability parity with the reference MarginalizationInfo/MarginalizationFactor
(/root/reference/vins_estimator/src/factor/marginalization_factor.{h,cpp}):

- re-linearize every factor touching the drop set (prior, IMU 0→1, all
  projection factors anchored at the oldest frame)        (preMarginalize, :174-196)
- assemble the dense H = JᵀJ, b = Jᵀr over (window tangent ⊕ dropped
  landmarks)                                              (ThreadsConstructA, :141-172)
- Schur-eliminate the drop set via eigendecomposition pseudo-inverse
  (eps = 1e-8)                                            (marginalize, :267-281)
- factor the kept information into (J0, r0) via eigenvalue square root
                                                          (:283-291)
- remap kept-variable addresses for the slid window       (estimator.cpp:904-922)

TPU-first design: the reference does this with pointer-keyed block maps and a
4-pthread fan-out (NUM_THREADS=4, marginalization_factor.h:13). Here the drop
set is expressed as a *mask* over a fixed [D+F] tangent, H comes from the same
batched `linearize` the solver uses (one matmul), and the Schur/eigh steps are
small dense ops — the whole thing is one jitted function, vmappable over
scenario batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops.window import (
    PriorFactor, WindowConfig, WindowMeasurements, WindowState, linearize)

EIG_EPS = 1e-8  # matches the reference's eps in marginalize() (:267-291)


def _augmented_system(state: WindowState, meas: WindowMeasurements,
                      cfg: WindowConfig, anchor_ref):
    """H, b over the augmented tangent [D + F] (window ⊕ inverse depths),
    built from the factors in `meas` (caller pre-masks to the drop-touching
    subset) via the solver's own batched linearization."""
    d, f, nf = cfg.dim, cfg.max_feats, cfg.nf
    r_all, J_all, p_res, p_rows, p_rho, _ = linearize(state, meas, cfg, anchor_ref)
    # augment projection rows with their landmark column (block-diagonal in l)
    eye_f = jnp.eye(f, dtype=p_rho.dtype)
    # p_rho: [F,NF,2]; landmark column one-hot over F
    p_aug = p_rho[..., None] * eye_f[:, None, None, :]      # [F,NF,2,F]
    n_proj = f * nf * 2
    J_proj = jnp.concatenate(
        [p_rows.reshape(n_proj, d), p_aug.reshape(n_proj, f)], axis=1)
    J_rest = jnp.concatenate(
        [J_all[n_proj:], jnp.zeros((J_all.shape[0] - n_proj, f), J_all.dtype)],
        axis=1)
    J_aug = jnp.concatenate([J_proj, J_rest], axis=0)       # [N, D+F]
    H = J_aug.T @ J_aug
    b = J_aug.T @ r_all
    return H, b


def _schur_drop_df(H, b, pose_idx, d: int, land_mask=None):
    """Drop-set Schur elimination with native-f32 double-float accumulation
    (ops/df32) — the TPU path (no x64 emulation).

    Exploits the drop set's STRUCTURE instead of a monolithic masked `eigh`
    (whose f32 eigenvectors at condition ~1e8 cost ~1e-3 relative error):
    - dropped landmarks form a DIAGONAL block (no factor touches two
      landmarks) → eliminated analytically with exact products and
      compensated accumulation, per-landmark eps threshold as the
      reference's pseudo-inverse does per-eigenvalue
      (marginalization_factor.cpp:267-281);
    - the remaining drop block is the 15-dim pose+speedbias of ONE frame at
      STATIC indices `pose_idx` → pseudo-inverted via a tiny normalized f32
      `eigh` + DF iterative refinement (df32.eigh_pinv_solve).
    The keep−drop subtractions — the marginalization's catastrophic
    cancellation — are kept as (hi, lo) pairs throughout.

    H: [d+F or d, ·] f32; `land_mask` [F] selects dropped landmark columns
    (d..d+F); returns DF (H_new [d,d], b_new [d]) with drop rows/cols zeroed.
    """
    from anticipated_vins_mono_tpu.ops import df32

    if land_mask is not None:
        h = jnp.diagonal(H)[d:] * land_mask
        inv_h = jnp.where(h > EIG_EPS, 1.0 / jnp.where(h > EIG_EPS, h, 1.0),
                          0.0)
        B = H[:d, d:]                                       # [d, F]
        C1 = df32.outer_acc(B.T, inv_h)
        Hx = df32.sub(df32.df(H[:d, :d]), C1)
        u = inv_h * b[d:]
        bc = df32.matmul_acc(B.T, u[:, None])
        bx = df32.sub(df32.df(b[:d]), df32.DF(bc.hi[:, 0], bc.lo[:, 0]))
    elif isinstance(H, df32.DF):
        # the second-newest path hands the prior's information in directly,
        # already compensated (J0ᵀJ0 reconstructed with matmul_acc)
        Hx, bx = H, b
    else:
        Hx = df32.df(H[:d, :d])
        bx = df32.df(b[:d])

    di = jnp.asarray(pose_idx, jnp.int32)
    Hdd = df32.DF(Hx.hi[di][:, di], Hx.lo[di][:, di])       # [15,15]
    Hkd = df32.DF(Hx.hi[:, di], Hx.lo[:, di])               # [d,15]
    rhs = df32.DF(
        jnp.concatenate([Hx.hi[di, :], bx.hi[di][:, None]], axis=1),
        jnp.concatenate([Hx.lo[di, :], bx.lo[di][:, None]], axis=1))
    X = df32.eigh_pinv_solve(Hdd, rhs)                      # DF [15, d+1]
    corr = df32.matmul_df_df(Hkd, X)                        # DF [d, d+1]
    H_new = df32.sub(Hx, df32.DF(corr.hi[:, :d], corr.lo[:, :d]))
    b_new = df32.sub(bx, df32.DF(corr.hi[:, d], corr.lo[:, d]))

    keep = jnp.ones(d, H.dtype).at[di].set(0.0)
    H_new = df32.DF(H_new.hi * keep[:, None] * keep[None, :],
                    H_new.lo * keep[:, None] * keep[None, :])
    b_new = df32.DF(b_new.hi * keep, b_new.lo * keep)
    return H_new, b_new


def _sqrt_factor_df(H, b):
    """`_sqrt_factor` for a df32 (H, b) via a DF-congruence factorization.

    A plain f32 `eigh` cannot express the prior's SMALL eigenvalues — the
    gauge-anchor information sits ~8 decades below the whitened IMU
    curvature, under the f32 eigh noise floor (eps32·‖H‖) — and losing it
    every slide lets the window free-float (measured: 11 m ATE over 45 s vs
    0.03 m over 12 s). Instead the f32 eigh supplies only an APPROXIMATE
    diagonalizing basis V; all precision flows through the compensated
    congruence M = Vᵀ·H·V (DF — the small curvature survives as accurate
    small diagonal entries of M). After symmetric normalization by
    √diag(M), Mn ≈ I + O(1e-3), whose f32 Cholesky is unconditionally
    stable: H = J0ᵀJ0 with J0 = Lᵀ·diag(√Mᵢᵢ)·Vᵀ·diag(1/s), each row
    carrying its OWN scale — exactly representable in f32 across the full
    eigen-spectrum. Mirrors the reference's eigenvalue-sqrt factorization
    (marginalization_factor.cpp:283-291) at df32 accuracy without f64.
    """
    from anticipated_vins_mono_tpu.ops import df32

    dd = df32.to_f32(df32.DF(jnp.diagonal(H.hi), jnp.diagonal(H.lo)))
    ddmax = jnp.maximum(jnp.max(dd), 1e-20)
    live = dd > 1e-12 * ddmax           # structurally-present states
    s = jnp.where(live, jax.lax.rsqrt(jnp.maximum(dd, 1e-20)), 0.0)
    Hn = df32.mul_f(H, s[:, None] * s[None, :])
    _, V = jnp.linalg.eigh(df32.to_f32(Hn))      # basis only
    # M = Vᵀ Hn V in DF (two compensated products)
    T1 = df32.matmul_df_f(Hn, V)                              # DF [D,D]
    M = df32.matmul_df_f(df32.DF(T1.hi.T, T1.lo.T), V)        # (Vᵀ Hn V)ᵀ
    M = df32.DF(0.5 * (M.hi + M.hi.T), 0.5 * (M.lo + M.lo.T))
    md = df32.to_f32(df32.DF(jnp.diagonal(M.hi), jnp.diagonal(M.lo)))
    mmax = jnp.maximum(jnp.max(md), 1e-20)
    # eps threshold, as the reference's pseudo-sqrt. Two constraints pin
    # it (both MEASURED on cascaded priors): (a) Cholesky stability —
    # directions with md below the congruence noise floor (~eps32·mmax)
    # blow up the normalized couplings (md=1e-9·mmax ⇒ |offdiag| 0.77,
    # indefinite ⇒ NaN; 1e-7 ⇒ 0.001); (b) gauge retention — the
    # anchor-inherited absolute-pose information sits at ~1e-4·mmax in the
    # NORMALIZED space (Jacobi scaling divides by the same position-block
    # diagonal), and cutting at 1e-4 was exactly the round-3 45-s
    # random-walk bug. 1e-6 clears both by two decades.
    ok = md > 1e-6 * mmax
    si = jnp.sqrt(jnp.maximum(md, 1e-30)) * ok
    si_inv = jnp.where(ok, 1.0 / jnp.where(ok, jnp.sqrt(
        jnp.maximum(md, 1e-30)), 1.0), 0.0)
    Mn = df32.mul_f(M, si_inv[:, None] * si_inv[None, :])
    eye = jnp.eye(M.hi.shape[0], dtype=M.hi.dtype)
    okm = ok[:, None] * ok[None, :]
    Mn_hi = jnp.where(okm > 0, df32.to_f32(Mn), eye)
    # tiny diagonal guard: inflates curvature by 1e-4 relative (below the
    # f32 assembly noise) and keeps the factorization PD against residual
    # coupling noise
    L = jnp.linalg.cholesky(Mn_hi + 1e-4 * eye)
    U = L.T * si[None, :]                        # M = UᵀU
    s_inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    J0 = (U @ V.T) * s_inv[None, :]
    b_n = s * df32.to_f32(b)
    rhs = (V.T @ b_n) * jnp.where(ok, si_inv, 0.0)
    r0 = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    r0 = jnp.where(ok, r0, 0.0)
    J0 = J0 * ok[:, None]
    # last-resort guard: a failed factorization must DEGRADE the prior (zero
    # rows), never poison every subsequent window with NaN
    bad = ~(jnp.all(jnp.isfinite(J0), axis=1) & jnp.isfinite(r0))
    J0 = jnp.where(bad[:, None], 0.0, J0)
    r0 = jnp.where(bad, 0.0, r0)
    return J0, r0


def _masked_schur(H, b, drop_mask):
    """Schur-eliminate the (dynamically) masked subset.

    H_dd's pseudo-inverse comes from `eigh` with eps-thresholding, exactly the
    reference's SelfAdjointEigenSolver pattern (marginalization_factor.cpp:
    267-281) — which also makes the masked-out zero rows/cols harmless.
    """
    # f64 (identity when x64 off): the keep−drop Schur subtraction and the
    # eps-thresholded eigendecomposition are the prior's precision floor;
    # this runs once per frame, outside the LM hot loop
    H = H.astype(jnp.float64)
    b = b.astype(jnp.float64)
    drop_mask = drop_mask.astype(jnp.float64)
    keep = 1.0 - drop_mask
    Hdd = H * drop_mask[:, None] * drop_mask[None, :]
    Hkd = H * keep[:, None] * drop_mask[None, :]
    w, V = jnp.linalg.eigh(Hdd)
    inv_w = jnp.where(w > EIG_EPS, 1.0 / jnp.where(w > EIG_EPS, w, 1.0), 0.0)
    Hdd_inv = (V * inv_w[None, :]) @ V.T
    b_d = b * drop_mask
    H_new = H * keep[:, None] * keep[None, :] - Hkd @ Hdd_inv @ Hkd.T
    b_new = b * keep - Hkd @ (Hdd_inv @ b_d)
    return H_new, b_new


def _sqrt_factor(H, b):
    """(J0, r0) with J0ᵀJ0 = H, J0ᵀr0 = b via eigenvalue sqrt
    (marginalization_factor.cpp:283-291)."""
    w, V = jnp.linalg.eigh(H.astype(jnp.float64))
    b = b.astype(jnp.float64)
    ok = w > EIG_EPS
    w_safe = jnp.where(ok, w, 1.0)
    s = jnp.sqrt(w_safe) * ok
    s_inv = jnp.where(ok, 1.0 / jnp.sqrt(w_safe), 0.0)
    J0 = s[:, None] * V.T
    r0 = (s_inv[:, None] * V.T) @ b
    return J0, r0


def _shift_matrix(cfg: WindowConfig, drop_frame: int) -> jnp.ndarray:
    """S [D,D]: dx_old = S @ dx_new after deleting `drop_frame` and appending
    a fresh newest frame. Mirrors the address-shift bookkeeping in
    estimator.cpp:904-922 as a pure index remapping."""
    import numpy as np
    d, nf = cfg.dim, cfg.nf
    S = np.zeros((d, d))
    # poses
    for i in range(nf):
        if i == drop_frame:
            continue
        new_i = i if i < drop_frame else i - 1
        S[6 * i: 6 * i + 6, 6 * new_i: 6 * new_i + 6] = np.eye(6)
    # speed/bias
    off = 6 * nf
    for i in range(nf):
        if i == drop_frame:
            continue
        new_i = i if i < drop_frame else i - 1
        S[off + 9 * i: off + 9 * i + 9,
          off + 9 * new_i: off + 9 * new_i + 9] = np.eye(9)
    # extrinsic + td unchanged
    S[15 * nf:, 15 * nf:] = np.eye(d - 15 * nf)
    return jnp.asarray(S)


def _slide_lin_state(state: WindowState, drop_frame: int,
                     cfg: WindowConfig) -> WindowState:
    """Linearization point for the new prior: frames after `drop_frame`
    shifted down; the (duplicated) newest slot is never referenced because
    the shifted prior has zero columns there."""
    nf = cfg.nf
    idx = jnp.asarray([i for i in range(nf) if i != drop_frame] + [nf - 1])
    return state._replace(
        p=state.p[idx], q=state.q[idx], v=state.v[idx],
        ba=state.ba[idx], bg=state.bg[idx])


@functools.partial(jax.jit, static_argnames=("cfg",))
def marginalize_oldest(state: WindowState, meas: WindowMeasurements,
                       cfg: WindowConfig) -> PriorFactor:
    """MARGIN_OLD: absorb frame 0 (pose+speedbias), its IMU factor, all
    projection factors anchored at it (and those landmarks), and the previous
    prior, into a new prior over the slid window.

    Mirrors estimator.cpp:817-902: drop set = para_Pose[0], para_SpeedBias[0]
    and every feature with start_frame == 0.
    """
    d, f, nf = cfg.dim, cfg.max_feats, cfg.nf
    dtype = state.p.dtype

    # restrict factors to the drop-touching subset
    anchored0 = (meas.anchor == 0).astype(dtype) * meas.feat_valid
    meas_m = meas._replace(
        feat_valid=anchored0,
        pre_valid=meas.pre_valid * (jnp.arange(cfg.window) == 0).astype(dtype),
    )
    # gauge anchor rows participate via linearize (they touch pose 0 only when
    # no prior exists — exactly when their info must seed the new prior)
    anchor_ref = (state.p[0], state.q[0])
    H, b = _augmented_system(state, meas_m, cfg, anchor_ref)

    drop = jnp.zeros(d + f, dtype)
    drop = drop.at[0:6].set(1.0)                       # pose 0
    drop = drop.at[6 * nf: 6 * nf + 9].set(1.0)        # speed/bias 0
    drop = drop.at[d:].set(anchored0)                  # dropped landmarks
    if cfg.accum == "df32":
        pose_idx = list(range(6)) + list(range(6 * nf, 6 * nf + 9))
        Hk, bk = _schur_drop_df(H, b, tuple(pose_idx), d,
                                land_mask=anchored0)
        J0, r0 = _sqrt_factor_df(Hk, bk)
    else:
        H2, b2 = _masked_schur(H, b, drop)
        # kept landmarks never appear in the marginalized factors → their
        # rows are zero; restrict to the window tangent.
        Hk, bk = H2[:d, :d], b2[:d]
        J0, r0 = _sqrt_factor(Hk, bk)

    S = _shift_matrix(cfg, 0).astype(J0.dtype)
    J0s = J0 @ S
    return PriorFactor(J0=J0s.astype(dtype), r0=r0.astype(dtype),
                       lin=_slide_lin_state(state, 0, cfg),
                       weight=jnp.ones((), dtype))


@functools.partial(jax.jit, static_argnames=("cfg",))
def marginalize_second_newest(state: WindowState, prior: PriorFactor,
                              cfg: WindowConfig) -> PriorFactor:
    """MARGIN_SECOND_NEW: drop frame NF-2 from the *prior only* — its visual
    factors are simply discarded (non-keyframe) and its IMU measurements are
    merged by the estimator. Mirrors estimator.cpp:905-989.

    The prior is re-linearized at the CURRENT state before the Schur drop:
    b must be the gradient at the new linearization point (r0 + J0·dx), not
    the stale r0 — otherwise hundreds of consecutive non-keyframe slides
    (hover phases) accumulate the mismatch and corrupt the prior.
    """
    d, nf = cfg.dim, cfg.nf
    dtype = prior.J0.dtype
    from anticipated_vins_mono_tpu.ops.window import state_boxminus
    dx = state_boxminus(state, prior.lin, cfg)
    r_now = prior.r0 + prior.J0 @ dx
    fidx = nf - 2
    if cfg.accum == "df32":
        from anticipated_vins_mono_tpu.ops import df32
        # reconstruct the prior information compensated: a plain f32 J0ᵀJ0
        # buries the prior's small (gauge) rows under eps32 of the whitened
        # entries — the same loss _sqrt_factor_df exists to prevent
        H = df32.matmul_acc(prior.J0, prior.J0)
        bc = df32.matmul_acc(prior.J0, r_now[:, None])
        b = df32.DF(bc.hi[:, 0], bc.lo[:, 0])
        pose_idx = (list(range(6 * fidx, 6 * fidx + 6))
                    + list(range(6 * nf + 9 * fidx, 6 * nf + 9 * fidx + 9)))
        H2, b2 = _schur_drop_df(H, b, tuple(pose_idx), d)
        J0, r0 = _sqrt_factor_df(H2, b2)
    else:
        H = prior.J0.T @ prior.J0
        b = prior.J0.T @ r_now
        drop = jnp.zeros(d, dtype)
        drop = drop.at[6 * fidx: 6 * fidx + 6].set(1.0)
        drop = drop.at[6 * nf + 9 * fidx: 6 * nf + 9 * fidx + 9].set(1.0)
        H2, b2 = _masked_schur(H, b, drop)
        J0, r0 = _sqrt_factor(H2, b2)
    S = _shift_matrix(cfg, fidx).astype(J0.dtype)
    return PriorFactor(J0=(J0 @ S).astype(dtype), r0=r0.astype(dtype),
                       lin=_slide_lin_state(state, fidx, cfg),
                       weight=prior.weight)
