"""Anticipation + attention (L3): the fork's core algorithm, batched on-device.

Capability parity with FeatureSelector + HorizonGenerator
(/root/reference/vins_estimator/src/feature_selector.{h,cpp},
utility/horizon_generator.{h,cpp}), per Carlone & Karaman ICRA'17:

- future-horizon propagation (`imu` constant-rate mode and `gt` mode)
  (horizon_generator.cpp:25-69, 73-123)
- Ω_{k:k+H} from the linear-IMU-factor model: slerped rotation sums N/M,
  covImu eq-(52), Ablk eq-(50), 4-block accumulation
  (feature_selector.cpp:463-598)
- identity Ω prior placeholder (addOmegaPrior, :602-609 — the reference
  never wired the real state prior; kept for parity)
- per-candidate expected information Δ_ℓ: forward-projected bearings with
  FOV check, Bh = [û]×·R, Ch = BhᵀBh, landmark Schur W = (ΣCh)⁻¹,
  Δ blocks C_i·δij − C_i W C_jᵀ on the position sub-blocks
  (calcInfoFromFeatures, :239-365)
- nearest-neighbor depth guess — brute-force masked argmin replaces the
  nanoflann KD-tree (initKDTree/findNNDepth, :380-459; hundreds of points
  make a tree pointless on TPU)
- greedy submodular logdet maximization (selectInformativeFeatures,
  :613-686). TPU-first difference: every round evaluates ALL candidate
  logdets in one batched Cholesky (exact greedy); the reference's lazy
  upper-bound walk (sortedlogDetUB, :690-728) trades that parallel batch
  for serial early exits — provided here as `logdet_upper_bounds` for
  parity checks.

Known reference deviation (documented): the reference composes the IMU-cam
extrinsic TWICE in Bh (`(q_WC_h * q_IC).inverse()` where q_WC_h already
includes q_IC, feature_selector.cpp:305,324) — an apparent bug; here the
camera rotation is applied once.

Dimensions follow state_defs.h: HORIZON=13, STATE_SIZE=9 (t,v,ba),
Ω ∈ R^{126×126} for the default horizon.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie

HORIZON = 13      # state_defs.h:8
STATE_SIZE = 9    # state_defs.h:10


class SelectorConfig(NamedTuple):
    horizon: int = HORIZON
    max_features: int = 30        # κ̄ (euroc_config.yaml:86 max_features)
    init_threshold: int = 0       # pass-through below this count (:85)
    acc_var: float = 0.0064       # accVarDTime_ (discrete accel var)
    acc_bias_var: float = 1.6e-9  # accBiasVarDTime_
    fov_margin: float = 1.0       # multiplier on the FOV half-tangents
    fov_x: float = 0.58           # ≈ EuRoC pinhole half-tangent
    fov_y: float = 0.44
    # IMPROVEMENT over the reference's p·Δ_ℓ weighting
    # (feature_selector.cpp:661): treat the prob channel as a PER-FRAME
    # track-survival probability — frame-h information arrives only if the
    # track survived h−1 steps, so block C_h is weighted p^(h−1) instead of
    # every block getting the same p. Makes the greedy prefer features that
    # are informative AND likely to still exist late in the horizon; the
    # reference's linear weighting overvalues fragile high-gain candidates.
    survival_weighting: bool = False

    @property
    def dim(self) -> int:
        return STATE_SIZE * (self.horizon + 1)


# ----------------------------------------------------------------------------
# Horizon generation (HorizonGenerator)
# ----------------------------------------------------------------------------


def imu_horizon(p_k1, q_k1, v_k1, acc_body, gyr_body, ba, bg,
                horizon: int, n_imu: int, dt_imu: float):
    """Constant-ω / constant-a propagation at IMU rate over the horizon.

    Mirrors HorizonGenerator::imu (horizon_generator.cpp:25-69): from the
    (k+1) state, apply the latest bias-corrected IMU sample as if constant.
    Returns (p [H+1,3], q [H+1,4], v [H+1,3]) for states k+1 … k+H+1? No —
    states h=0..H where h=0 is (k+1)'s predecessor convention of the
    reference: x_{k:k+H} with x_0 = current state k (copied), x_1 = k+1.
    Here we return x_{k+1 : k+1+H} propagated from (k+1), matching the
    selector's use of state_kkH[h] for h=1..H with state_kkH[0]=x_k.
    """
    dt_ = p_k1.dtype
    # host callers hand f64 numpy under x64 while the estimator state may be
    # f32 — a mixed carry poisons the scan (f32 in, promoted f64 out)
    q_k1, v_k1 = jnp.asarray(q_k1, dt_), jnp.asarray(v_k1, dt_)
    acc_body, gyr_body = jnp.asarray(acc_body, dt_), jnp.asarray(gyr_body, dt_)
    ba, bg = jnp.asarray(ba, dt_), jnp.asarray(bg, dt_)
    g = jnp.array([0.0, 0.0, -9.81007], dt_)
    w = gyr_body - bg

    def frame_step(carry, _):
        p, q, v = carry

        def imu_step(c, _):
            pp, qq, vv = c
            a_w = lie.quat_rotate(qq, acc_body - ba) + g
            pp = pp + vv * dt_imu + 0.5 * a_w * dt_imu * dt_imu
            vv = vv + a_w * dt_imu
            qq = lie.quat_normalize(
                lie.quat_mul(qq, lie.exp_so3_quat(w * dt_imu)))
            return (pp, qq, vv), None

        (p, q, v), _ = jax.lax.scan(imu_step, (p, q, v), None, length=n_imu)
        return (p, q, v), (p, q, v)

    init = (p_k1, q_k1, v_k1)
    _, (ps, qs, vs) = jax.lax.scan(frame_step, init, None, length=horizon)
    p_all = jnp.concatenate([p_k1[None], ps], axis=0)
    q_all = jnp.concatenate([q_k1[None], qs], axis=0)
    v_all = jnp.concatenate([v_k1[None], vs], axis=0)
    return p_all, q_all, v_all


def gt_horizon(p_k1, q_k1, gt_p: jax.Array, gt_q: jax.Array):
    """Ground-truth mode: compose *relative* GT transforms onto the current
    estimate (horizon_generator.cpp:73-123) — emulates a planner/MPC.

    gt_p/gt_q: [H+1] GT poses at the horizon frame times (gt[0] ↔ now).
    """
    q0_inv = lie.quat_conj(gt_q[0])
    rel_q = lie.quat_mul(q0_inv[None], gt_q)            # GT k+1 → k+h
    rel_p = lie.quat_rotate(q0_inv[None], gt_p - gt_p[0])
    q_est = lie.quat_mul(q_k1[None], rel_q)
    p_est = p_k1[None] + lie.quat_rotate(q_k1[None], rel_p)
    return p_est, q_est


# ----------------------------------------------------------------------------
# Ω from robot motion (calcInfoFromRobotMotion + createLinearImuMatrices)
# ----------------------------------------------------------------------------


def _slerp(q0, q1, t):
    rel = lie.quat_mul(lie.quat_conj(q0), q1)
    return lie.quat_mul(q0, lie.exp_so3_quat(t[..., None] * lie.log_so3(rel)))


def linear_imu_matrices(q_i, q_j, n_imu: int, dt_imu: float,
                        acc_var: float, acc_bias_var: float):
    """(Ω=covImu⁻¹ [9,9], Ablk [9,9]) for one horizon pair.

    Mirrors createLinearImuMatrices (feature_selector.cpp:531-598): N/M sums
    of slerp-interpolated rotations, covImu per eq (52), Ablk per eq (50).
    """
    dtype = q_i.dtype
    idx = jnp.arange(n_imu, dtype=dtype)
    ts = idx / n_imu
    qs = _slerp(q_i[None], q_j[None], ts)       # [n,4]
    Rs = lie.quat_to_rot(qs)                    # [n,3,3]
    jkh = n_imu - idx - 0.5
    Nij = jnp.einsum("n,nij->ij", jkh, Rs)
    Mij = jnp.sum(Rs, axis=0)
    cct_11 = jnp.sum(jkh * jkh)
    cct_12 = jnp.sum(jkh)

    dt2 = dt_imu * dt_imu
    dt3 = dt2 * dt_imu
    dt4 = dt3 * dt_imu
    I3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype)
    cov = jnp.block([
        [I3 * (n_imu * cct_11 * dt4 * acc_var), I3 * (cct_12 * dt3 * acc_var), Z3],
        [I3 * (cct_12 * dt3 * acc_var), I3 * (n_imu * dt2 * acc_var), Z3],
        [Z3, Z3, I3 * (n_imu * acc_bias_var)],
    ])
    omega = jnp.linalg.inv(cov)

    Ablk = jnp.block([
        [-I3, -I3 * (n_imu * dt_imu), Nij * dt2],
        [Z3, -I3, Mij * dt_imu],
        [Z3, Z3, -I3],
    ])
    return omega, Ablk


def omega_from_motion(q_horizon: jax.Array, n_imu: int, dt_imu: float,
                      cfg: SelectorConfig) -> jax.Array:
    """Ω_{k:k+H} [D,D] from the horizon orientations [H+1,4].

    Mirrors calcInfoFromRobotMotion (feature_selector.cpp:463-527): each
    consecutive pair contributes the four 9×9 blocks
    [AᵀΩA, AᵀΩ; ΩA, Ω] shifting along the diagonal — assembled here with a
    vmap over pairs and two static scatter-adds.
    """
    H, S, D = cfg.horizon, STATE_SIZE, cfg.dim
    om, Ab = jax.vmap(
        lambda qi, qj: linear_imu_matrices(qi, qj, n_imu, dt_imu,
                                           cfg.acc_var, cfg.acc_bias_var)
    )(q_horizon[:-1], q_horizon[1:])
    AtO = jnp.einsum("hji,hjk->hik", Ab, om)          # AᵀΩ
    AtOA = jnp.einsum("hij,hjk->hik", AtO, Ab)        # AᵀΩA

    Omega = jnp.zeros((D, D), q_horizon.dtype)
    for h in range(H):  # static loop → fused scatter-adds
        i, j = S * h, S * (h + 1)
        Omega = Omega.at[i:i + S, i:i + S].add(AtOA[h])
        Omega = Omega.at[i:i + S, j:j + S].add(AtO[h])
        Omega = Omega.at[j:j + S, i:i + S].add(AtO[h].T)
        Omega = Omega.at[j:j + S, j:j + S].add(om[h])
    return Omega


def add_omega_prior(Omega: jax.Array) -> jax.Array:
    """Identity prior on the first state block — the reference's placeholder
    (addOmegaPrior, feature_selector.cpp:602-609; real prior never wired)."""
    S = STATE_SIZE
    return Omega.at[:S, :S].add(jnp.eye(S, dtype=Omega.dtype))


# ----------------------------------------------------------------------------
# Per-feature expected information Δ_ℓ (calcInfoFromFeatures)
# ----------------------------------------------------------------------------


def nn_depths(cand_uv: jax.Array, lm_uv: jax.Array, lm_depth: jax.Array,
              lm_mask: jax.Array, default: float = 5.0) -> jax.Array:
    """Depth guess per candidate: depth of the nearest current landmark on
    the normalized image plane. Brute-force masked argmin — the TPU-native
    replacement for the reference's nanoflann 2-D KD-tree
    (initKDTree/findNNDepth, feature_selector.cpp:380-459)."""
    d2 = jnp.sum((cand_uv[:, None, :] - lm_uv[None, :, :]) ** 2, -1)
    d2 = jnp.where(lm_mask[None, :] > 0, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    best = jnp.take(lm_depth, idx)
    any_lm = jnp.any(lm_mask > 0)
    return jnp.where(any_lm, best, default)


def delta_ell(bearing_c: jax.Array, depth: jax.Array,
              p_wc: jax.Array, q_wc: jax.Array,
              cfg: SelectorConfig, prob=None):
    """Δ_ℓ [D,D] + visibility count for ONE candidate feature.

    bearing_c: [3] calibrated [u,v,1] in the (k+1) camera; p_wc/q_wc: camera
    poses over the horizon [H+1] (index 1 = frame k+1, matching the
    reference's state_kkH indexing). vmap over candidates.

    With cfg.survival_weighting and a `prob`, block C_h is scaled p^h —
    the expected information at horizon frame h given per-frame track
    survival p (see SelectorConfig.survival_weighting). The caller must
    then NOT multiply Δ by p again.
    """
    H, S, D = cfg.horizon, STATE_SIZE, cfg.dim
    dtype = bearing_c.dtype

    u1 = bearing_c / jnp.maximum(jnp.linalg.norm(bearing_c), 1e-9)
    pell = p_wc[1] + lie.quat_rotate(q_wc[1], u1 * depth)   # world landmark

    def block_for(h):
        """C_h = BᵀB at horizon frame h (h ≥ 2), with FOV gating."""
        rel = lie.quat_rotate(lie.quat_conj(q_wc[h]), pell - p_wc[h])
        norm = jnp.linalg.norm(rel)
        uell = rel / jnp.maximum(norm, 1e-9)
        z = jnp.maximum(rel[2], 1e-9)
        in_fov = (rel[2] > 0.0) & \
            (jnp.abs(rel[0] / z) < cfg.fov_x * cfg.fov_margin) & \
            (jnp.abs(rel[1] / z) < cfg.fov_y * cfg.fov_margin)
        R_cw = lie.quat_to_rot(lie.quat_conj(q_wc[h]))
        Bh = lie.skew(uell) @ R_cw
        return (Bh.T @ Bh) * in_fov.astype(dtype), in_fov

    hs = jnp.arange(2, H + 1)
    Ch_tail, vis_tail = jax.vmap(block_for)(hs)           # [H-1,3,3]
    n_visible = 1 + jnp.sum(vis_tail)

    # frame k+1 block (always visible there — it was just detected)
    R_cw1 = lie.quat_to_rot(lie.quat_conj(q_wc[1]))
    B1 = lie.skew(u1) @ R_cw1
    C1 = B1.T @ B1
    Ch = jnp.concatenate([C1[None], Ch_tail], axis=0)     # [H,3,3] h=1..H
    if cfg.survival_weighting and prob is not None:
        w = prob ** jnp.arange(1, H + 1, dtype=dtype)     # p^h, h=1..H
        Ch = Ch * w[:, None, None]

    EtE = jnp.sum(Ch, axis=0)
    W = jnp.linalg.inv(EtE + 1e-12 * jnp.eye(3, dtype=dtype))

    # Δ blocks on position sub-blocks (9i, 9j), i,j = 1..H:
    # Big = blkdiag(C) − C W Cᵀ over the 3H-dim stacked position space,
    # then embed into the D-dim horizon state via the constant selector E.
    D_off = jnp.einsum("iab,bc,jdc->iajd", Ch, W, Ch)     # [H,3,H,3]
    Big = -D_off.reshape(3 * H, 3 * H)
    blkdiag = jax.scipy.linalg.block_diag(*[Ch[i] for i in range(H)])
    Big = Big + blkdiag
    E = _pos_embedding(H, S, D, dtype)                    # [3H, D]
    Delta = E.T @ Big @ E
    usable = n_visible >= 2   # must be triangulable over the horizon (:318)
    return Delta * usable.astype(dtype), n_visible


@functools.lru_cache(maxsize=8)
def _pos_embedding_np(H: int, S: int, D: int):
    import numpy as np
    E = np.zeros((3 * H, D))
    for i in range(H):
        for a in range(3):
            E[3 * i + a, S * (i + 1) + a] = 1.0
    return E


def _pos_embedding(H: int, S: int, D: int, dtype) -> jax.Array:
    return jnp.asarray(_pos_embedding_np(H, S, D), dtype)


# ----------------------------------------------------------------------------
# Greedy submodular logdet selection (selectInformativeFeatures)
# ----------------------------------------------------------------------------


def logdet_upper_bounds(Omega: jax.Array, Deltas: jax.Array,
                        probs: jax.Array) -> jax.Array:
    """Σ log diag(Ω + p·Δ) per candidate — the reference's lazy-greedy upper
    bound (sortedlogDetUB, feature_selector.cpp:690-728), batched."""
    diag = jnp.diagonal(Omega)[None, :] + \
        probs[:, None] * jnp.diagonal(Deltas, axis1=-2, axis2=-1)
    return jnp.sum(jnp.log(jnp.maximum(diag, 1e-12)), axis=-1)


@functools.partial(jax.jit, static_argnames=("kappa", "impl", "group"))
def select_informative(Omega: jax.Array, Deltas: jax.Array,
                       probs: jax.Array, valid: jax.Array, kappa: int,
                       impl: str = None, budget=None, group: int = None):
    """Exact greedy logdet maximization, all candidates scored per round.

    Mirrors selectInformativeFeatures (feature_selector.cpp:613-686) with the
    TPU-first twist: instead of the serial lazy-UB walk, every round scores
    ALL candidates in parallel — identical output (exact greedy ⊇ lazy
    greedy).

    Two scoring implementations of the SAME greedy (fp-level identical
    gains, parity-tested in tests/test_feature_selector.py):
    - "chol": logdet(Ω_acc + p_ℓ Δ_ℓ) per candidate as one batched
      [F,D,D] Cholesky per round — F·κ full factorizations total.
    - "lowrank": matrix-determinant-lemma scoring. Δ_ℓ = E_ᵀ·Big·E is
      PSD with support on the 3H position coordinates (see delta_ell), so
      Δ_ℓ = B_ℓ B_ℓᵀ with B_ℓ [D,r], r = 3H ≪ D (factored ONCE per call
      by a batched eigh on the [3H,3H] restriction). Each round then costs
      ONE D×D Cholesky of Ω_acc + ONE wide triangular solve
      L⁻¹[B_1…B_F] (an MXU-shaped TRSM) + F tiny [r,r] logdets:
      gain_ℓ = logdet(I_r + p_ℓ WᵀW), argmax-equivalent since
      logdet(Ω_acc) is constant within a round. Replaces the κ·F large
      factorizations that made the on-chip selector the streaming
      pipeline's bottleneck (results/r4/streaming_tpu.json).
    impl=None picks by backend at trace time.

    `budget` (optional, TRACED scalar ≤ kappa) caps how many of the
    `kappa` static rounds actually select — the dynamic κ̄−tracked budget
    of the reference (feature_selector.cpp:151-166) without a recompile
    per distinct budget.

    `group` (static, default 1 / env ANT_SELECT_GROUP): BLOCKED greedy —
    each round takes the top-`group` candidates by marginal gain and
    applies their Ω updates together, in ⌈κ/group⌉ rounds. group=1 is the
    reference's exact greedy. The greedy loop is latency-bound on TPU
    (κ sequential rounds of small-matrix algebra), so grouping divides
    the selector's wall time by ~group at a bounded optimality cost: the
    within-group interaction terms are ignored at *choice* time only
    (the Ω update itself is exact), and batched greedy keeps the
    (1−1/e)-style submodular approximation guarantee. Measured logdet
    gap vs exact greedy: tests/test_feature_selector.py.

    Returns (selected mask [F], Ω after the selected updates).
    """
    import os
    if impl is None:
        impl = os.environ.get("ANT_SELECT_IMPL") or (
            "chol" if jax.default_backend() == "cpu" else "lowrank")
    if group is None:
        group = int(os.environ.get("ANT_SELECT_GROUP", "1"))
    group = max(1, min(group, kappa)) if kappa else 1
    if budget is None:
        budget = kappa
    F = Deltas.shape[0]
    D = Omega.shape[0]
    dtype = Omega.dtype

    from anticipated_vins_mono_tpu.ops import pallas_kernels

    if impl == "lowrank":
        # position-space restriction: Big = E Δ Eᵀ (E Eᵀ = I on the 3H
        # position rows). Recover the embedding from the static layout.
        H = (D // STATE_SIZE) - 1
        E = _pos_embedding(H, STATE_SIZE, D, dtype)       # [3H, D]
        Big = jnp.einsum("ad,fde,be->fab", E, Deltas, E)  # [F,3H,3H]
        lam, V = jnp.linalg.eigh(Big)
        lam = jnp.maximum(lam, 0.0)
        Bs = jnp.einsum("fab,fb->fab", V, jnp.sqrt(lam))  # [F,3H,3H]
        Bfull = jnp.einsum("ad,fab->fdb", E, Bs)          # [F,D,r] r=3H
        r = Bfull.shape[-1]

        def round_body(_i, carry):
            Om, sel = carry
            L = jnp.linalg.cholesky(Om)
            wide = Bfull.transpose(1, 0, 2).reshape(D, F * r)
            W = jax.scipy.linalg.solve_triangular(L, wide, lower=True)
            W = W.reshape(D, F, r).transpose(1, 0, 2)     # [F,D,r]
            G = jnp.eye(r, dtype=dtype)[None] \
                + probs[:, None, None] * jnp.einsum("fda,fdb->fab", W, W)
            # [r,r] with r=3H=39 ≪ the Pallas kernel's 128 padding tile —
            # XLA's batched Cholesky is the right tool at this size
            gain = lie.logdet_psd(G)
            gain = jnp.where((valid > 0) & (sel < 0.5), gain, -jnp.inf)
            gain = jnp.where(jnp.isnan(gain), -jnp.inf, gain)
            return _apply_topg(Om, sel, gain, probs, Deltas, budget,
                               group, dtype)
    else:
        def round_body(_i, carry):
            Om, sel = carry
            cand = Om[None] + probs[:, None, None] * Deltas
            # batch-tiled Pallas elimination kernel on TPU (1.3x XLA's
            # batched Cholesky for the 126x126 Omega batches), XLA elsewhere
            ld = pallas_kernels.logdet_psd(cand)
            ld = jnp.where((valid > 0) & (sel < 0.5), ld, -jnp.inf)
            ld = jnp.where(jnp.isnan(ld), -jnp.inf, ld)
            return _apply_topg(Om, sel, ld, probs, Deltas, budget,
                               group, dtype)

    Om0 = Omega
    sel0 = jnp.zeros(F, dtype)
    n_rounds = -(-kappa // group)
    Om, sel = jax.lax.fori_loop(0, n_rounds, lambda i, c: round_body(i, c),
                                (Om0, sel0))
    return sel, Om


def _apply_topg(Om, sel, gain, probs, Deltas, budget, group: int, dtype):
    """One blocked-greedy round: admit the top-`group` candidates by gain
    (subject to the remaining traced budget), apply their Ω updates as one
    einsum. group=1 reduces to the exact-greedy argmax round."""
    n_already = jnp.sum(sel)
    if group == 1:
        best = jnp.argmax(gain)
        ok = jnp.isfinite(gain[best]) & (n_already < budget)
        sel = sel.at[best].add(ok.astype(dtype))
        Om = Om + ok.astype(dtype) * probs[best] * Deltas[best]
        return Om, jnp.minimum(sel, 1.0)
    vals, idx = jax.lax.top_k(gain, group)
    ranks = jnp.arange(group, dtype=n_already.dtype)
    ok = jnp.isfinite(vals) & (n_already + ranks < budget)
    sel = sel.at[idx].add(ok.astype(dtype))
    Om = Om + jnp.einsum("g,gde->de",
                         ok.astype(dtype) * probs[idx], Deltas[idx])
    return Om, jnp.minimum(sel, 1.0)
