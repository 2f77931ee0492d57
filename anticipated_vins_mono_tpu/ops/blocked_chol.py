"""Blocked batched Cholesky + solves that keep the MXU busy.

XLA's `jnp.linalg.cholesky` / `cho_solve` on TPU lower to row-serial
triangular loops — measured 3.2 ms + 3.9 ms for [64,178,178] systems, 74%
of the solver's Schur stage (results/r3/bench_profile.json). The classic
TPU formulation: right-looking block Cholesky where only the BS×BS
diagonal factorization stays serial; panels are formed by multiplying with
the INVERTED diagonal block (TRSM→GEMM trick) and trailing updates are
rank-BS matmuls — all MXU work. Forward/backward substitution likewise
becomes a static chain of small matmuls.

Accuracy: the diagonal-block inverse multiplies the panel error by
κ(L_kk) ≤ κ(A_kk)^½ — for the solver's Jacobi-normalized, damped matrices
(unit diagonal) this is mild; the f32 perf path tolerates it and the df32
accuracy path wraps the solve in iterative refinement anyway
(ops/df32.cho_solve_refined), which absorbs the difference.

Used in the LM hot loop behind `WindowConfig.fast_chol`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_to(A, bs):
    D = A.shape[-1]
    P = (-D) % bs
    if P == 0:
        return A, D
    # identity padding keeps the matrix SPD and the factor block-diagonal
    out = jnp.zeros(A.shape[:-2] + (D + P, D + P), A.dtype)
    out = out.at[..., :D, :D].set(A)
    eye = jnp.eye(P, dtype=A.dtype)
    out = out.at[..., D:, D:].set(jnp.broadcast_to(eye, A.shape[:-2] + (P, P)))
    return out, D


def blocked_cholesky(A: jax.Array, bs: int = 32):
    """Batched lower-Cholesky of SPD A [..., D, D] (D padded to bs
    internally). Returns (L [..., Dp, Dp], Linv_diag [..., nb, bs, bs]) —
    the inverted diagonal blocks are reused by the solves."""
    Ap, D = _pad_to(A, bs)
    Dp = Ap.shape[-1]
    nb = Dp // bs
    L = jnp.zeros_like(Ap)
    eye = jnp.eye(bs, dtype=A.dtype)
    Linvs = []
    for k in range(nb):
        sl = slice(k * bs, (k + 1) * bs)
        Akk = Ap[..., sl, sl]
        Lkk = jnp.linalg.cholesky(Akk)
        Lkk_inv = jax.scipy.linalg.solve_triangular(
            Lkk, jnp.broadcast_to(eye, Lkk.shape), lower=True)
        Linvs.append(Lkk_inv)
        L = L.at[..., sl, sl].set(Lkk)
        if k + 1 < nb:
            tr = slice((k + 1) * bs, Dp)
            panel = Ap[..., tr, sl] @ jnp.swapaxes(Lkk_inv, -1, -2)  # GEMM
            L = L.at[..., tr, sl].set(panel)
            Ap = Ap.at[..., tr, tr].add(
                -(panel @ jnp.swapaxes(panel, -1, -2)))              # GEMM
    return L, jnp.stack(Linvs, axis=-3), D


def blocked_cho_solve(L, Linv_diag, D: int, b: jax.Array, bs: int = 32):
    """Solve A x = b given `blocked_cholesky` output. b [..., D] → x [..., D].
    Both substitutions are static chains of [bs×bs]·[bs] / panel matmuls."""
    Dp = L.shape[-1]
    nb = Dp // bs
    pad = Dp - D
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (pad,), b.dtype)], axis=-1)
    y = jnp.zeros_like(b)
    # forward: L y = b
    for k in range(nb):
        sl = slice(k * bs, (k + 1) * bs)
        rhs = b[..., sl]
        if k:
            rhs = rhs - jnp.einsum(
                "...ij,...j->...i", L[..., sl, : k * bs], y[..., : k * bs])
        y = y.at[..., sl].set(jnp.einsum(
            "...ij,...j->...i", Linv_diag[..., k, :, :], rhs))
    # backward: Lᵀ x = y
    x = jnp.zeros_like(b)
    for k in reversed(range(nb)):
        sl = slice(k * bs, (k + 1) * bs)
        rhs = y[..., sl]
        if k + 1 < nb:
            tr = slice((k + 1) * bs, Dp)
            rhs = rhs - jnp.einsum(
                "...ji,...j->...i", L[..., tr, sl], x[..., tr])
        x = x.at[..., sl].set(jnp.einsum(
            "...ji,...j->...i", Linv_diag[..., k, :, :], rhs))
    return x[..., :D]
