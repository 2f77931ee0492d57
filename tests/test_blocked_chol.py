"""Blocked batched Cholesky vs LAPACK oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from anticipated_vins_mono_tpu.ops.blocked_chol import (
    blocked_cho_solve, blocked_cholesky)

RNG = np.random.default_rng(3)


def _spd(B, D, cond=1e4):
    U = np.linalg.qr(RNG.standard_normal((B, D, D)))[0]
    w = np.logspace(0, np.log10(cond), D)
    A = np.einsum("bij,j,bkj->bik", U, w, U)
    d = 1.0 / np.sqrt(np.einsum("bii->bi", A))
    return A * d[:, :, None] * d[:, None, :]  # unit diagonal, like the solver


def test_blocked_matches_direct_solve():
    B, D = 8, 178
    A = jnp.asarray(_spd(B, D), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((B, D)), jnp.float32)
    L, Linv, D0 = jax.jit(blocked_cholesky)(A)
    x = jax.jit(lambda L_, Li_, b_: blocked_cho_solve(L_, Li_, D, b_))(
        L, Linv, b)
    x_ref = np.linalg.solve(np.float64(A), np.float64(b)[..., None])[..., 0]
    rel = np.max(np.abs(np.float64(x) - x_ref)) / np.max(np.abs(x_ref))
    assert rel < 5e-3, rel  # f32, cond 1e4 → κ·eps ≈ 1e-3


def test_blocked_reconstructs_matrix():
    B, D = 4, 64
    A = jnp.asarray(_spd(B, D, cond=100.0), jnp.float32)
    L, _, D0 = blocked_cholesky(A)
    rec = np.float64(L) @ np.swapaxes(np.float64(L), -1, -2)
    rel = np.max(np.abs(rec[:, :D, :D] - np.float64(A)))
    assert rel < 1e-5, rel


def test_exact_multiple_of_block():
    B, D = 4, 96
    A = jnp.asarray(_spd(B, D, cond=10.0), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((B, D)), jnp.float32)
    L, Linv, D0 = blocked_cholesky(A)
    assert D0 == D and L.shape[-1] == D
    x = blocked_cho_solve(L, Linv, D, b)
    x_ref = np.linalg.solve(np.float64(A), np.float64(b)[..., None])[..., 0]
    assert np.max(np.abs(np.float64(x) - x_ref)) < 1e-4


def test_vmapped_unbatched_form():
    # the solver calls it per-scenario under vmap — same path must work
    D = 178
    A = jnp.asarray(_spd(6, D), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((6, D)), jnp.float32)

    def one(a, bb):
        L, Linv, _ = blocked_cholesky(a)
        return blocked_cho_solve(L, Linv, D, bb)

    x = jax.jit(jax.vmap(one))(A, b)
    x_ref = np.linalg.solve(np.float64(A), np.float64(b)[..., None])[..., 0]
    assert np.max(np.abs(np.float64(x) - x_ref)) / np.max(np.abs(x_ref)) < 5e-3
