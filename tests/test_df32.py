"""df32 (double-float) arithmetic vs NumPy f64 oracles.

The df32 toolbox replaces the solver's f64 casts on TPU (where x64 is
emulated and unreliable — round-2 results/mixed_precision_tpu.json); these
tests prove each primitive reaches ~2×f32 precision using only f32 ops, by
comparing against true f64 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anticipated_vins_mono_tpu.ops import df32

F32 = jnp.float32
EPS32 = float(np.finfo(np.float32).eps)   # 1.19e-7
RNG = np.random.default_rng(7)


def _f32(x):
    return jnp.asarray(np.asarray(x, np.float32), F32)


def test_two_sum_exact():
    a = _f32(RNG.standard_normal(1000) * 1e4)
    b = _f32(RNG.standard_normal(1000) * 1e-4)
    s, e = df32.two_sum(a, b)
    # error-free: s + e == a + b exactly (check in f64)
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact():
    a = _f32(RNG.standard_normal(1000) * 37.0)
    b = _f32(RNG.standard_normal(1000) * 0.013)
    p, e = df32.two_prod(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_add_catastrophic_cancellation():
    # 1 + 2^-20 - 1 flattens to 0 or 2^-20±big error in plain f32 chains;
    # DF keeps it exact
    one = df32.df(_f32(1.0))
    tiny = df32.df(_f32(2.0 ** -20))
    x = df32.add(one, tiny)
    y = df32.add_f(x, _f32(-1.0))
    assert float(df32.to_f32(y)) == 2.0 ** -20


def test_tree_sum_precision():
    # the [1e8, 1, -1e8] pattern: the ones sit below ulp(1e8)=8, so ANY f32
    # summation order that interleaves them with the big values drops them;
    # the compensated tree keeps them exactly
    n = 3 * 512
    x = np.tile(np.asarray([1e8, 1.0, -1e8], np.float32), n // 3)
    ref = float(np.sum(np.asarray(x, np.float64)))  # == 512
    got = df32.tree_sum(jnp.asarray(x, F32))
    err = abs(float(np.float64(got.hi) + np.float64(got.lo)) - ref)
    assert err < 1e-6 * max(abs(ref), 1.0)
    # adjacent-pairwise f32 (what a plain XLA reduce does at best) is way off
    naive = np.float32(0.0)
    for v in x:
        naive = np.float32(naive + v)
    naive_err = abs(float(naive) - ref)
    assert naive_err > 100 * max(err, 1e-30)


def test_tree_sum_odd_length_axis():
    x = RNG.standard_normal((5, 7)).astype(np.float32)
    got = df32.tree_sum(jnp.asarray(x), axis=1)
    ref = np.sum(np.asarray(x, np.float64), axis=1)
    np.testing.assert_allclose(
        np.float64(got.hi) + np.float64(got.lo), ref, rtol=1e-12)


def test_dot_ill_conditioned():
    # Ogita-Rump-Oishi style: condition the dot product to ~1e10
    n = 512
    a = (RNG.standard_normal(n) * np.logspace(0, 8, n)).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)
    ref = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    got = df32.dot(jnp.asarray(a), jnp.asarray(b))
    err = abs(float(np.float64(got.hi) + np.float64(got.lo)) - ref)
    scale = float(np.dot(np.abs(a).astype(np.float64), np.abs(b)))
    assert err < 1e-9 * scale


def test_outer_acc_matches_f64():
    K, D = 37, 24
    B = RNG.standard_normal((K, D)).astype(np.float32) * 100.0
    w = np.abs(RNG.standard_normal(K)).astype(np.float32)
    ref = np.einsum("kd,k,ke->de", np.float64(B), np.float64(w),
                    np.float64(B))
    got = df32.outer_acc(jnp.asarray(B), jnp.asarray(w))
    val = np.float64(got.hi) + np.float64(got.lo)
    np.testing.assert_allclose(val, ref, rtol=3e-7, atol=1e-4)
    # and the hi+lo pair is strictly better than a plain f32 einsum
    f32v = np.float64(np.einsum("kd,k,ke->de", B, w, B))
    assert (np.max(np.abs(val - ref)) <=
            np.max(np.abs(f32v - ref)) + 1e-12)


def test_matmul_acc_matches_f64():
    K, m, n = 53, 17, 9
    A = RNG.standard_normal((K, m)).astype(np.float32)
    B = RNG.standard_normal((K, n)).astype(np.float32)
    ref = np.float64(A).T @ np.float64(B)
    got = df32.matmul_acc(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(
        np.float64(got.hi) + np.float64(got.lo), ref, rtol=1e-6, atol=1e-6)


def test_matvec():
    m, n = 13, 29
    Ahi = RNG.standard_normal((m, n)).astype(np.float32)
    Alo = (RNG.standard_normal((m, n)) * 1e-8).astype(np.float32)
    x = RNG.standard_normal(n).astype(np.float32)
    ref = (np.float64(Ahi) + np.float64(Alo)) @ np.float64(x)
    got = df32.matvec(df32.DF(jnp.asarray(Ahi), jnp.asarray(Alo)),
                      jnp.asarray(x))
    np.testing.assert_allclose(
        np.float64(got.hi) + np.float64(got.lo), ref, rtol=1e-6, atol=1e-7)


def test_cho_solve_refined_beats_f32():
    # moderately ill-conditioned SPD system (cond ~1e6): plain f32 solve has
    # ~1e-1 relative error; refined solve must land at ~f32 eps of truth
    D = 48
    U = np.linalg.qr(RNG.standard_normal((D, D)))[0]
    w = np.logspace(0, 6, D)
    A64 = (U * w) @ U.T
    x_true = RNG.standard_normal(D)
    b64 = A64 @ x_true
    # Jacobi-normalize (what the solver does) then hand DF versions over
    d = 1.0 / np.sqrt(np.diag(A64))
    An = A64 * d[:, None] * d[None, :]
    bn = b64 * d
    A_hi = An.astype(np.float32)
    A_lo = (An - np.float64(A_hi)).astype(np.float32)
    b_hi = bn.astype(np.float32)
    b_lo = (bn - np.float64(b_hi)).astype(np.float32)
    A = df32.DF(jnp.asarray(A_hi), jnp.asarray(A_lo))
    b = df32.DF(jnp.asarray(b_hi), jnp.asarray(b_lo))
    y = np.asarray(df32.cho_solve_refined(A, b, iters=2), np.float64)
    x = y * d
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    # plain f32 baseline
    import scipy.linalg as sl
    L = np.linalg.cholesky(A_hi.astype(np.float32))
    y0 = sl.cho_solve((L, True), b_hi)
    rel0 = np.linalg.norm(y0 * d - x_true) / np.linalg.norm(x_true)
    assert rel < 5e-6, rel
    assert rel < rel0 / 10, (rel, rel0)


def test_less_resolves_through_lo():
    a = df32.DF(_f32(1.0), _f32(1e-9))
    b = df32.DF(_f32(1.0), _f32(2e-9))
    assert bool(df32.less(a, b))
    assert not bool(df32.less(b, a))


def test_jit_and_no_x64_dependence():
    # the whole point: must work identically with x64 semantics disabled.
    # jit-compile a compound expression and check vs f64 oracle.
    x = RNG.standard_normal(256).astype(np.float32) * 1e3

    @jax.jit
    def f(v):
        s = df32.tree_sum(v)
        return df32.add_f(s, jnp.float32(-np.sum(x, dtype=np.float64)
                                         ).astype(jnp.float32))

    out = f(jnp.asarray(x, F32))
    resid = float(np.float64(out.hi) + np.float64(out.lo))
    true_resid = (float(np.sum(np.float64(x)))
                  + float(jnp.float32(-np.sum(x, dtype=np.float64))))
    assert abs(resid - true_resid) < 1e-4
