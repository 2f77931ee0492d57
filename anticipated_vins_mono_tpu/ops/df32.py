"""Double-float (df32) arithmetic: ~49-bit-mantissa accumulation in native f32.

Why this exists. The window solver needs three numerically-delicate steps —
the robust-cost sum the LM accept/reject compares (differences ~1e-7
relative), the Schur cancellation H − H_lpᵀ diag⁻¹ H_lp, and the
marginalization keep−drop subtraction — that the reference performs in f64
Ceres (/root/reference/vins_estimator/src/estimator.cpp:794-809,
factor/marginalization_factor.cpp:267-291). On TPU, f64 exists only as
software x64 emulation, which on this environment's remote axon backend is
both slow and demonstrably unreliable for the estimator (round-2
results/mixed_precision_tpu.json: never initializes). This module provides
the classical error-free-transformation toolbox (Knuth TwoSum, Dekker
TwoProd via Veltkamp splitting — Shewchuk 1997 / Hida-Li-Bailey double-double)
so those steps run as PAIRS of native f32 arrays: `hi` carries the value,
`lo` the rounding error. Every op lowers to plain VPU adds/muls — no x64,
jit/vmap/scan-friendly, TPU-native.

Precision: a df32 value represents hi+lo with ≥2·24−1 = 47 significant bits
(f64 has 53). The solver's f32-state runs need ~f64 ACCUMULATION, not f64
STATE (round-2 CPU evidence: f32 state + f64 accumulation = 1.33× of full
f64 ATE) — 47 bits of accumulator is comfortably inside that envelope.

Conventions: a "DF" is the NamedTuple (hi, lo) with |lo| ≤ ulp(hi)/2,
broadcastable like any array pair. Functions suffixed `_f` take a plain f32
operand. All inputs must be finite f32; the algorithms assume round-to-
nearest and NO unsafe reassociation (XLA default).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Veltkamp splitting constant for binary32: 2^12 + 1. Splits a 24-bit
# mantissa into two 12-bit halves whose pairwise products are exact in f32.
_SPLIT = 4097.0


class DF(NamedTuple):
    """A double-float array: value = hi + lo (element-wise, unevaluated)."""

    hi: jax.Array
    lo: jax.Array

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape


def df(x) -> DF:
    """Lift an f32 array (exactly) into DF."""
    x = jnp.asarray(x)
    return DF(x, jnp.zeros_like(x))


def to_f32(x: DF) -> jax.Array:
    """Round back to a single f32 (hi already is the correct rounding)."""
    return x.hi + x.lo


def two_sum(a, b):
    """Error-free sum: s + e == a + b exactly, s = fl(a+b). Knuth, 6 flops,
    branch-free (no magnitude ordering required)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (Dekker, 3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _veltkamp(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: p + e == a*b exactly, p = fl(a*b). Dekker via
    Veltkamp splitting (17 flops; exactness needs no FMA — and an XLA-fused
    FMA in the error term only tightens it)."""
    p = a * b
    a_hi, a_lo = _veltkamp(a)
    b_hi, b_lo = _veltkamp(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def add(x: DF, y: DF) -> DF:
    """Full double-double addition (Knuth/HLB accurate variant, 20 flops)."""
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    s, e = fast_two_sum(s, e)
    return DF(s, e)


def add_f(x: DF, b) -> DF:
    """DF + f32."""
    s, e = two_sum(x.hi, b)
    e = e + x.lo
    s, e = fast_two_sum(s, e)
    return DF(s, e)


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def mul(x: DF, y: DF) -> DF:
    """DF × DF (the x.lo*y.lo term is below the result ulp and dropped)."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    p, e = fast_two_sum(p, e)
    return DF(p, e)


def mul_f(x: DF, b) -> DF:
    """DF × f32."""
    p, e = two_prod(x.hi, b)
    e = e + x.lo * b
    p, e = fast_two_sum(p, e)
    return DF(p, e)


def prod_f(a, b) -> DF:
    """f32 × f32 → DF, exact."""
    p, e = two_prod(a, b)
    return DF(p, e)


def less(x: DF, y: DF):
    """x < y, resolved through both limbs (d.hi of the difference carries
    the sign because |lo| ≤ ulp(hi)/2)."""
    d = sub(x, y)
    return d.hi < 0


def _pad_pow2(x, axis):
    n = x.shape[axis]
    m = 1 << max(0, (n - 1).bit_length())
    if m == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, m - n)
    return jnp.pad(x, pad), n


def tree_sum(x, axis=0) -> DF:
    """Compensated pairwise sum of an f32 array along `axis` → DF.

    log2(n) levels of error-free TwoSum at the leaves and DF adds above —
    fully vectorized (no scan), error O(eps²·n) instead of f32's O(eps·√n).
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    x, _ = _pad_pow2(x, 0)
    n = x.shape[0]
    if n == 1:
        return DF(x[0], jnp.zeros_like(x[0]))
    s, e = two_sum(x[0::2], x[1::2])
    acc = DF(s, e)
    while acc.hi.shape[0] > 1:
        acc = add(DF(acc.hi[0::2], acc.lo[0::2]),
                  DF(acc.hi[1::2], acc.lo[1::2]))
    return DF(acc.hi[0], acc.lo[0])


def tree_sum_df(x: DF, axis=0) -> DF:
    """Compensated pairwise sum of a DF array along `axis` → DF."""
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    hi, _ = _pad_pow2(hi, 0)
    lo, _ = _pad_pow2(lo, 0)
    acc = DF(hi, lo)
    while acc.hi.shape[0] > 1:
        acc = add(DF(acc.hi[0::2], acc.lo[0::2]),
                  DF(acc.hi[1::2], acc.lo[1::2]))
    return DF(acc.hi[0], acc.lo[0])


def dot(a, b, axis=0) -> DF:
    """Compensated inner product of f32 arrays along `axis` → DF
    (Ogita-Rump-Oishi Dot2: exact products, compensated sum)."""
    p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
    s = tree_sum(p, axis=axis)
    # the product error terms are ~eps smaller — a plain sum suffices
    return add_f(s, jnp.sum(e, axis=axis))


def matvec(A: DF, x) -> DF:
    """DF[m,n] @ f32[n] → DF[m], compensated along the contraction."""
    p, e = two_prod(A.hi, x[None, :])
    s = tree_sum(p, axis=1)
    corr = jnp.sum(e + A.lo * x[None, :], axis=1)
    return add_f(s, corr)


def outer_acc(B, w=None, chunk: int = 8) -> DF:
    """Σ_k w[k]·B[k,:]⊗B[k,:] with exact products and DF accumulation.

    The Schur-correction kernel: B is [K, D] (f32), w optional [K] (f32).
    Runs as a `lax.scan` over K/chunk steps, each materializing only a
    [chunk, D, D] product tile — O(D²) working set, never [K, D, D].
    """
    B = jnp.asarray(B)
    K, D = B.shape
    pad = (-K) % chunk
    if pad:
        B = jnp.pad(B, ((0, pad), (0, 0)))
        w = None if w is None else jnp.pad(w, (0, pad))
    Bc = B.reshape(-1, chunk, D)
    wc = None if w is None else w.reshape(-1, chunk)

    def step(acc, args):
        if wc is None:
            (bk,) = args
            p, e = two_prod(bk[:, :, None], bk[:, None, :])
        else:
            bk, wk = args
            p, e = two_prod(bk[:, :, None], bk[:, None, :])
            t = mul_f(DF(p, e), wk[:, None, None])
            p, e = t.hi, t.lo
        tile = tree_sum_df(DF(p, e), axis=0)
        return add(acc, tile), None

    z = jnp.zeros((D, D), B.dtype)
    xs = (Bc,) if wc is None else (Bc, wc)
    acc, _ = jax.lax.scan(step, DF(z, z), xs)
    return acc


def matmul_acc(A, B, w=None, chunk: int = 8) -> DF:
    """Σ_k w[k]·A[k,:]ᵀ⊗B[k,:] (i.e. Aᵀ diag(w) B) with exact products and
    DF accumulation: A [K,m], B [K,n] → DF[m,n]. Same chunked-scan structure
    as `outer_acc`; the optional weight is applied pair-preserving."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    K, m = A.shape
    n = B.shape[1]
    pad = (-K) % chunk
    if pad:
        A = jnp.pad(A, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        w = None if w is None else jnp.pad(w, (0, pad))
    Ac = A.reshape(-1, chunk, m)
    Bc = B.reshape(-1, chunk, n)
    wc = None if w is None else w.reshape(-1, chunk)

    def step(acc, args):
        if wc is None:
            ak, bk = args
            p, e = two_prod(ak[:, :, None], bk[:, None, :])
        else:
            ak, bk, wk = args
            p, e = two_prod(ak[:, :, None], bk[:, None, :])
            t = mul_f(DF(p, e), wk[:, None, None])
            p, e = t.hi, t.lo
        tile = tree_sum_df(DF(p, e), axis=0)
        return add(acc, tile), None

    z = jnp.zeros((m, n), A.dtype)
    xs = (Ac, Bc) if wc is None else (Ac, Bc, wc)
    acc, _ = jax.lax.scan(step, DF(z, z), xs)
    return acc


def matmul_df_f(A: DF, B) -> DF:
    """DF[m,k] @ f32[k,n] → DF[m,n], compensated along the (small)
    contraction axis k. Materializes one [k,m,n] product tile — use only
    for small k (the marginalization's 15-dim drop block)."""
    B = jnp.asarray(B)
    p, e = two_prod(A.hi.T[:, :, None], B[:, None, :])     # [k,m,n]
    s = tree_sum(p, axis=0)
    corr = jnp.sum(e + A.lo.T[:, :, None] * B[:, None, :], axis=0)
    return add_f(s, corr)


def eigh_pinv_solve(A: DF, B: DF, eps_rel: float = 1e-5, iters: int = 2) -> DF:
    """X ≈ A⁺ @ B for a small symmetric PSD DF matrix A [k,k] and DF
    B [k,n], via Jacobi-normalized f32 `eigh` pseudo-inverse + DF iterative
    refinement (range-space components converge to DF accuracy; null-space
    components stay zero, which is the pseudo-inverse convention).

    Returns X as a DF PAIR (leading solve, accumulated refinement
    corrections): rounding X to a single f32 would re-inject eps32·|X|
    into the caller's catastrophic keep−drop cancellation — the pair keeps
    the correction term explicit so downstream products stay compensated."""
    d = to_f32(DF(jnp.diagonal(A.hi), jnp.diagonal(A.lo)))
    s = jnp.where(d > 1e-20, jax.lax.rsqrt(jnp.maximum(d, 1e-20)), 0.0)
    An = to_f32(mul_f(A, s[:, None] * s[None, :]))
    w, V = jnp.linalg.eigh(An)
    wmax = jnp.maximum(jnp.max(w), 1e-20)
    ok = w > eps_rel * wmax
    inv_w = jnp.where(ok, 1.0 / jnp.where(ok, w, 1.0), 0.0)

    def pinv_apply(R):   # A⁺ R = S V inv_w Vᵀ S R
        return s[:, None] * (V @ (inv_w[:, None] * (V.T @ (s[:, None] * R))))

    x1 = pinv_apply(to_f32(B))
    x2 = jnp.zeros_like(x1)
    for _ in range(iters):
        R = sub(sub(B, matmul_df_f(A, x1)), matmul_df_f(A, x2))
        x2 = x2 + pinv_apply(to_f32(R))
    return DF(x1, x2)


def matmul_df_df(A: DF, X: DF) -> DF:
    """DF[m,k] @ DF[k,n] → DF[m,n] where X's limbs are an (approximation,
    correction) pair (e.g. from `eigh_pinv_solve`): compensated leading
    product plus the small cross terms."""
    lead = matmul_df_f(A, X.hi)
    corr = matmul_df_f(A, X.lo)
    return add(lead, corr)


def cho_solve_refined(A: DF, b: DF, iters: int = 2):
    """Solve A x = b via f32 Cholesky + DF iterative refinement.

    A.hi must be SPD and reasonably scaled (the solver Jacobi-normalizes to
    unit diagonal first). Refinement with the residual computed in DF drives
    the forward error to ~eps_f32 of the TRUE solution — the classical
    mixed-precision scheme (f32 factorization, extended-precision residual)
    replacing the f64 `cho_solve` of the x64 path.
    """
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(A.hi)
    x = jsl.cho_solve((L, True), to_f32(b))
    for _ in range(iters):
        r = sub(b, matvec(A, x))
        x = x + jsl.cho_solve((L, True), to_f32(r))
    return x
