"""Pallas TPU kernels for the hot dense ops.

The attention selector's inner loop is κ rounds × F candidates of 126×126
Cholesky log-determinants (the reference's single-threaded hot loop,
feature_selector.cpp:650-660 + Utility::logdet) — here a VMEM-resident
elimination kernel: each grid program keeps its matrix entirely in VMEM and
accumulates Σ log(pivot) through N rank-1 trailing updates (VPU), avoiding
XLA's generic Cholesky lowering. Matrices are padded to a 128 multiple with
unit diagonal, which adds exactly 0 to the log-determinant.

`logdet_psd_batched` is a drop-in for `ops.lie.logdet_psd` on [B,N,N] PSD
batches; `use_pallas=False` (or non-TPU backends) falls back to the XLA
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anticipated_vins_mono_tpu.ops import lie


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


BATCH_TILE = 16  # matrices eliminated simultaneously per grid program


def _logdet_kernel(m_ref, out_ref, scratch):
    """A TILE of PSD matrices [T,N,N] in VMEM → [T] logdets, batched
    elimination.

    The 128-step column elimination is inherently serial; the throughput
    trick is VECTORIZING EACH STEP ACROSS THE BATCH TILE (XLA's batched
    Cholesky does the same, which is why a one-matrix-per-program kernel
    loses): every iteration eliminates column j of all T matrices with one
    [T,N,N] fused multiply-subtract on the VPU.
    """
    T, n = m_ref.shape[0], m_ref.shape[-1]
    scratch[:, :, :] = m_ref[:, :, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n, 1), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n, n), 2)

    def body(j, acc):
        m = scratch[:, :, :]
        # column j of every matrix via masked reduce (single dynamic-column
        # loads are not tile-aligned on TPU)
        col_full = jnp.sum(jnp.where(col_ids == j, m, 0.0), axis=2,
                           keepdims=True)               # [T,N,1]
        d = jnp.maximum(jnp.sum(jnp.where(row_ids == j, col_full, 0.0),
                                axis=1, keepdims=True), 1e-30)  # [T,1,1]
        col = jnp.where(row_ids > j, col_full, 0.0)
        scratch[:, :, :] = m - col * jnp.swapaxes(col, 1, 2) / d
        return acc + jnp.log(d[:, 0, 0])

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((T,), jnp.float32))
    # tile-aligned output: broadcast the [T] result over an (8,128) tile
    row = jnp.pad(acc, (0, 128 - T))
    out_ref[0, :, :] = jnp.broadcast_to(row[None, :], (8, 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def logdet_psd_batched(M: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched PSD log-determinant via the Pallas elimination kernel.

    M: [B,N,N] float32. Pads N to a multiple of 128 (unit diagonal ⇒ no
    logdet contribution). Returns [B] float32.
    """
    B, N, _ = M.shape
    Np = max(_round_up(N, 128), 128)
    T = BATCH_TILE
    Bp = _round_up(B, T)
    Mp = M
    if Np != N:
        pad = Np - N
        eye = jnp.zeros((Np, Np), M.dtype).at[
            jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        Mp = jnp.pad(Mp, ((0, 0), (0, pad), (0, pad))) + eye[None]
    if Bp != B:
        # pad the batch with identity matrices (logdet 0)
        eye_b = jnp.broadcast_to(jnp.eye(Np, dtype=Mp.dtype),
                                 (Bp - B, Np, Np))
        Mp = jnp.concatenate([Mp, eye_b], axis=0)

    out = pl.pallas_call(
        _logdet_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp // T, 8, 128), jnp.float32),
        grid=(Bp // T,),
        in_specs=[pl.BlockSpec((T, Np, Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, Np, Np), jnp.float32)],
        interpret=interpret,
    )(Mp.astype(jnp.float32))
    return out[:, 0, :T].reshape(-1)[:B]


def logdet_psd(M: jax.Array, use_pallas: bool = True) -> jax.Array:
    """[..., N, N] PSD logdet: Pallas kernel on TPU, XLA Cholesky otherwise."""
    if use_pallas and jax.default_backend() == "tpu" and M.ndim == 3:
        return logdet_psd_batched(M)
    return lie.logdet_psd(M)


# ----------------------------------------------------------------------------
# Fused Schur-reduction + damped solve (the LM hot path)
# ----------------------------------------------------------------------------
#
# XLA lowers ops/window.schur_solve to a chain of kernels (einsum → add →
# cholesky → two triangular solves → matvecs) with an HBM round-trip between
# each. At the solver's shapes (D=178, F≤192) every one of those launches is
# latency-bound. This kernel does the whole thing in ONE launch with all
# operands VMEM-resident: the Schur reduction as an MXU matmul, then a
# vectorized Gauss-Jordan elimination (valid without pivoting: the matrix is
# the Jacobi-scaled, damped SPD reduced Hessian), then landmark
# back-substitution and the LM predicted-reduction scalar.


def _schur_solve_kernel(H_ref, g_ref, Hlp_ref, hll_ref, gl_ref, lam_ref,
                        out_dx_ref, out_rho_ref, out_pred_ref,
                        A_sc, W_sc):
    Dp = H_ref.shape[-1]
    lam = lam_ref[0, 0, 0]

    h_ll = hll_ref[0, 0, :]                                    # [Fp]
    h_ll_d = h_ll * (1.0 + lam) + 1e-12
    inv_h = jnp.where(h_ll > 1e-10, 1.0 / h_ll_d, 0.0)
    # W = inv_h[:,None] * H_lp ; H_red = H − H_lpᵀ W  (MXU)
    W_sc[:, :] = Hlp_ref[0, :, :] * inv_h[:, None]
    H_red = H_ref[0, :, :] - jax.lax.dot_general(
        Hlp_ref[0, :, :], W_sc[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    g_l = gl_ref[0, 0, :]
    g_red = g_ref[0, 0, :] - jnp.sum(W_sc[:, :] * g_l[:, None], axis=0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 1)
    diag_mask = (row_ids == col_ids).astype(jnp.float32)
    diag = jnp.sum(H_red * diag_mask, axis=1)               # [Dp]
    damp = lam * jnp.maximum(diag, 1e-8) + 1e-10
    A = H_red + damp[None, :] * diag_mask
    dscale = jax.lax.rsqrt(jnp.maximum(diag + damp, 1e-20))
    A_sc[:, :] = A * dscale[:, None] * dscale[None, :]
    b = -g_red * dscale                                     # solve An y = b

    # Gauss-Jordan elimination, vectorized per column step: the rhs rides as
    # one extra trailing work column inside A_sc? No — keep it in the carry
    # (registers/VMEM): b is [Dp], updates are rank-1 on A and axpy on b.
    def body(j, b):
        Amat = A_sc[:, :]
        # row j / pivot via masked reductions (dynamic single-row slices are
        # not tile-aligned; same pattern as _logdet_kernel)
        rowj = jnp.sum(jnp.where(row_ids == j, Amat, 0.0), axis=0)  # [Dp]
        piv = jnp.sum(jnp.where(col_ids[0] == j, rowj, 0.0))
        piv = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        rowj = rowj / piv
        bj = jnp.sum(jnp.where(col_ids[0] == j, b, 0.0)) / piv
        colj = jnp.sum(jnp.where(col_ids == j, Amat, 0.0), axis=1)  # [Dp]
        is_j = (col_ids[0] == j).astype(jnp.float32)
        factor = colj * (1.0 - is_j)                        # zero at row j
        # A ← A − factor ⊗ rowj, then row j ← rowj (normalized)
        newA = Amat - factor[:, None] * rowj[None, :]
        newA = jnp.where(row_ids == j, rowj[None, :], newA)
        A_sc[:, :] = newA
        return b - factor * bj + is_j * (bj - b)

    y = jax.lax.fori_loop(0, Dp, body, b)
    dx = y * dscale
    # landmark back-substitution + predicted reduction
    Hlp_dx = jax.lax.dot_general(
        Hlp_ref[0, :, :], dx[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[:, 0]           # [Fp]
    d_rho = -inv_h * (g_l + Hlp_dx)
    pred = 0.5 * jnp.sum(dx * (damp * dx - g_red)) + \
        0.5 * jnp.sum(d_rho * (lam * h_ll * d_rho - g_l))
    out_dx_ref[0, 0, :] = dx
    out_rho_ref[0, 0, :] = d_rho
    out_pred_ref[0, 0, :] = jnp.broadcast_to(pred[None], (128,))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _schur_solve_fused_batched(H, g, H_lp, h_ll, g_l, lam,
                               interpret: bool = False):
    """Explicitly-batched fused solve: grid over scenarios, one system per
    program (each ~0.8 MB VMEM-resident)."""
    B, D = H.shape[0], H.shape[-1]
    F = H_lp.shape[-2]
    Dp = max(_round_up(D, 128), 128)
    Fp = max(_round_up(F, 128), 128)
    # pad: identity diagonal on the pad block keeps GJ well-posed; zero rhs
    # on the pad rows ⇒ zero solution there, no coupling back
    pad_eye = jnp.diag(jnp.concatenate(
        [jnp.zeros(D, jnp.float32), jnp.ones(Dp - D, jnp.float32)]))
    Hp = jnp.zeros((B, Dp, Dp), jnp.float32).at[:, :D, :D].set(H) + pad_eye
    gp = jnp.zeros((B, 1, Dp), jnp.float32).at[:, 0, :D].set(g)
    Hlp_p = jnp.zeros((B, Fp, Dp), jnp.float32).at[:, :F, :D].set(H_lp)
    hll_p = jnp.zeros((B, 1, Fp), jnp.float32).at[:, 0, :F].set(h_ll)
    gl_p = jnp.zeros((B, 1, Fp), jnp.float32).at[:, 0, :F].set(g_l)
    lam_p = jnp.asarray(lam, jnp.float32).reshape(B, 1, 1)

    dx, d_rho, pred = pl.pallas_call(
        _schur_solve_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, 1, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Fp), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, 128), jnp.float32)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Dp, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, Dp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((Dp, Dp), jnp.float32),
                        pltpu.VMEM((Fp, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # the GJ loop's per-iteration temporaries push Mosaic's scoped
            # VMEM stack past the 16 MB default; v5e has headroom
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Hp, gp, Hlp_p, hll_p, gl_p, lam_p)
    return dx[:, 0, :D], d_rho[:, 0, :F], pred[:, 0, 0]


@jax.custom_batching.custom_vmap
def schur_solve_fused(H: jax.Array, g: jax.Array, H_lp: jax.Array,
                      h_ll: jax.Array, g_l: jax.Array, lam: jax.Array):
    """One-launch damped Schur solve. H [D,D], g [D], H_lp [F,D], h_ll [F],
    g_l [F], lam scalar → (dx [D], d_rho [F], pred scalar), float32.

    Under vmap the batch axis becomes the Pallas GRID axis (custom_vmap
    rule below) — one scenario per program, VMEM-resident. Numerical parity
    with ops/window.schur_solve is asserted by tests/test_pallas_kernels.py
    in interpreter mode (via _schur_solve_fused_batched(interpret=True)).
    """
    dx, d_rho, pred = _schur_solve_fused_batched(
        H[None], g[None], H_lp[None], h_ll[None],
        g_l[None], jnp.reshape(lam, (1,)))
    return dx[0], d_rho[0], pred[0]


@schur_solve_fused.def_vmap
def _schur_solve_fused_vmap(axis_size, in_batched, H, g, H_lp, h_ll, g_l,
                            lam):
    bcast = lambda x, b: x if b else jnp.broadcast_to(
        x[None], (axis_size,) + jnp.shape(x))
    Hb, gb, Hlpb, hllb, glb = (
        bcast(H, in_batched[0]), bcast(g, in_batched[1]),
        bcast(H_lp, in_batched[2]), bcast(h_ll, in_batched[3]),
        bcast(g_l, in_batched[4]))
    lamb = lam if in_batched[5] else jnp.broadcast_to(
        jnp.reshape(lam, ()), (axis_size,))
    out = _schur_solve_fused_batched(Hb, gb, Hlpb, hllb, glb,
                                     jnp.reshape(lamb, (axis_size,)))
    return out, (True, True, True)
