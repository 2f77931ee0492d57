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
