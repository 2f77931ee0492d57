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


def _logdet_kernel(m_ref, out_ref, scratch):
    """One PSD matrix [N,N] in VMEM → logdet via in-place elimination.

    After eliminating column j the trailing block is updated with the
    rank-1 term −c·cᵀ/d (c = column below the pivot); Σ log d over pivots
    is the log-determinant. All data stays in VMEM; the update is one
    [N,N] outer-product fused subtract per step.
    """
    n = m_ref.shape[-1]
    scratch[:, :] = m_ref[0, :, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, acc):
        # single dynamic-column loads are not tile-aligned on TPU: extract
        # column j by a masked row-reduction over the full VMEM tile instead
        m = scratch[:, :]
        col_full = jnp.sum(jnp.where(col_ids == j, m, 0.0), axis=1,
                           keepdims=True)              # [N,1]
        d = jnp.maximum(jnp.sum(jnp.where(row_ids == j, col_full, 0.0)),
                        1e-30)
        col = jnp.where(row_ids > j, col_full, 0.0)
        scratch[:, :] = m - (col @ col.T) / d
        return acc + jnp.log(d)

    acc = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    # scalar stores to VMEM are unsupported: write as a (1,1) tile
    out_ref[0, :, :] = jnp.full((1, 1), acc, jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def logdet_psd_batched(M: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched PSD log-determinant via the Pallas elimination kernel.

    M: [B,N,N] float32. Pads N to a multiple of 128 (unit diagonal ⇒ no
    logdet contribution). Returns [B] float32.
    """
    B, N, _ = M.shape
    Np = max(_round_up(N, 128), 128)
    if Np != N:
        pad = Np - N
        eye = jnp.zeros((Np, Np), M.dtype).at[
            jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        Mp = jnp.pad(M, ((0, 0), (0, pad), (0, pad))) + eye[None]
    else:
        Mp = M

    out = pl.pallas_call(
        _logdet_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Np, Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Np, Np), jnp.float32)],
        interpret=interpret,
    )(Mp.astype(jnp.float32))
    return out[:, 0, 0]


def logdet_psd(M: jax.Array, use_pallas: bool = True) -> jax.Array:
    """[..., N, N] PSD logdet: Pallas kernel on TPU, XLA Cholesky otherwise."""
    if use_pallas and jax.default_backend() == "tpu" and M.ndim == 3:
        return logdet_psd_batched(M)
    return lie.logdet_psd(M)
