"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops import pallas_kernels as pk


def _psd_batch(B, N, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, N, N)).astype(dtype) * 0.2
    return jnp.asarray(A @ A.transpose(0, 2, 1) + 3 * np.eye(N, dtype=dtype))


def test_logdet_matches_xla_128():
    M = _psd_batch(4, 128)
    ld = pk.logdet_psd_batched(M, interpret=True)
    ref = lie.logdet_psd(M)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ref), atol=2e-3)


def test_logdet_padding_126():
    """126 (the Ω dimension) pads to 128 with unit diagonal — exact."""
    M = _psd_batch(3, 126, seed=1)
    ld = pk.logdet_psd_batched(M, interpret=True)
    ref = lie.logdet_psd(M)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ref), atol=2e-3)


def test_logdet_identity():
    M = jnp.tile(jnp.eye(128, dtype=jnp.float32)[None], (2, 1, 1))
    ld = pk.logdet_psd_batched(M, interpret=True)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)


def test_dispatch_fallback_cpu():
    """On CPU backends logdet_psd falls back to the XLA path."""
    M = _psd_batch(2, 64, seed=2)
    out = pk.logdet_psd(M)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(lie.logdet_psd(M)), rtol=1e-5)
