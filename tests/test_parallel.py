"""Multi-chip solver tests on the virtual 8-device CPU mesh.

Checks the determinism requirement of SURVEY.md §7 hard part 7: the
feature-sharded (psum-reduced) solve must agree with the single-device solve
up to floating-point reassociation."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from anticipated_vins_mono_tpu.ops.window import WindowConfig, lm_solve
from anticipated_vins_mono_tpu.parallel.sharded import make_mesh, sharded_lm_solve
from anticipated_vins_mono_tpu.utils.synthetic import make_window_problem

CFG = WindowConfig(window=4, max_feats=32, iters=6)


def _batched(prob, B):
    batch = lambda x: jnp.broadcast_to(x[None], (B,) + x.shape)
    return (jtu.tree_map(batch, prob.init), jtu.tree_map(batch, prob.meas))


def test_sharded_matches_single_device():
    prob = make_window_problem(CFG, seed=0, perturb=0.3, pixel_noise=0.5)
    ref_st, ref_diag = lm_solve(prob.init, prob.meas, CFG)

    mesh = make_mesh(4, 2)
    state, meas = _batched(prob, 4)
    solver = sharded_lm_solve(CFG, mesh)
    out_st, diag = solver(state, meas)

    # all dp shards identical problem → identical answers
    np.testing.assert_allclose(out_st.p[0], out_st.p[-1], atol=1e-12)
    # sharded == unsharded up to reassociation
    np.testing.assert_allclose(np.asarray(out_st.p[0]),
                               np.asarray(ref_st.p), atol=1e-6)
    np.testing.assert_allclose(float(diag["cost"][0]),
                               float(ref_diag["cost"]), rtol=1e-5)


def test_sharded_dp_only():
    mesh = make_mesh(8, 1)
    probs = [make_window_problem(CFG, seed=s, perturb=0.3) for s in range(2)]
    state = jtu.tree_map(lambda *x: jnp.stack(list(x) * 4), *[p.init for p in probs])
    meas = jtu.tree_map(lambda *x: jnp.stack(list(x) * 4), *[p.meas for p in probs])
    solver = sharded_lm_solve(CFG, mesh)
    out_st, diag = solver(state, meas)
    assert np.all(np.asarray(diag["cost"]) < np.asarray(diag["cost0"]))
    # scenario 0 and 2 are the same problem
    np.testing.assert_allclose(out_st.p[0], out_st.p[2], atol=1e-12)


def test_global_mesh_layout():
    from anticipated_vins_mono_tpu.parallel.distributed import global_mesh
    mesh = global_mesh(fp=2)
    assert mesh.shape["fp"] == 2
    assert mesh.shape["dp"] == 4
    mesh1 = global_mesh(fp=1, dp=8)
    assert mesh1.shape["dp"] == 8


def test_sharded_selection_matches_single_device():
    """Candidate-sharded greedy (psum'd gains) must equal exact greedy."""
    from anticipated_vins_mono_tpu.models import anticipation as ant
    from anticipated_vins_mono_tpu.parallel.selector import sharded_select

    rng = np.random.default_rng(0)
    scfg = ant.SelectorConfig(horizon=6)
    D = scfg.dim
    B, F, kappa = 2, 16, 4
    A = rng.normal(size=(B, D + 4, D)) * 0.3
    Omega = jnp.asarray(np.einsum("bij,bik->bjk", A, A) + np.eye(D))
    Deltas = []
    for _ in range(B * F):
        Bm = rng.normal(size=(4, D))
        Deltas.append(Bm.T @ Bm)
    Deltas = jnp.asarray(np.stack(Deltas).reshape(B, F, D, D))
    probs = jnp.asarray(rng.uniform(0.5, 1.0, (B, F)))
    valid = jnp.ones((B, F))

    # reference: per-scenario exact greedy
    refs = [ant.select_informative(Omega[b], Deltas[b], probs[b], valid[b], kappa)
            for b in range(B)]

    mesh = make_mesh(2, 2)
    solver = sharded_select(mesh, kappa)
    sel, OmF = solver(Omega, Deltas, probs, valid)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(sel[b]),
                                      np.asarray(refs[b][0]))
        np.testing.assert_allclose(np.asarray(OmF[b]),
                                   np.asarray(refs[b][1]), rtol=1e-8)
