"""Multi-chip sharding of the window solver — shard_map + psum over ICI.

The reference has NO distributed computation (SURVEY.md §2.6: its only
"backend" is single-host ROS pub/sub). This module introduces the TPU-native
scaling axes promised by BASELINE.json:

- **dp** (scenario parallelism): independent window problems (Monte-Carlo
  IMU-noise perturbations × sequences) sharded across chips — no collectives
  inside a scenario;
- **fp** (feature parallelism): each scenario's landmark slots are sharded
  over chips; every chip linearizes only its landmark shard, the
  Gauss-Newton normal equations are reduced with `jax.lax.psum` over ICI,
  the (small, dense) Schur-reduced pose solve is computed redundantly on
  every chip (cheaper than a broadcast), and landmark back-substitution
  stays local to the shard that owns the landmark.

Determinism: the psum reduction order is fixed by the mesh, so results are
bit-stable for a given mesh shape; across shard counts they agree to
floating-point reassociation (SURVEY.md §7 hard part 7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.window import (
    WindowConfig, WindowMeasurements, WindowState, linearize,
    build_normal_equations, retract, robust_cost)


def make_mesh(n_dp: int, n_fp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_dp * n_fp, (len(devices), n_dp, n_fp)
    import numpy as np
    dev = np.asarray(devices[: n_dp * n_fp]).reshape(n_dp, n_fp)
    return Mesh(dev, ("dp", "fp"))


def _local_cfg(cfg: WindowConfig, n_fp: int) -> WindowConfig:
    assert cfg.max_feats % n_fp == 0, "max_feats must divide fp shards"
    return cfg._replace(max_feats=cfg.max_feats // n_fp)


def sharded_lm_solve(cfg: WindowConfig, mesh: Mesh):
    """Build the jitted multi-chip LM solver.

    Input layout (leading axis = scenario batch, sharded over dp):
      state fields: replicated over fp except `inv_depth` (fp-sharded);
      meas fields: pts/vel/mask/anchor/feat_valid fp-sharded on the feature
      axis; preintegration + prior replicated over fp.
    """
    n_fp = mesh.shape["fp"]
    cfg_l = _local_cfg(cfg, n_fp)
    inv_scale = 1.0 / jnp.sqrt(float(n_fp))  # shared-factor row scaling

    def one_solve(state: WindowState, meas: WindowMeasurements):
        """Runs per (dp-shard, fp-shard); feature arrays are local shards."""
        anchor_ref = (state.p[0], state.q[0])

        def global_cost(st):
            local = robust_cost(st, meas, cfg_l, anchor_ref)
            # shared factors (IMU+prior+anchor) are computed on every fp
            # shard: count them once by subtracting the vision-only part
            vision_only = robust_cost(
                st, meas._replace(pre_valid=jnp.zeros_like(meas.pre_valid),
                                  prior=meas.prior._replace(
                                      weight=jnp.zeros_like(meas.prior.weight))),
                cfg_l._replace(anchor_weight=0.0), anchor_ref)
            shared = local - vision_only
            return jax.lax.psum(vision_only, "fp") + shared

        def body(_, carry):
            st, lam, cost = carry
            r_all, J_all, p_res, p_rows, p_rho, _p_sq = linearize(
                st, meas, cfg_l, anchor_ref)
            # scale the shared (non-projection) rows so the psum'd normal
            # equations count them exactly once
            n_proj = cfg_l.max_feats * cfg_l.nf * 2
            r_s = r_all.at[n_proj:].mul(inv_scale)
            J_s = J_all.at[n_proj:].mul(inv_scale)
            H, g, H_lp, h_ll, g_l = build_normal_equations(
                r_s, J_s, p_res, p_rows, p_rho, cfg_l)
            H = jax.lax.psum(H, "fp")
            g = jax.lax.psum(g, "fp")
            # Schur reduction of the LOCAL landmark block, then psum the
            # reduced system — algebraically identical to global Schur
            # because the landmark block is diagonal.
            h_ll_d = h_ll * (1.0 + lam) + 1e-12
            inv_h = jnp.where(h_ll > 1e-10, 1.0 / h_ll_d, 0.0)
            H_red_corr = jnp.einsum("fd,f,fe->de", H_lp, inv_h, H_lp)
            g_red_corr = H_lp.T @ (inv_h * g_l)
            H_red = H - jax.lax.psum(H_red_corr, "fp")
            g_red = g - jax.lax.psum(g_red_corr, "fp")

            diag = jnp.diagonal(H_red)
            damp = lam * jnp.maximum(diag, 1e-8) + 1e-10
            L = jnp.linalg.cholesky(H_red + jnp.diag(damp))
            dx = -jax.scipy.linalg.cho_solve((L, True), g_red)
            d_rho = -inv_h * (g_l + H_lp @ dx)

            pred_local = 0.5 * jnp.sum(d_rho * (lam * h_ll * d_rho - g_l))
            pred = 0.5 * jnp.sum(dx * (damp * dx - g_red)) + \
                jax.lax.psum(pred_local, "fp")

            cand = retract(st, dx, d_rho, cfg_l)
            new_cost = global_cost(cand)
            ok = (new_cost < cost) & (pred > 0)
            okf = ok.astype(dx.dtype)
            st_next = jax.tree_util.tree_map(
                lambda a, b: okf * b + (1.0 - okf) * a, st, cand)
            st_next = st_next._replace(q=lie.quat_normalize(st_next.q),
                                       qic=lie.quat_normalize(st_next.qic))
            lam_next = jnp.clip(
                jnp.where(ok, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up),
                1e-12, 1e8)
            return st_next, lam_next, jnp.where(ok, new_cost, cost)

        cost0 = global_cost(state)
        lam0 = jnp.asarray(cfg.lm_lambda_init, state.p.dtype)
        # align varying-manual-axes of the carry: replicated-over-fp inputs
        # become fp-varying through the loop body (branchless blends)
        state_v = state._replace(**{
            f: jax.lax.pcast(getattr(state, f), ("fp",), to="varying")
            for f in ("p", "q", "v", "ba", "bg", "tic", "qic", "td")})
        st, lam, cost = jax.lax.fori_loop(
            0, cfg.iters, body,
            (state_v, jax.lax.pcast(lam0, ("dp", "fp"), to="varying"), cost0))
        return st, {"cost0": cost0, "cost": cost}

    # ---- shard_map plumbing: batch axis over dp, feature axis over fp
    state_specs, meas_specs = solver_specs()

    mapped = jax.shard_map(
        jax.vmap(one_solve),
        mesh=mesh,
        in_specs=(state_specs, meas_specs),
        out_specs=(state_specs, {"cost0": P("dp"), "cost": P("dp")}),
        # costs are psum-replicated over fp; the static vma checker cannot
        # prove it through the branchless LM carry, so disable the check
        check_vma=False,
    )
    return jax.jit(mapped)


def solver_specs():
    """PartitionSpec pytrees for sharded_lm_solve's (state, meas) inputs —
    batch axis over dp, landmark-slot axis over fp. Exposed so multi-host
    callers can build globally-sharded arrays (make_array_from_callback)
    matching the solver's layout."""
    state_specs = WindowState(
        p=P("dp"), q=P("dp"), v=P("dp"), ba=P("dp"), bg=P("dp"),
        tic=P("dp"), qic=P("dp"), td=P("dp"), inv_depth=P("dp", "fp"))
    from anticipated_vins_mono_tpu.ops.window import PriorFactor
    prior_specs = PriorFactor(
        J0=P("dp"), r0=P("dp"),
        lin=WindowState(p=P("dp"), q=P("dp"), v=P("dp"), ba=P("dp"),
                        bg=P("dp"), tic=P("dp"), qic=P("dp"), td=P("dp"),
                        inv_depth=P("dp", "fp")),
        weight=P("dp"))
    meas_specs = WindowMeasurements(
        pre=jax.tree_util.tree_map(lambda _: P("dp"),
                                   _pre_struct()),
        pre_valid=P("dp"),
        pts=P("dp", "fp"), vel=P("dp", "fp"), mask=P("dp", "fp"),
        anchor=P("dp", "fp"), feat_valid=P("dp", "fp"),
        prior=prior_specs)
    return state_specs, meas_specs


def _pre_struct():
    """Pytree skeleton of Preintegrated for spec mapping."""
    from anticipated_vins_mono_tpu.ops.preintegration import Preintegrated
    z = 0
    return Preintegrated(dp=z, dq=z, dv=z, J=z, P=z, dt_sum=z, ba=z, bg=z, S=z)
