"""Feature-candidate sharding for the greedy logdet selection.

BASELINE.json configs 3/5: candidate features are sharded across chips; each
greedy round evaluates the LOCAL candidates' logdet gains, reduces the
winning (gain, index) pair over ICI, and psum-broadcasts the winner's Δ so
every shard applies the same Ω update — the selection result is identical to
the single-chip exact greedy, with per-round work divided by the shard
count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from anticipated_vins_mono_tpu.ops import lie


def sharded_select(mesh: Mesh, kappa: int, axis: str = "fp"):
    """Build the jitted sharded greedy selector.

    Inputs (leading scenario batch over 'dp'): Omega [B,D,D] (fp-replicated),
    Deltas [B,F,D,D] / probs [B,F] / valid [B,F] sharded over `axis` on F.
    Returns (selected mask [B,F] sharded like the inputs, Omega_final [B,D,D]).
    """
    n_sh = mesh.shape[axis]

    def one(Omega, Deltas, probs, valid):
        F_local = Deltas.shape[0]
        shard = jax.lax.axis_index(axis)
        gidx0 = shard * F_local

        def round_body(_, carry):
            Om, sel = carry
            cand = Om[None] + probs[:, None, None] * Deltas
            ld = lie.logdet_psd(cand)
            ld = jnp.where((valid > 0) & (sel < 0.5), ld, -jnp.inf)
            ld = jnp.where(jnp.isnan(ld), -jnp.inf, ld)
            lbest = jnp.max(ld)
            larg = jnp.argmax(ld)
            gbest = jax.lax.pmax(lbest, axis)
            # deterministic tie-break: smallest global index among maxima
            garg_local = jnp.where(lbest >= gbest, gidx0 + larg, jnp.iinfo(jnp.int32).max)
            garg = jax.lax.pmin(garg_local, axis)
            ok = jnp.isfinite(gbest)
            is_winner = (garg >= gidx0) & (garg < gidx0 + F_local) & ok
            lwin = jnp.clip(garg - gidx0, 0, F_local - 1)
            okf = ok.astype(Om.dtype)
            winf = is_winner.astype(Om.dtype)
            sel = sel.at[lwin].add(winf * okf)
            d_win = jax.lax.psum(
                winf * probs[lwin] * Deltas[lwin], axis)
            Om = Om + okf * d_win
            return Om, jnp.minimum(sel, 1.0)

        sel0 = jnp.zeros(F_local, Omega.dtype)
        Om, sel = jax.lax.fori_loop(0, kappa, round_body, (Omega, sel0))
        return sel, Om

    mapped = jax.shard_map(
        jax.vmap(one),
        mesh=mesh,
        in_specs=(P("dp"), P("dp", axis), P("dp", axis), P("dp", axis)),
        out_specs=(P("dp", axis), P("dp")),
        check_vma=False,
    )
    return jax.jit(mapped)
