"""Minimal repro probe for the axon-TPU x64-emulation miscompile.

Round-2 evidence (results/mixed_precision_tpu.json): the estimator with
f32 state + x64-emulated f64 accumulation never initializes on the chip
(26 reboots in 6 frames), while the identical configuration on CPU is
accurate to 1.33x of full-f64. This probe isolates the smallest operations
that differ between the chip's x64 emulation and CPU f64, so the failure is
attributable (VERDICT round 2, "What's missing" #2).

Each check computes a quantity whose f64 result is known exactly (or to
tight bounds) and prints chip vs host values. Run on the default backend:

    python -m anticipated_vins_mono_tpu.utils.x64_probe --out results/r3/x64_probe.json
"""

from __future__ import annotations

import json


def main(out: str | None = None):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    rows = []
    backend = jax.default_backend()

    def check(name, fn, oracle):
        got = np.asarray(jax.jit(fn)())
        ref = np.asarray(oracle())
        err = float(np.max(np.abs(got - ref)))
        rel = err / max(float(np.max(np.abs(ref))), 1e-300)
        rows.append({"name": name, "backend": backend, "abs_err": err,
                     "rel_err": rel, "got": float(np.ravel(got)[0]),
                     "ref": float(np.ravel(ref)[0])})
        print(json.dumps(rows[-1]), flush=True)

    # 1. f64 representation round-trip: 1 + 2^-40 must survive (f32 cannot
    #    hold it; any emulation that silently demotes flattens it to 1.0)
    tiny = 2.0 ** -40
    check("repr_1p2em40",
          lambda: jnp.asarray(1.0, jnp.float64) + jnp.asarray(tiny, jnp.float64) - 1.0,
          lambda: np.float64(tiny))

    # 2. compensated-sum stress: sum of [1e8, 1, -1e8] in f64 == 1 exactly
    def cancel():
        x = jnp.asarray([1e8, 1.0, -1e8], jnp.float64)
        return jnp.sum(x)
    check("cancel_sum", cancel, lambda: np.float64(1.0))

    # 3. f64 matmul accuracy: Hilbert-like ill-conditioned 64x64 product
    rng = np.random.default_rng(0)
    A64 = rng.standard_normal((64, 64))
    B64 = rng.standard_normal((64, 64))
    check("matmul64",
          lambda: jnp.sum(jnp.asarray(A64) @ jnp.asarray(B64)),
          lambda: np.float64(np.sum(A64 @ B64)))

    # 4. f64 cholesky solve on a mildly ill-conditioned SPD system
    M = A64 @ A64.T + 64 * np.eye(64)
    rhs = rng.standard_normal(64)

    def chol():
        L = jnp.linalg.cholesky(jnp.asarray(M))
        import jax.scipy.linalg as jsl
        return jnp.sum(jsl.cho_solve((L, True), jnp.asarray(rhs)))
    check("cholesky64", chol,
          lambda: np.float64(np.sum(np.linalg.solve(M, rhs))))

    # 5. eigh (the marginalization path) on the same SPD matrix
    def eig():
        w, _ = jnp.linalg.eigh(jnp.asarray(M))
        return jnp.sum(w)
    check("eigh64", eig, lambda: np.float64(np.sum(np.linalg.eigvalsh(M))))

    # 6. lax.fori_loop carrying an f64 scalar (the LM loop shape)
    def loop():
        def body(_, c):
            return c * 1.0000001 + 1e-12
        return jax.lax.fori_loop(0, 1000, body, jnp.asarray(1.0, jnp.float64))

    def loop_np():
        c = np.float64(1.0)
        for _ in range(1000):
            c = c * 1.0000001 + 1e-12
        return c
    check("fori_f64", loop, loop_np)

    result = {"backend": backend, "rows": rows,
              "max_rel_err": max(r["rel_err"] for r in rows)}
    print(json.dumps(result))
    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.parse_args()
    main(ap.parse_args().out)
