"""Mixed-precision accuracy evaluation — the round-3 TPU-chip experiment.

Runs the full estimator (MH_05 replay, anticipate policy) under explicit
(platform, dtype, accum) combinations and records ATE/failures:

- cpu/f64/f64      — the oracle (the round-2 grid regime)
- cpu/f32/df32     — f32 state + native-f32 double-float accumulation,
                     **with x64 DISABLED**: proves the df32 path needs no
                     f64 anywhere (the honest CPU control for the chip run)
- tpu/f32/df32     — the same configuration on the real TPU chip: the
                     VERDICT round-2 "make the estimator accurate ON the
                     TPU" deliverable (reference runs f64 Ceres end-to-end,
                     estimator.cpp:794-809; the TPU path replaces that with
                     ops/df32 compensated arithmetic)

Platform steering must happen before JAX touches a device, so each cell is
its own invocation:

    python -m anticipated_vins_mono_tpu.utils.precision_eval \
        --platform tpu --dtype f32 --accum df32 --seconds 45 \
        --json-out results/r3/mixed_precision_tpu.json
"""

from __future__ import annotations

import json
import os


def steer(platform: str, x64: bool):
    if platform == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if x64:
        jax.config.update("jax_enable_x64", True)
    # persistent compile cache: repeat runs of the same shapes skip the
    # (remote, minutes-long) TPU compile
    from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
    enable_compile_cache()
    assert jax.default_backend() == ("cpu" if platform == "cpu" else "tpu"), \
        jax.default_backend()
    return jax.default_backend()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="tpu")
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--accum", choices=["f32", "f64", "df32"], default="df32")
    ap.add_argument("--x64", action="store_true",
                    help="enable jax x64 (default OFF — the point of df32)")
    ap.add_argument("--sequence", default="MH_05_difficult")
    ap.add_argument("--policy", default="anticipate")
    ap.add_argument("--kappa", type=int, default=30)
    ap.add_argument("--seconds", type=float, default=45.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    backend = steer(args.platform, args.x64)
    from anticipated_vins_mono_tpu.utils.benchmark import run_one

    # accum="f32" means: take the f64-cast path with x64 off (casts are
    # identity) — the round-2 divergence control
    accum = "f64" if args.accum == "f32" else args.accum
    row = run_one(args.sequence, policy=args.policy, kappa=args.kappa,
                  max_seconds=args.seconds, seed=args.seed,
                  dtype=args.dtype, accum=accum)
    row["platform"] = backend
    row["x64"] = bool(args.x64)
    row["accum"] = args.accum
    print(json.dumps(row), flush=True)
    if args.json_out:
        rows = []
        if os.path.exists(args.json_out) and \
                os.path.getsize(args.json_out) > 0:
            with open(args.json_out) as f:
                rows = json.load(f)
        rows.append(row)
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
    return row


if __name__ == "__main__":
    main()
