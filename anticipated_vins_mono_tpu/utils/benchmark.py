"""EuRoC benchmark runner — the reference's headline experiment, automated.

Reproduces the experimental grid of the fork's report (results.tex:41-50):
{sequence} × {anticipate | quality | random} × feature budget κ, reporting
ATE RMSE and RTE, writing evo-compatible TUM trajectories. The reference ran
this by hand with roslaunch + rosbag + evo (SURVEY.md §4); here it is one
function over the GT-derived replay pipeline.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional

from anticipated_vins_mono_tpu.models.anticipation import SelectorConfig
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.models.feature_selector import AttentionSelector
from anticipated_vins_mono_tpu.models.pipeline import run_sequence
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.utils import euroc
from anticipated_vins_mono_tpu.utils.metrics import write_tum
from anticipated_vins_mono_tpu.utils.sequence import SequenceSimulator
from anticipated_vins_mono_tpu.utils.timing import TicToc


def run_one(sequence: str, policy: Optional[str] = "anticipate",
            kappa: int = 30, max_seconds: float = 60.0,
            detect_count: int = 150, pixel_noise: float = 0.5,
            out_dir: Optional[str] = None, seed: int = 0) -> dict:
    """One (sequence, policy, κ) cell. policy=None disables selection
    (all detected features go to the backend)."""
    traj = euroc.load_sequence(sequence, max_seconds=max_seconds)
    sim = SequenceSimulator(traj, seed=seed, pixel_noise=pixel_noise,
                            max_features=detect_count, n_landmarks=8000)
    wcfg = WindowConfig(window=10, max_feats=192, iters=8)
    sel = None
    if policy is not None:
        # init_threshold=30 matches the reference euroc config
        # (euroc_config.yaml:85): below 30 tracked features pre-init the
        # whole image passes through — starving the initializer with a 0
        # threshold destabilizes the difficult sequences
        scfg = SelectorConfig(horizon=10, max_features=kappa,
                              init_threshold=30)
        sel = AttentionSelector(scfg, max_candidates=detect_count,
                                policy=policy, seed=seed)
    est = VioEstimator(wcfg, selector=sel)
    with TicToc(f"{sequence}:{policy}") as t:
        res = run_sequence(est, sim)
    row = {
        "sequence": sequence, "policy": policy or "all", "kappa": kappa,
        "ate_rmse": res.ate,
        "rte_rmse": res.rte_stats["rmse"],
        "rte_median": res.rte_stats["median"],
        "frames": len(res.est_t),
        "failures": res.diag.failures,
        "initialized": bool(est.initialized),
        "wall_s": round(t.toc(), 1),
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_tum(os.path.join(out_dir, f"{sequence}_{policy}.tum"),
                  res.est_t, res.est_p, res.est_q)
    return row


def run_benchmark(sequences: Optional[Iterable[str]] = None,
                  policies=("anticipate", "quality", "random"),
                  kappa: int = 30, max_seconds: float = 60.0,
                  out_dir: Optional[str] = None) -> list:
    """The full grid; returns list of result rows (and prints a table)."""
    sequences = list(sequences or euroc.available_sequences())
    rows = []
    for seq in sequences:
        for pol in policies:
            row = run_one(seq, pol, kappa=kappa, max_seconds=max_seconds,
                          out_dir=out_dir)
            rows.append(row)
            print(json.dumps(row))
    return rows


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--policies", nargs="*",
                    default=["anticipate", "quality", "random"])
    ap.add_argument("--kappa", type=int, default=30)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--out", default="/tmp/avm_bench")
    args = ap.parse_args()
    run_benchmark(args.sequences, args.policies, args.kappa, args.seconds,
                  args.out)
