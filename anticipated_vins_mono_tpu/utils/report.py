"""Render the benchmark grid into RESULTS.md (the results.tex analog)."""

from __future__ import annotations

import json
from collections import defaultdict


def render_results(grid_path: str = "/root/repo/results/grid.json",
                   out_path: str = "/root/repo/RESULTS.md",
                   kappa: int = 30, seconds: float = 45.0) -> str:
    rows = json.load(open(grid_path))
    by_seq = defaultdict(dict)
    for r in rows:
        by_seq[r["sequence"]][r.get("policy") or "all"] = r

    lines = [
        "# RESULTS — EuRoC benchmark grid (GT-derived replay)",
        "",
        f"Setup: {seconds:.0f}-s sequence slices, 10 Hz frames, 150 detected "
        f"features, selection budget κ={kappa}, window=10, 8 LM iterations "
        "(matching the reference run parameters, results.tex:63-64). "
        "Measurements are synthesized from the EuRoC ground-truth state "
        "CSVs (real MAV motion + real IMU biases, simulated feature tracks "
        "with 0.5 px noise), so numbers are comparable *between policies* "
        "and indicative — not identical — to camera-replay numbers.",
        "",
        "Reference baselines for context (their report, full sequences, real "
        "images): MH_02 κ=30 ATE — anticipate 0.2021 m, quality 0.2632 m, "
        "random 0.3063 m; MH_05 κ=30 anticipate DIVERGED (10881 m), quality "
        "7.874 m (results.tex:45-50).",
        "",
        "| sequence | anticipate | quality | random | no budget (all) |",
        "|---|---|---|---|---|",
    ]
    for seq in sorted(by_seq):
        cells = []
        for pol in ("anticipate", "quality", "random", "all"):
            r = by_seq[seq].get(pol)
            if r is None:
                cells.append("—")
            elif "error" in r:
                cells.append("err")
            else:
                cells.append(f"{r['ate_rmse']:.3f} m")
        lines.append(f"| {seq} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "ATE RMSE (SE(3)-aligned), `anticipated_vins_mono_tpu.utils.benchmark`.",
        "",
        "Notes: MH_05's 7-second pre-takeoff ground stop makes the "
        "accel-bias/tilt direction unobservable and was this system's (and "
        "the reference's — 10881 m divergence, results.tex:49) failure mode "
        "at κ=30. Two mechanisms fixed it here: zero-velocity updates and "
        "(dt/dt_ref)² noise inflation for decimated merged IMU pairs — see "
        "ops/preintegration.py.",
        "TUM-format trajectories for external `evo` evaluation are written "
        "next to the grid in `results/`.",
    ]
    text = "\n".join(lines) + "\n"
    open(out_path, "w").write(text)
    return text


def aggregate_separation(paths, diverged_at: float = 1.0) -> str:
    """Aggregate κ=10 policy-separation runs (multi-seed) into a markdown
    table: median ATE over CONVERGED seeds + divergence count per
    (sequence, policy, hgen). The reference reports exactly this failure
    structure — its own κ=30 MH_05 anticipate cell is 'DIVERGED 10881 m'
    (results.tex:49) — so divergence rate is a first-class outcome, not an
    outlier to hide."""
    rows = []
    for p in paths:
        rows += json.load(open(p))
    by = defaultdict(list)
    for r in rows:
        key = (r["sequence"], r["policy"], r.get("hgen", "imu"))
        by[key].append(r)
    import numpy as np
    lines = ["| sequence | policy | hgen | median ATE (conv.) | diverged |",
             "|---|---|---|---|---|"]
    for key in sorted(by):
        rs = by[key]
        ates = np.array([r["ate_rmse"] for r in rs])
        conv = ates[ates < diverged_at]
        med = f"{np.median(conv):.3f} m" if len(conv) else "—"
        lines.append(
            f"| {key[0]} | {key[1]} | {key[2]} | {med} | "
            f"{int((ates >= diverged_at).sum())}/{len(ates)} |")
    return "\n".join(lines)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1:
        print(aggregate_separation(sys.argv[1:]))
    else:
        print(render_results())
