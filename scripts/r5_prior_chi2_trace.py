"""Calibrate a detector for the MH_04 mid-scale (1.5-10 m) drift mode
(VERDICT r4 next 3): record per-solve prior_chi2 (window.prior_chi2,
the statistic that CAN see a rigid window drift), speed, imu_chi2, and
the GT position error trace, on failing cells (seeds 0-2 blow to
1.5-10 m with the tripwire mute) vs healthy cells (seeds 3-4 hold
0.19-0.24 m) — results/r4/mh04_tripwire.json is the map.

Usage: python scripts/r5_prior_chi2_trace.py <cellname|all>
"""
import json
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64, pin_to_cpu
force_cpu_f64(threads=1)

import numpy as np  # noqa: E402

from anticipated_vins_mono_tpu.utils import benchmark as bm  # noqa: E402
from anticipated_vins_mono_tpu.utils import euroc  # noqa: E402


def _stats(row, name, vals):
    vals = [v for v in vals if np.isfinite(v)]
    row[f"{name}_median"] = float(np.median(vals)) if len(vals) else None
    row[f"{name}_p90"] = (float(np.percentile(vals, 90))
                          if len(vals) else None)
    row[f"{name}_max"] = float(np.max(vals)) if len(vals) else None
    rm = [float(np.median(vals[max(0, i - 7):i + 1]))
          for i in range(len(vals))]
    row[f"{name}_rolling_median_max"] = float(np.max(rm)) if rm else None
    row[f"{name}_trace_decimated"] = [round(v, 3) for v in rm[::5]]


def run_cell(sequence, seed, policy="quality", **kw):
    import anticipated_vins_mono_tpu.models.estimator as est_mod
    traces = {}
    orig_init = est_mod.VioEstimator.__init__

    def patched(self, *a, **k):
        k["max_speed_fail"] = float("inf")   # mute the tripwire: observe
        orig_init(self, *a, **k)
        traces["est"] = self
    est_mod.VioEstimator.__init__ = patched
    try:
        row = bm.run_one(sequence=sequence, policy=policy, kappa=30,
                         max_seconds=None, track_loss_rate=0.5,
                         quality_noise_scale=1.5, slip_rate=0.2,
                         degrade_after=8.0, real_extrinsics=True,
                         seed=seed, **kw)
    finally:
        est_mod.VioEstimator.__init__ = orig_init
    est = traces["est"]
    _stats(row, "prior_chi2", est.diag.prior_chi2s)
    _stats(row, "speed", est.diag.speeds)
    _stats(row, "imu_chi2", est.diag.imu_chi2s)
    # GT error trace (calibration reference only — the detector must not
    # use it): per-output-frame position error after SE3 alignment
    traj = euroc.load_sequence(sequence, max_seconds=None)
    t_e = np.array([x[0] for x in est.trajectory])
    p_e = np.stack([x[1] for x in est.trajectory])
    from anticipated_vins_mono_tpu.utils.metrics import align_umeyama
    idx = np.clip(np.searchsorted(traj.t, t_e), 0, len(traj.t) - 1)
    gt = traj.p[idx]
    if len(p_e) > 10:
        s, R, tr = align_umeyama(p_e, gt, False)
        err = np.linalg.norm((R @ p_e.T).T + tr - gt, axis=1)
        row["gt_err_trace_decimated"] = [round(float(e), 3)
                                         for e in err[::10]]
    return row


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    try:
        pin_to_cpu({"f0": 0, "f1": 1, "h3": 2, "h4": 3}.get(which, 0))
    except Exception:
        pass
    out = []
    cells = {
        "f0": ("MH_04_difficult", 0),   # 7113m fast blow-up (r4)
        "f1": ("MH_04_difficult", 1),   # 6.3 m slow cell
        "f2": ("MH_04_difficult", 2),   # 1.5 m cell
        "h3": ("MH_04_difficult", 3),   # healthy 0.20 m
        "h4": ("MH_04_difficult", 4),   # healthy 0.24 m
    }
    for name, (seq, seed) in cells.items():
        if which not in ("all", name):
            continue
        row = run_cell(seq, seed)
        row["cell"] = name
        print(json.dumps({k: row[k] for k in row
                          if not k.endswith("decimated")}), flush=True)
        out.append(row)
    with open(f"results/r5/prior_chi2_traces_{which}.json", "w") as f:
        json.dump(out, f, indent=1)
