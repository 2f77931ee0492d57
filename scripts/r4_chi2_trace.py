"""Calibrate the slow-runaway failure statistic (VERDICT r3 item 5).

Runs the MH_04 full-length blow-up cell (grid_full.json seed 0, 7113 m with
failures=0) and healthy control cells with the tripwire disabled, dumping
per-solve traces of BOTH candidate statistics:
  - imu_chi2 (window.imu_chi2_mean): measured NOT to separate — the blow-up
    holds chi2 <= 10 because a rigid drift of the window is residual-free
    (results/r4/imu_chi2_traces_all.json, first calibration run);
  - speed = ||v[newest]||: the adopted statistic (estimator.max_speed_fail)
    -> results/r4/speed_traces_{which}.json.
"""
import json
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64()

from anticipated_vins_mono_tpu.utils import benchmark as bm


def _stats(row, name, vals):
    import numpy as np
    row[f"{name}_median"] = float(np.median(vals)) if len(vals) else None
    row[f"{name}_p90"] = (float(np.percentile(vals, 90))
                          if len(vals) else None)
    row[f"{name}_max"] = float(np.max(vals)) if len(vals) else None
    # rolling median-of-8 trace (the detector's actual statistic)
    rm = [float(np.median(vals[max(0, i - 7):i + 1]))
          for i in range(len(vals))]
    row[f"{name}_rolling_median_max"] = float(np.max(rm)) if rm else None
    row[f"{name}_trace_decimated"] = [round(v, 2) for v in rm[::5]]


def run_cell(sequence, seed, disable=True, **kw):
    import anticipated_vins_mono_tpu.models.estimator as est_mod
    traces = {}
    orig_init = est_mod.VioEstimator.__init__

    def patched(self, *a, **k):
        if disable:
            k["max_speed_fail"] = float("inf")
        orig_init(self, *a, **k)
        traces["est"] = self
    est_mod.VioEstimator.__init__ = patched
    try:
        row = bm.run_one(sequence=sequence, policy="anticipate", kappa=30,
                         max_seconds=None, track_loss_rate=0.5,
                         quality_noise_scale=1.5, slip_rate=0.2,
                         degrade_after=8.0, real_extrinsics=True,
                         seed=seed, **kw)
    finally:
        est_mod.VioEstimator.__init__ = orig_init
    est = traces["est"]
    _stats(row, "imu_chi2", est.diag.imu_chi2s)
    _stats(row, "speed", est.diag.speeds)
    return row


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = []
    cells = {
        "mh04": ("MH_04_difficult", 0),   # the 7113 m blow-up
        "mh04s1": ("MH_04_difficult", 1),  # healthy 6.47 m cell
        "mh05": ("MH_05_difficult", 0),   # healthy control
        "v201": ("V2_01_easy", 0),        # easy healthy control
    }
    for name, (seq, seed) in cells.items():
        if which not in ("all", name):
            continue
        row = run_cell(seq, seed)
        row["cell"] = name
        print(json.dumps(row), flush=True)
        out.append(row)
    with open(f"results/r4/speed_traces_{which}.json", "w") as f:
        json.dump(out, f, indent=1)
