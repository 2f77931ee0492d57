"""Calibrate the IMU-consistency failure threshold (VERDICT r3 item 5).

Runs the MH_04 full-length blow-up cell (grid_full.json seed 0, 7113 m with
failures=0) and healthy control cells with the tripwire disabled, dumping
the per-solve imu_chi2 trace → results/r4/imu_chi2_traces.json.
"""
import json
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64()

from anticipated_vins_mono_tpu.utils import benchmark as bm


def run_cell(sequence, seed, disable=True, **kw):
    import anticipated_vins_mono_tpu.models.estimator as est_mod
    import numpy as np
    traces = {}
    orig_init = est_mod.VioEstimator.__init__

    def patched(self, *a, **k):
        if disable:
            k["imu_chi2_fail"] = float("inf")
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
    chi2 = est.diag.imu_chi2s
    row["imu_chi2_median"] = float(np.median(chi2)) if chi2 else None
    row["imu_chi2_p90"] = float(np.percentile(chi2, 90)) if chi2 else None
    row["imu_chi2_max"] = float(np.max(chi2)) if chi2 else None
    # rolling median-of-8 trace (the detector's actual statistic)
    rm = [float(np.median(chi2[max(0, i - 7):i + 1]))
          for i in range(len(chi2))]
    row["rolling_median_max"] = float(np.max(rm)) if rm else None
    row["trace_decimated"] = [round(v, 1) for v in rm[::5]]
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
    with open(f"results/r4/imu_chi2_traces_{which}.json", "w") as f:
        json.dump(out, f, indent=1)
