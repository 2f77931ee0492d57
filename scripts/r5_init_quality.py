"""Calibrate the init alignment-quality gate (VERDICT r4 next 3).

The MH_04 'mid-scale failure' cells (1.5-10 m ATE, failures=0) are BAD
INITIALIZATIONS that slowly self-repair: the GT error trace starts at
2-11 m right after init and decays (results/r5/prior_chi2_traces_*.json)
— no runtime statistic separates them because the steady state is
self-consistent. This probe runs the first seconds of each MH_04 stress
cell and logs the accepted init's diagnostics (alignment LS residual RMS,
scale, SfM reprojection), plus the GT error right after init, so a gate
threshold can be chosen.
"""
import json
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64(threads=2)

import numpy as np  # noqa: E402

from anticipated_vins_mono_tpu.utils import benchmark as bm  # noqa: E402


def run_cell(seed, policy="quality", max_seconds=12.0):
    import anticipated_vins_mono_tpu.models.estimator as est_mod
    traces = {}
    orig_init = est_mod.VioEstimator.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        traces["est"] = self
    est_mod.VioEstimator.__init__ = patched
    try:
        row = bm.run_one(sequence="MH_04_difficult", policy=policy,
                         kappa=30, max_seconds=max_seconds,
                         track_loss_rate=0.5, quality_noise_scale=1.5,
                         slip_rate=0.2, degrade_after=8.0,
                         real_extrinsics=True, seed=seed)
    finally:
        est_mod.VioEstimator.__init__ = orig_init
    est = traces["est"]
    out = {"seed": seed, "ate_12s": row["ate_rmse"],
           "init_diag": est.init_diag}
    return out


if __name__ == "__main__":
    out = []
    for seed in [0, 1, 2, 3, 4]:
        r = run_cell(seed)
        print(json.dumps(r), flush=True)
        out.append(r)
    with open("results/r5/init_quality.json", "w") as f:
        json.dump(out, f, indent=1)
