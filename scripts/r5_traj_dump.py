"""Dump the full estimated trajectory of an MH_04 stress cell for drift
localization (yaw/translation/scale decomposition over time)."""
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64(threads=1)

import numpy as np  # noqa: E402

from anticipated_vins_mono_tpu.utils import benchmark as bm  # noqa: E402
from anticipated_vins_mono_tpu.utils import euroc  # noqa: E402

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1

import anticipated_vins_mono_tpu.models.estimator as est_mod
traces = {}
orig_init = est_mod.VioEstimator.__init__


def patched(self, *a, **k):
    orig_init(self, *a, **k)
    traces["est"] = self


est_mod.VioEstimator.__init__ = patched
row = bm.run_one(sequence="MH_04_difficult", policy="quality", kappa=30,
                 max_seconds=None, track_loss_rate=0.5,
                 quality_noise_scale=1.5, slip_rate=0.2,
                 degrade_after=8.0, real_extrinsics=True, seed=seed)
est = traces["est"]
t_e = np.array([x[0] for x in est.trajectory])
p_e = np.stack([x[1] for x in est.trajectory])
q_e = np.stack([x[2] for x in est.trajectory])
np.savez(f"/tmp/mh04_traj_s{seed}.npz", t=t_e, p=p_e, q=q_e,
         ate=row["ate_rmse"])
print("ate", row["ate_rmse"], "frames", row["frames"])
