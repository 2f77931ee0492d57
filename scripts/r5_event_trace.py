"""Per-frame forensics of the MH_04 seed-1 transient (t=21-41 s, local
RMSE 5.96, segment scale 1.77): speed, solved-landmark population, bias
norms, and the window tilt statistic (angle between the window-mean
world-frame specific force and +z) — the gravity-leak mode's signature."""
import json
import sys

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64(threads=2)

import numpy as np  # noqa: E402

from anticipated_vins_mono_tpu.utils import benchmark as bm  # noqa: E402

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
max_s = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0

import anticipated_vins_mono_tpu.models.estimator as est_mod  # noqa: E402
from anticipated_vins_mono_tpu.ops import lie  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rows = []
orig = est_mod.VioEstimator.process_frame


def patched(self, fm):
    orig(self, fm)
    if not self.initialized or not self.trajectory:
        return
    db = self.db
    nf = self.cfg.nf
    # window-mean world-frame specific force vs +z
    num = np.zeros(3)
    den = 0.0
    for i, pr in enumerate(self.imu_pairs[: self.cfg.window]):
        if not len(pr["dts"]):
            continue
        w = pr["dts"].sum()
        a_mean = (pr["acc"] * pr["dts"][:, None]).sum(0) / max(w, 1e-9)
        R = np.asarray(lie.quat_to_rot(jnp.asarray(self.q[i])))
        num += R @ a_mean * w
        den += w
    tilt = float("nan")
    if den > 0:
        g_w = num / den
        g_hat = g_w / max(np.linalg.norm(g_w), 1e-9)
        tilt = float(np.degrees(np.arccos(np.clip(g_hat[2], -1, 1))))
    rows.append({
        "t": round(float(fm.t), 2),
        "speed": round(float(np.linalg.norm(self.v[nf - 2])), 3),
        "n_solved": int((db.solved > 0).sum()),
        "n_obs_new": int((db.mask[:, nf - 2] > 0).sum()),
        "ba": round(float(np.linalg.norm(self.ba[nf - 2])), 4),
        "bg": round(float(np.linalg.norm(self.bg[nf - 2])), 4),
        "tilt_deg": round(tilt, 3),
        "prior_chi2": round(self.diag.prior_chi2s[-1], 2)
        if self.diag.prior_chi2s else None,
    })


est_mod.VioEstimator.process_frame = patched
try:
    row = bm.run_one(sequence="MH_04_difficult", policy="quality", kappa=30,
                     max_seconds=max_s, track_loss_rate=0.5,
                     quality_noise_scale=1.5, slip_rate=0.2,
                     degrade_after=8.0, real_extrinsics=True, seed=seed)
finally:
    est_mod.VioEstimator.process_frame = orig
print("ate", row["ate_rmse"])
with open(f"results/r5/event_trace_s{seed}.json", "w") as f:
    json.dump({"ate": row["ate_rmse"], "rows": rows}, f)
print("rows", len(rows))
