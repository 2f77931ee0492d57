"""Isolate the in-step write that breaks host/device DB vel parity:
compare state right after insertion (before slide) on both paths."""
import numpy as np

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64()

import jax.numpy as jnp  # noqa: E402

from anticipated_vins_mono_tpu.models import estimator_device as ed
from anticipated_vins_mono_tpu.models import estimator as est_mod
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.models.feature_db import FeatureDB
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.utils.sequence import SequenceSimulator
from anticipated_vins_mono_tpu.utils.synthetic import analytic_trajectory

CFG = WindowConfig(window=10, max_feats=64, iters=8)

traj = analytic_trajectory(8.0)
sim = SequenceSimulator(traj, seed=0, pixel_noise=0.3, max_features=40)
est = VioEstimator(CFG, init_state={
    "p": traj.p[0], "q": traj.q[0], "v": traj.v[0]})
frames = list(sim.frames())
i = 0
while not (est.initialized and est.n_frames == CFG.nf - 1):
    est.process_frame(frames[i])
    i += 1

dst = ed.vio_init_from_host(est)
fm = frames[i]

print("pre-step slot0: id", est.db.ids[0])
print("  mask", est.db.mask[0])
print("  vel_h\n", est.db.vel[0].T)
print("  vel_d\n", np.asarray(dst.vel)[0].T)
print("  id 32 in fm.feats?", 32 in fm.feats)
if 32 in fm.feats:
    print("  fm vel for 32:", fm.feats[32][1])

# host insert only
snap = {}
orig = FeatureDB.add_frame
def patched(self, frame_idx, feats, **kw):
    r = orig(self, frame_idx, feats, **kw)
    snap["vel"] = self.vel.copy()
    snap["mask"] = self.mask.copy()
    snap["ids"] = self.ids.copy()
    return r
FeatureDB.add_frame = patched
est.process_frame(fm)
FeatureDB.add_frame = orig

# device insert only (propagate doesn't touch the DB)
args = ed.pack_frame(fm, CFG.max_feats)
in_ids, in_pts, in_vel, in_prob, in_active = args[:5]
dst2, kf, tracked = ed._db_add_frame(dst, CFG.nf - 1, in_ids, in_pts,
                                     in_vel, in_prob, in_active,
                                     ed.MIN_PARALLAX)
dvel = np.abs(np.asarray(dst2.vel) - snap["vel"])
dids = (np.asarray(dst2.ids) != snap["ids"]).sum()
dmask = np.abs(np.asarray(dst2.mask) - snap["mask"]).max()
print(f"\npost-insert: vel diff {dvel.max():.3e} ids {dids} mask {dmask:.0f}")
if dvel.max() > 1e-12:
    for s in np.unique(np.nonzero(dvel.max(-1).max(-1) > 1e-12)[0])[:4]:
        print(f" slot {s} id={snap['ids'][s]}")
        print("  mask ", snap["mask"][s])
        print("  vel_h\n", snap["vel"][s].T)
        print("  vel_d\n", np.asarray(dst2.vel)[s].T)
