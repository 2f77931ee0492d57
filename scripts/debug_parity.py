"""Find the first host/device divergence in the parity scenario."""
import numpy as np

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64()

from anticipated_vins_mono_tpu.models import estimator_device as ed
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
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
pr = ed.DeviceVioParams(wcfg=CFG)
print("handoff vel diff:", np.abs(np.asarray(dst.vel) - est.db.vel).max())

for n, fm in enumerate(frames[i:i + 14]):
    est.process_frame(fm)
    args = ed.pack_frame(fm, CFG.max_feats)
    dst, out = ed.vio_step(pr, dst, *args)
    dvel = np.abs(np.asarray(dst.vel) - est.db.vel)
    dpts = np.abs(np.asarray(dst.pts) - est.db.pts)
    dmask = np.abs(np.asarray(dst.mask) - est.db.mask)
    did = np.abs(np.asarray(dst.inv_depth) - est.db.inv_depth)
    dids = (np.asarray(dst.ids) != est.db.ids).sum()
    t, p_host, q_host, v_host = est.trajectory[-1]
    dp = np.abs(np.asarray(out["p"]) - p_host).max()
    dv = np.abs(np.asarray(out["v"]) - v_host).max()
    print(f"frame {n}: dp={dp:.3e} dv={dv:.3e} vel={dvel.max():.3e} "
          f"pts={dpts.max():.3e} mask={dmask.max():.0f} ids={dids} "
          f"invd={did.max():.3e} kf={bool(out['keyframe'])}")
    if max(dvel.max(), dmask.max(), dids) > 1e-9:
        for s in np.unique(np.nonzero(dvel.max(-1) > 1e-9)[0])[:3]:
            print(f"  slot {s} id_h={est.db.ids[s]} "
                  f"id_d={np.asarray(dst.ids)[s]}")
            print("   mask_h", est.db.mask[s])
            print("   mask_d", np.asarray(dst.mask)[s])
            print("   vel_h\n", est.db.vel[s].T)
            print("   vel_d\n", np.asarray(dst.vel)[s].T)
        break
    if dp > 1e-6:
        print("  state diverged without DB divergence")
        break
