"""Replicate vio_step stage-by-stage to find where slot-0 vel loses a col."""
import numpy as np

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64
force_cpu_f64()

import jax
import jax.numpy as jnp  # noqa: E402

from anticipated_vins_mono_tpu.models import estimator_device as ed
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.ops.triangulation import triangulate
from anticipated_vins_mono_tpu.ops.window import lm_solve
from anticipated_vins_mono_tpu.ops import marginalization as mg
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
fm = frames[i]
pre_vel0 = np.asarray(dst.vel)[0].copy()
print("pre vel0 x:", pre_vel0[:, 0][:7])

args = ed.pack_frame(fm, CFG.max_feats)
in_ids, in_pts, in_vel, in_prob, in_active, imu_dts, imu_acc, imu_gyr, \
    acc0, gyr0 = args

cfg = pr.wcfg
nf = cfg.nf
W = cfg.window
k = nf - 1
st = dst

p_k, q_k, v_k = ed._propagate(
    st.p[k - 1], st.q[k - 1], st.v[k - 1], st.ba[k - 1], st.bg[k - 1],
    imu_dts, imu_acc, imu_gyr, acc0, gyr0)
st = st._replace(
    p=st.p.at[k].set(p_k), q=st.q.at[k].set(q_k), v=st.v.at[k].set(v_k),
    ba=st.ba.at[k].set(st.ba[k - 1]), bg=st.bg.at[k].set(st.bg[k - 1]),
    imu_dts=st.imu_dts.at[W - 1].set(imu_dts),
    imu_acc=st.imu_acc.at[W - 1].set(imu_acc),
    imu_gyr=st.imu_gyr.at[W - 1].set(imu_gyr),
    imu_a0=st.imu_a0.at[W - 1].set(acc0),
    imu_g0=st.imu_g0.at[W - 1].set(gyr0),
    stationary=st.stationary.at[k].set(
        ed._zupt_flag(pr, imu_dts, imu_acc, imu_gyr, st.bg[k - 1])),
    td_at_frame=st.td_at_frame.at[k].set(0.0))

st, keyframe, tracked = ed._db_add_frame(
    st, k, in_ids, in_pts, in_vel, in_prob, in_active, pr.min_parallax)
print("after insert vel0 x:", np.asarray(st.vel)[0][:, 0][:7],
      "kf:", bool(keyframe))

fv = ed._feat_valid(st)
wstate = ed._window_state(st, cfg)
inv_d, good = triangulate(wstate, st.pts, st.mask, ed._anchor(st), cfg)
fresh = (st.solved < 0.5) & (fv > 0)
st = st._replace(inv_depth=jnp.where(fresh, inv_d, st.inv_depth),
                 solved=jnp.where(fresh, good, st.solved))
wstate = ed._window_state(st, cfg)
meas = ed._measurements(st, pr, fv * st.solved)
new_state, sdiag = lm_solve(wstate, meas, cfg)
st = st._replace(p=new_state.p, q=new_state.q, v=new_state.v,
                 ba=new_state.ba, bg=new_state.bg, td=new_state.td,
                 tic=new_state.tic, qic=new_state.qic,
                 inv_depth=new_state.inv_depth)
st = ed._demote_outliers(st, pr)
print("after solve/demote vel0 x:", np.asarray(st.vel)[0][:, 0][:7])

st2 = ed._slide_oldest_db(st, cfg)
print("after _slide_oldest_db vel0 x:", np.asarray(st2.vel)[0][:, 0][:7])
print("after _slide_oldest_db mask0:", np.asarray(st2.mask)[0])

# compare with full vio_step
dst2, out = ed.vio_step(pr, dst, *args)
print("full vio_step vel0 x:", np.asarray(dst2.vel)[0][:, 0][:7],
      "kf:", bool(out["keyframe"]))
print("full vio_step mask0:", np.asarray(dst2.mask)[0])
