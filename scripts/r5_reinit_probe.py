"""Why does the host init chain fail on the rendered circuit (corruption
recovery path)? Log each gate's outcome per attempt."""
import numpy as np

from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from anticipated_vins_mono_tpu.models import tracker_device as td
from anticipated_vins_mono_tpu.models import initialization as vi_init
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.ops import cameras, lie
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.utils import render
from anticipated_vins_mono_tpu.utils.sequence import FrameMeasurement
from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory

width = height = None
w, h = 752, 480
fx = 0.6 * w
cam = cameras.PinholeCamera.create(fx, fx, w / 2.0, h / 2.0,
                                   width=w, height=h)
traj = loop_trajectory(30.0, laps=1.5, radius=3.0)
world = render.make_box_world(traj.p, margin=5.0, seed=0)
crays = render.camera_rays(cam)
R_all = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q)))
stride = 20
n_total = (len(traj.t) - 1) // stride
ks = np.arange(n_total) * stride

wcfg = WindowConfig(window=10, max_feats=128, iters=8, accum="df32")
tracker = td.DeviceFeatureTracker(cam, td.TrackerDeviceParams(
    max_features=150))
est = VioEstimator(wcfg, dtype=jnp.float32)

orig_sfm = vi_init.construct_sfm
orig_la = vi_init.linear_alignment


def sfm_logged(pts, mask, nf_, *a, **k):
    # report the pair-finding gates (the l-loop) before delegating
    newest = nf_ - 1
    import numpy as _np
    msgs = []
    for l in range(nf_ - 1):
        both = (mask[:, l] > 0) & (mask[:, newest] > 0)
        n = int(both.sum())
        if n < 20:
            msgs.append(f"l{l}:n{n}")
            continue
        par = _np.linalg.norm(pts[both, l, :2] - pts[both, newest, :2],
                              axis=1).mean()
        msgs.append(f"l{l}:n{n},p{par:.3f}")
    print("  pairs:", " ".join(msgs))
    r = orig_sfm(pts, mask, nf_, *a, **k)
    if r is None:
        print("  sfm: None")
    else:
        print(f"  sfm ok med_reproj={r['med_reproj']*460:.2f}px")
    return r


def la_logged(*a, **k):
    r = orig_la(*a, **k)
    if r is None:
        print("  linear_alignment: None")
    else:
        print(f"  align ok s={r[2]:.4f} |g|={np.linalg.norm(r[1]):.2f} "
              f"rms={r[3]:.4g}")
    return r


vi_init.construct_sfm = sfm_logged
vi_init.linear_alignment = la_logged

start = n_total // 2
for g in range(start, n_total):
    k = ks[g]
    img = render.render_frame(world, cam, crays, traj.p[k], R_all[k])
    t = traj.t[k]
    feats = tracker.process(np.asarray(img), float(t))
    s, e = ks[g - 1], k
    fm = FrameMeasurement(
        t=float(t), feats=feats,
        imu_dts=np.diff(traj.t[s:e + 1]),
        imu_acc=traj.acc_body[s + 1:e + 1],
        imu_gyr=traj.gyr_body[s + 1:e + 1],
        acc0=traj.acc_body[s], gyr0=traj.gyr_body[s])
    print(f"frame {g} n_feats={len(feats)} n_frames={est.n_frames} "
          f"init={est.initialized}")
    est.process_frame(fm)
    if est.initialized:
        print("INITIALIZED at", g, est.init_diag)
        break

# post-mortem: inspect the pair-finding gates on the final DB state
from anticipated_vins_mono_tpu.models.initialization import (
    relative_pose_ransac)
db = est.db
nf = wcfg.nf
newest = nf - 1
print("\ntrack lengths: ", np.sort(db.mask.sum(1))[-30:])
for l in range(nf - 1):
    both = (db.mask[:, l] > 0) & (db.mask[:, newest] > 0)
    n = int(both.sum())
    if n == 0:
        print(f"l={l}: overlap 0")
        continue
    par = np.linalg.norm(db.pts[both, l, :2] - db.pts[both, newest, :2],
                         axis=1)
    got = None
    if n >= 20 and par.mean() >= 30.0 / 460.0:
        got = relative_pose_ransac(db.pts[both, l, :2],
                                   db.pts[both, newest, :2], seed=0)
    print(f"l={l}: overlap {n} par {par.mean():.4f} "
          f"ransac {'ok' if got is not None else 'None/skip'}"
          + (f" inl={got[2].sum()}" if got is not None else ""))
