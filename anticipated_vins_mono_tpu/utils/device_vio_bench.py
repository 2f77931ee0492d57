"""Camera-to-trajectory VIO entirely on device (the capstone bench):
`tracker_device` + `estimator_device` fused — per frame ONE device program
turns a raw 752×480 image + the IMU batch into the next trajectory pose.
Zero per-frame host round-trips under `lax.scan`.

The reference's full per-frame pipeline costs 57 ms on a desktop CPU
(tracker 18 + selector 9 + solver 30, results.tex:74-83) and its VIO is
host-orchestrated by construction (ROS nodes). This bench measures the
TPU-native composition end to end and checks ACCURACY (ATE vs GT) at the
same time, so the latency number cannot be bought with a broken estimate.

Protocol: rendered box-world circuit (as tracker_tpu_bench/loop_benchmark),
GT-derived IMU at 200 Hz; the host estimator (oracle init) consumes the
DEVICE tracker's measurements for the first ~window frames, then
`vio_init_from_host` hands the window to the device and the rest of the
sequence runs as a fused scan.

    python -m anticipated_vins_mono_tpu.utils.device_vio_bench \
        --duration 20 --out results/r4/device_vio_tpu.json
"""

from __future__ import annotations

import json
import time


def main(duration: float = 20.0, width: int = 752, height: int = 480,
         n_feats: int = 150, out: str | None = None, dtype_str: str = None,
         kappa: int = 0, accum: str = None):
    import jax
    from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from anticipated_vins_mono_tpu.models import estimator_device as ed
    from anticipated_vins_mono_tpu.models import tracker_device as td
    from anticipated_vins_mono_tpu.models.estimator import VioEstimator
    from anticipated_vins_mono_tpu.ops import cameras, lie
    from anticipated_vins_mono_tpu.ops.window import WindowConfig
    from anticipated_vins_mono_tpu.utils import render
    from anticipated_vins_mono_tpu.utils.metrics import ate_rmse
    from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory

    backend = jax.default_backend()
    dtype = jnp.float32 if dtype_str is None else getattr(jnp, dtype_str)
    fx = 0.6 * width
    cam = cameras.PinholeCamera.create(fx, fx, width / 2.0, height / 2.0,
                                       width=width, height=height)
    traj = loop_trajectory(duration, laps=duration / 10.0, radius=3.0)
    world = render.make_box_world(traj.p, margin=5.0, seed=0)
    crays = render.camera_rays(cam)
    R_all = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q)))

    stride = 20                     # 200 Hz IMU / 10 Hz frames
    n_total = (len(traj.t) - 1) // stride
    ks = np.arange(n_total) * stride
    print(f"rendering {n_total} frames...", flush=True)
    imgs = np.stack([render.render_frame(world, cam, crays,
                                         traj.p[k], R_all[k]) for k in ks])
    ts = traj.t[ks]

    S = ed.MAX_IMU_PER_PAIR
    imu_dts = np.zeros((n_total, S))
    imu_acc = np.zeros((n_total, S, 3))
    imu_gyr = np.zeros((n_total, S, 3))
    acc0 = np.zeros((n_total, 3))
    gyr0 = np.zeros((n_total, 3))
    for f in range(1, n_total):
        s, k = ks[f - 1], ks[f]
        n = k - s
        imu_dts[f, :n] = np.diff(traj.t[s:k + 1])
        imu_acc[f, :n] = traj.acc_body[s + 1:k + 1]
        imu_gyr[f, :n] = traj.gyr_body[s + 1:k + 1]
        acc0[f] = traj.acc_body[s]
        gyr0[f] = traj.gyr_body[s]

    # ---- host warm-up through the DEVICE tracker's measurements
    # accumulation precision: on TPU the accurate-and-native choice is
    # df32 (error-free-transformation double-float, RESULTS §7 — plain
    # f32 drifts; "f64" without x64 silently IS plain f32); on CPU f64.
    if accum is None:
        accum = "df32" if backend == "tpu" else "f64"
    wcfg = WindowConfig(window=10, max_feats=128, iters=8, accum=accum)
    tparams = td.TrackerDeviceParams(max_features=n_feats)
    tracker = td.DeviceFeatureTracker(cam, tparams)
    est = VioEstimator(wcfg, dtype=dtype, init_state={
        "p": traj.p[0], "q": traj.q[0], "v": traj.v[0]})
    from anticipated_vins_mono_tpu.utils.sequence import FrameMeasurement
    f = 0
    while not (est.initialized and est.n_frames == wcfg.nf - 1):
        feats = tracker.process(imgs[f], float(ts[f]))
        n = np.count_nonzero(imu_dts[f])
        est.process_frame(FrameMeasurement(
            t=float(ts[f]), feats=feats,
            imu_dts=imu_dts[f, :n], imu_acc=imu_acc[f, :n],
            imu_gyr=imu_gyr[f, :n], acc0=acc0[f], gyr0=gyr0[f]))
        f += 1
        assert f < n_total - 10, "estimator never initialized"
    vst = ed.vio_init_from_host(est)
    if kappa:
        from anticipated_vins_mono_tpu.models import anticipation as ant
        pr = ed.DeviceVioParams(
            wcfg=wcfg, sel_cfg=ant.SelectorConfig(max_features=kappa))
    else:
        pr = ed.DeviceVioParams(wcfg=wcfg)
    print(f"hand-off at frame {f}", flush=True)

    # ---- fused camera-to-trajectory step
    def full_step(carry, x):
        tst, vst_ = carry
        img, t, dts, acc, gyr, a0, g0 = x
        tst2, (ids, rays, vel, prob, active) = td.tracker_step(
            cam, tparams, tst, img, t)
        vst2, o = ed.vio_step(pr, vst_, ids, rays, vel, prob, active,
                              dts, acc, gyr, a0, g0)
        return (tst2, vst2), (o["p"], o["q"], o["cost"], o["keyframe"],
                              o["fail"])

    @jax.jit
    def run_scan(tst, vst_, xs):
        return jax.lax.scan(full_step, (tst, vst_), xs)

    j = lambda a: jnp.asarray(a, dtype)
    xs = (jnp.asarray(imgs[f:], jnp.float32), j(ts[f:]), j(imu_dts[f:]),
          j(imu_acc[f:]), j(imu_gyr[f:]), j(acc0[f:]), j(gyr0[f:]))
    n_run = n_total - f

    t0 = time.perf_counter()
    (tstN, vstN), outs = run_scan(tracker.state, vst, xs)
    jax.block_until_ready(outs)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    (tstN, vstN), outs = run_scan(tracker.state, vst, xs)
    jax.block_until_ready(outs)
    device_ms = (time.perf_counter() - t0) / n_run * 1e3

    p_est = np.asarray(outs[0])
    fails = np.asarray(outs[4])
    costs = np.asarray(outs[2])
    assert np.all(np.isfinite(p_est)), "non-finite trajectory"
    ate = ate_rmse(ts[f:], p_est, traj.t, traj.p)

    rows = {
        "backend": backend,
        "dtype": str(dtype.__name__),
        "resolution": [height, width],
        "n_frames_total": int(n_total),
        "n_frames_device": int(n_run),
        "duration_s": duration,
        "device_ms_per_frame": device_ms,
        "compile_plus_first_run_s": compile_s,
        "ate_rmse_m": float(ate),
        "fail_flags": int(fails.sum()),
        "keyframe_fraction": float(np.asarray(outs[3]).mean()),
        "cost_final_mean": float(costs.mean()),
        "kappa": kappa,
        "accum": accum,
        "reference_ms_per_frame": 57.0,
        "vs_reference": 57.0 / device_ms,
    }
    print(json.dumps(rows, indent=1))
    if out:
        with open(out, "w") as fo:
            json.dump(rows, fo, indent=1)
    return rows


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--width", type=int, default=752)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--kappa", type=int, default=0)
    ap.add_argument("--accum", default=None)
    a = ap.parse_args()
    main(a.duration, a.width, a.height, out=a.out, dtype_str=a.dtype,
         kappa=a.kappa, accum=a.accum)
