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
         kappa: int = 0, accum: str = None, host_control: bool = False,
         corrupt_at: float = 0.0, laps: float = None,
         corrupt_debug: bool = False):
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
    # default 1 lap / 10 s; the corruption-recovery protocol uses slower
    # laps (--laps) because the REAL SfM init chain needs frame pairs that
    # share ≥20 tracks — at 36°/s yaw a feature crosses the FOV in ~1.2 s
    # and no 11-frame window pair overlaps (the reference's GlobalSFM has
    # the same structural requirement, initial_sfm.cpp:117-244)
    traj = loop_trajectory(duration,
                           laps=duration / 10.0 if laps is None else laps,
                           radius=3.0)
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
    if host_control:
        # CONTROL (VERDICT r4 next 5): the HOST-path selector + estimator on
        # the same circuit and the same device-tracker measurements —
        # isolates the on-device gate (_select_stage) from the budget
        # itself. Selector wiring matches benchmark.run_one.
        from anticipated_vins_mono_tpu.models.feature_selector import (
            AttentionSelector)
        from anticipated_vins_mono_tpu.models.anticipation import (
            SelectorConfig)
        sel = None
        if kappa:
            sel = AttentionSelector(SelectorConfig(max_features=kappa),
                                    max_candidates=n_feats,
                                    policy="anticipate", seed=0)
        est_c = VioEstimator(wcfg, dtype=dtype, selector=sel, init_state={
            "p": traj.p[0], "q": traj.q[0], "v": traj.v[0]})
        t0 = time.perf_counter()
        for g in range(n_total):
            feats = tracker.process(imgs[g], float(ts[g]))
            n = np.count_nonzero(imu_dts[g])
            est_c.process_frame(FrameMeasurement(
                t=float(ts[g]), feats=feats,
                imu_dts=imu_dts[g, :n], imu_acc=imu_acc[g, :n],
                imu_gyr=imu_gyr[g, :n], acc0=acc0[g], gyr0=gyr0[g]))
        wall = time.perf_counter() - t0
        t_e = np.array([x[0] for x in est_c.trajectory])
        p_e = np.stack([x[1] for x in est_c.trajectory])
        rows = {
            "backend": backend, "mode": "host_control",
            "duration_s": duration, "kappa": kappa,
            "ate_rmse_m": float(ate_rmse(t_e, p_e, traj.t, traj.p)),
            "failures": est_c.diag.failures,
            "keyframe_fraction": (est_c.diag.keyframes
                                  / max(est_c.diag.solves, 1)),
            "host_ms_per_frame": wall / n_total * 1e3,
        }
        print(json.dumps(rows, indent=1))
        if out:
            with open(out, "w") as fo:
                json.dump(rows, fo, indent=1)
        return rows

    vst = ed.vio_init_from_host(est)
    import os
    evict = os.environ.get("ANT_SLOT_EVICT", "1") != "0"
    if kappa:
        from anticipated_vins_mono_tpu.models import anticipation as ant
        pr = ed.DeviceVioParams(
            wcfg=wcfg, sel_cfg=ant.SelectorConfig(max_features=kappa),
            slot_evict=evict)
    else:
        pr = ed.DeviceVioParams(wcfg=wcfg, slot_evict=evict)
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

    def make_xs(lo, hi):
        return (jnp.asarray(imgs[lo:hi], jnp.float32), j(ts[lo:hi]),
                j(imu_dts[lo:hi]), j(imu_acc[lo:hi]), j(imu_gyr[lo:hi]),
                j(acc0[lo:hi]), j(gyr0[lo:hi]))

    if corrupt_at:
        # ---- failure-injection protocol (VERDICT r4 next 6): run the
        # fused scan, CORRUPT the device carry mid-run (+30 m/s velocity,
        # +50 m position — the reference's failureDetection regime), and
        # let the two-tier recovery work: (1) the DEVICE clearState reboot
        # fires in-scan and keeps the loop finite; (2) the supervisor sees
        # the fail flag in the scan outputs and re-runs the REAL host
        # initialization chain (SfM + gyro-bias LS + linear alignment —
        # estimator.cpp:186-194 re-running initialStructure), then hands
        # back to the device. Recovery metric: ATE of the post-reinit
        # segment, aligned on its own (the reboot legitimately restarts
        # the output frame, exactly like the reference).
        kc = max(f + 1, int(n_total * corrupt_at))
        (tst1, vst1), outs1 = run_scan(tracker.state, vst, make_xs(f, kc))
        vst_bad = vst1._replace(v=vst1.v + 30.0, p=vst1.p + 50.0)
        if corrupt_debug:
            # step-by-step forensics of the device recovery (no scan)
            tst_d, vst_d = tst1, vst_bad
            for gdbg in range(kc, min(kc + 40, n_total)):
                tst_d, (ids_, rays_, vel_, prob_, act_) = td.tracker_step(
                    cam, tparams, tst_d, jnp.asarray(imgs[gdbg], jnp.float32),
                    float(ts[gdbg]))
                vst_d, o = ed.vio_step(
                    pr, vst_d, ids_, rays_, vel_, prob_, act_,
                    j(imu_dts[gdbg]), j(imu_acc[gdbg]), j(imu_gyr[gdbg]),
                    j(acc0[gdbg]), j(gyr0[gdbg]))
                print(f"dbg g={gdbg} fail={int(bool(o['fail']))} "
                      f"speed={float(o['speed']):.2f} "
                      f"cost={float(o['cost']):.3g} "
                      f"tracked={float(o['tracked']):.0f} "
                      f"n_solved={int(o['n_solved'])} "
                      f"sf={int(np.asarray(vst_d.since_fail))}", flush=True)
            return {}
        (tst2, vst2), outs2 = run_scan(tst1, vst_bad,
                                       make_xs(kc, n_total))
        fails = np.asarray(outs2[4])
        assert fails.any(), "corruption never tripped the device detector"
        k_fail = kc + int(np.argmax(fails))
        # supervisor: full host re-initialization from the failure point
        # (REAL chain — no oracle hint). The tracker restarts fresh, like
        # the reference's restart flush (estimator_node.cpp:184-203).
        est_r = VioEstimator(wcfg, dtype=dtype)
        g = k_fail
        tracker.state = None
        while not (est_r.initialized and est_r.n_frames == wcfg.nf - 1):
            feats = tracker.process(imgs[g], float(ts[g]))
            n = np.count_nonzero(imu_dts[g])
            est_r.process_frame(FrameMeasurement(
                t=float(ts[g]), feats=feats,
                imu_dts=imu_dts[g, :n], imu_acc=imu_acc[g, :n],
                imu_gyr=imu_gyr[g, :n], acc0=acc0[g], gyr0=gyr0[g]))
            g += 1
            assert g < n_total - 5, "re-initialization never converged"
        vst_r = ed.vio_init_from_host(est_r)
        (tstN, vstN), outs3 = run_scan(tracker.state, vst_r,
                                       make_xs(g, n_total))
        p3 = np.asarray(outs3[0])
        t3 = ts[g:]
        assert np.all(np.isfinite(p3))
        ate_rec = ate_rmse(t3, p3, traj.t, traj.p)
        # healthy-baseline segment ATE over the same tail for comparison
        rows = {
            "backend": backend, "mode": "corruption_recovery",
            "duration_s": duration, "kappa": kappa,
            "corrupt_frame": int(kc), "fail_frame": int(k_fail),
            "frames_to_detect": int(k_fail - kc),
            "reinit_frames": int(g - k_fail),
            "recovered_frames": int(n_total - g),
            "ate_recovered_m": float(ate_rec),
            "device_fail_flags": int(fails.sum()),
            "post_corruption_finite": bool(
                np.all(np.isfinite(np.asarray(outs2[0])))),
        }
        print(json.dumps(rows, indent=1))
        if out:
            with open(out, "w") as fo:
                json.dump(rows, fo, indent=1)
        return rows

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
    ap.add_argument("--host-control", action="store_true")
    ap.add_argument("--corrupt-at", type=float, default=0.0,
                    help="fraction of the run at which to corrupt the "
                         "device state (failure-injection protocol)")
    ap.add_argument("--laps", type=float, default=None)
    ap.add_argument("--corrupt-debug", action="store_true")
    a = ap.parse_args()
    main(a.duration, a.width, a.height, out=a.out, dtype_str=a.dtype,
         kappa=a.kappa, accum=a.accum, host_control=a.host_control,
         corrupt_at=a.corrupt_at, laps=a.laps,
         corrupt_debug=a.corrupt_debug)
