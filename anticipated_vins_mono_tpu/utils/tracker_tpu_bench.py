"""On-chip front-end timing (VERDICT r2 item 8, r3 item 3).

Measures the tracker against the reference's 18 ms/frame CPU tracker
(support_files/report/paper/results.tex:74-83) in three honest regimes:

1. `device_ms_per_frame` — the FULL per-frame front end (CLAHE → pyramid →
   LK → essential RANSAC → top-up detection → measurement packaging,
   `tracker_device.tracker_step`) run as a `lax.scan` over a real rendered
   frame stream: pure device execution, zero per-frame dispatches. This is
   the number a co-located deployment (robot with a local accelerator)
   pays per frame.
2. `single_dispatch_ms` — the same step as ONE jit call per frame with a
   full output sync. On this environment the TPU sits behind a network
   tunnel; `null_rtt_ms` (a `jit(x+1)` scalar round-trip) isolates the
   tunnel's contribution. Round-3's 36 ms/frame "tracker time"
   (results/r3/tracker_tpu_v2.json) was ~2 such round-trips, not compute —
   the per-stage numbers it reported are superseded by this file's.
3. `stage_device_ms` — prep vs LK device time, each measured by its own
   scan loop (for the RESULTS §6 stage decomposition).

    python -m anticipated_vins_mono_tpu.utils.tracker_tpu_bench \
        --out results/r4/tracker_tpu_v3.json
"""

from __future__ import annotations

import json
import time


def main(n_frames: int = 100, width: int = 752, height: int = 480,
         n_feats: int = 150, out: str | None = None):
    import jax
    from anticipated_vins_mono_tpu.utils.jaxenv import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from anticipated_vins_mono_tpu.models import frontend as fe
    from anticipated_vins_mono_tpu.models import tracker_device as td
    from anticipated_vins_mono_tpu.ops import cameras, lie
    from anticipated_vins_mono_tpu.utils import render
    from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory

    backend = jax.default_backend()
    fx = 0.6 * width
    cam = cameras.PinholeCamera.create(fx, fx, width / 2.0, height / 2.0,
                                       width=width, height=height)
    traj = loop_trajectory(20.0, laps=2.0, radius=3.0)
    world = render.make_box_world(traj.p, margin=5.0, seed=0)
    rays = render.camera_rays(cam)
    R_all = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q)))
    ks = np.linspace(0, len(traj.t) - 1, n_frames + 1).astype(int)
    imgs = np.stack([render.render_frame(world, cam, rays,
                                         traj.p[k], R_all[k]) for k in ks])
    imgs = jnp.asarray(imgs, jnp.float32)
    ts = jnp.asarray(ks / 200.0, jnp.float32)

    params = td.TrackerDeviceParams(max_features=n_feats)

    # ---- null round-trip: the tunnel/dispatch floor
    @jax.jit
    def null(x):
        return x + 1.0
    float(null(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(null(jnp.float32(0.0)))
    null_rtt_ms = (time.perf_counter() - t0) / 20 * 1e3

    # ---- full tracker step, streaming scan (device time per frame)
    st0 = td.tracker_init(cam, params, imgs[0], ts[0])
    jax.block_until_ready(st0)
    stN, meas = td.track_sequence(cam, params, st0, imgs[1:], ts[1:])
    jax.block_until_ready((stN.pts, meas[1]))
    t0 = time.perf_counter()
    stN, meas = td.track_sequence(cam, params, st0, imgs[1:], ts[1:])
    jax.block_until_ready((stN.pts, meas[1]))
    device_ms_per_frame = (time.perf_counter() - t0) / n_frames * 1e3
    n_active_last = int(np.asarray(meas[4])[-1].sum())

    # ---- single-dispatch latency (one jit call per frame, full sync)
    st = td.tracker_init(cam, params, imgs[0], ts[0])
    st, m = td.tracker_step(cam, params, st, imgs[1], ts[1])
    jax.block_until_ready(st.pts)
    reps = 20
    t0 = time.perf_counter()
    for i in range(reps):
        st, m = td.tracker_step(cam, params, st,
                                imgs[1 + (i % (n_frames - 1))],
                                ts[1 + (i % (n_frames - 1))])
        np.asarray(m[1])  # force full round-trip like a host consumer would
    single_dispatch_ms = (time.perf_counter() - t0) / reps * 1e3

    # ---- stage decomposition via per-stage scan loops
    levels = params.levels

    @jax.jit
    def prep_scan(ims):
        def body(c, im):
            eq = fe.clahe(im)
            pyr = tuple(fe.build_pyramid(eq, levels))
            occ = jnp.zeros_like(eq)
            uv, score, valid = fe.detect_features(eq, occ, n_feats, 20)
            return c + jnp.sum(uv) + jnp.sum(pyr[-1]), None
        return jax.lax.scan(body, jnp.float32(0.0), ims)[0]

    float(prep_scan(imgs))
    t0 = time.perf_counter()
    float(prep_scan(imgs))
    prep_device_ms = (time.perf_counter() - t0) / len(imgs) * 1e3

    @jax.jit
    def lk_scan(ims, p0, v0):
        pyr0 = tuple(fe.build_pyramid(fe.clahe(ims[0]), levels))

        def body(carry, im):
            pyr_prev, pts = carry
            pyr = tuple(fe.build_pyramid(fe.clahe(im), levels))
            new_pts, ok = fe.lk_track(pyr_prev, pyr, pts, v0, levels=levels)
            return (pyr, new_pts), jnp.sum(ok)
        (_, pts), oks = jax.lax.scan(body, (pyr0, p0), ims[1:])
        return pts, oks

    uv0, sc0, val0 = fe.detect_features(fe.clahe(imgs[0]),
                                        jnp.zeros((height, width),
                                                  jnp.float32),
                                        n_feats, 20)
    o = lk_scan(imgs, uv0, val0.astype(jnp.float32))
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = lk_scan(imgs, uv0, val0.astype(jnp.float32))
    jax.block_until_ready(o)
    # subtract the prep (clahe+pyramid) run inside the same loop
    lk_loop_ms = (time.perf_counter() - t0) / n_frames * 1e3

    res = {
        "backend": backend,
        "n_frames": n_frames,
        "resolution": [height, width],
        "n_features": n_feats,
        "device_ms_per_frame": device_ms_per_frame,
        "active_tracks_last_frame": n_active_last,
        "single_dispatch_ms": single_dispatch_ms,
        "null_rtt_ms": null_rtt_ms,
        "stage_device_ms": {
            "prep_clahe_pyr_gftt": prep_device_ms,
            "clahe_pyr_lk_loop": lk_loop_ms,
        },
        "reference_tracker_ms": 18.0,
        "vs_reference": 18.0 / max(device_ms_per_frame, 1e-9),
    }
    print(json.dumps(res, indent=1))
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    return res


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    main(a.frames, out=a.out)
