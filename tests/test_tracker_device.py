"""Device-native tracker (models.tracker_device): the single-dispatch
front end must reproduce the host-orchestrated tracker and its own scan
form, and the batched RANSAC must reject planted outliers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anticipated_vins_mono_tpu.models import frontend as fe
from anticipated_vins_mono_tpu.models import tracker_device as td
from anticipated_vins_mono_tpu.ops import cameras, lie


@pytest.fixture(scope="module")
def rendered_frames():
    from anticipated_vins_mono_tpu.utils import render
    from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory
    W, H = 752, 480    # full res: the min-dist/top-up geometry of the
    fx = 0.6 * W       # real pipeline (half-res crowds the detector and
    cam = cameras.PinholeCamera.create(fx, fx, W / 2, H / 2,  # the two
                                       width=W, height=H)     # trackers'
    # RANSAC draws diverge through different re-detections)
    traj = loop_trajectory(20.0, laps=2.0, radius=3.0)
    world = render.make_box_world(traj.p, margin=5.0, seed=0)
    rays = render.camera_rays(cam)
    R_all = np.asarray(lie.quat_to_rot(jnp.asarray(traj.q)))
    ks = np.linspace(0, 300, 4).astype(int)
    imgs = [render.render_frame(world, cam, rays, traj.p[k], R_all[k])
            for k in ks]
    return cam, imgs, [k / 200.0 for k in ks]


def test_device_tracker_matches_host(rendered_frames):
    cam, imgs, ts = rendered_frames
    params = td.TrackerDeviceParams(max_features=60)
    host = fe.FeatureTracker(cam, fe.TrackerParams(max_features=60))
    dev = td.DeviceFeatureTracker(cam, params)
    for im, t in zip(imgs, ts):
        h = host.process(im, t)
        d = dev.process(im, t)
    assert len(d) >= 50
    # same physical corners tracked: nearest-neighbour distance between the
    # two measurement sets is ~0 for the shared majority
    hp = np.stack([v[0][:2] for v in h.values()])
    dp = np.stack([v[0][:2] for v in d.values()])
    dmat = np.linalg.norm(hp[None] - dp[:, None], axis=-1)
    near = dmat.min(axis=1)
    fx = float(cam.fx)
    assert np.median(near) < 0.5 / fx
    assert (near < 2.0 / fx).mean() > 0.8


def test_scan_matches_stepwise(rendered_frames):
    cam, imgs, ts = rendered_frames
    params = td.TrackerDeviceParams(max_features=60)
    st = td.tracker_init(cam, params, jnp.asarray(imgs[0], jnp.float32),
                         ts[0])
    st_step = st
    for im, t in zip(imgs[1:], ts[1:]):
        st_step, _ = td.tracker_step(cam, params, st_step,
                                     jnp.asarray(im, jnp.float32), t)
    imgs_j = jnp.asarray(np.stack(imgs[1:]), jnp.float32)
    st_scan, meas = td.track_sequence(cam, params, st,
                                      imgs_j, jnp.asarray(ts[1:]))
    assert np.allclose(np.asarray(st_scan.pts), np.asarray(st_step.pts),
                       atol=1e-3)
    assert np.array_equal(np.asarray(st_scan.ids), np.asarray(st_step.ids))
    # stacked measurements cover every frame
    assert meas[1].shape == (len(imgs) - 1, 60, 3)


def test_ransac_rejects_planted_outliers():
    rng = np.random.default_rng(3)
    N = 100
    # inliers: pure rotation-free epipolar geometry (random E from R, t)
    t = np.array([0.3, -0.1, 0.05])
    ang = 0.1 * rng.normal(size=3)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(
        np.concatenate([[np.cos(np.linalg.norm(ang) / 2)],
                        ang / max(np.linalg.norm(ang), 1e-9)
                        * np.sin(np.linalg.norm(ang) / 2)]))))
    X = np.concatenate([rng.uniform(-1, 1, (N, 2)),
                        rng.uniform(2, 6, (N, 1))], 1)
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = (X - t) @ R
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    out_idx = rng.choice(N, 20, replace=False)
    x2_bad = x2.copy()
    x2_bad[out_idx] += rng.uniform(0.05, 0.2, (20, 2)) * rng.choice(
        [-1, 1], (20, 2))
    ok = jnp.ones(N, bool)
    mask = np.asarray(td.ransac_essential_mask(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2_bad, jnp.float32),
        ok, jax.random.PRNGKey(0), iters=128, thresh=2e-3))
    assert mask[out_idx].sum() <= 2          # outliers rejected
    inl = np.setdiff1d(np.arange(N), out_idx)
    assert mask[inl].mean() > 0.9            # inliers kept


def test_ransac_degenerate_passes_through():
    # too few correspondences → input mask returned unchanged
    N = 30
    x = jnp.zeros((N, 2), jnp.float32)
    ok = jnp.zeros(N, bool).at[:5].set(True)
    mask = td.ransac_essential_mask(x, x, ok, jax.random.PRNGKey(0))
    assert np.array_equal(np.asarray(mask), np.asarray(ok))


def test_clahe_impl_parity():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(480, 752)),
                      jnp.float32)
    a = np.asarray(fe.clahe(img, impl="gather"))
    b = np.asarray(fe.clahe(img, impl="onehot"))
    assert np.abs(a - b).max() < 1e-5
    # odd (non-tile-multiple) sizes
    a2 = np.asarray(fe.clahe(img[:233, :369], impl="gather"))
    b2 = np.asarray(fe.clahe(img[:233, :369], impl="onehot"))
    assert np.abs(a2 - b2).max() < 1e-5


def test_lk_impl_parity():
    rng = np.random.default_rng(0)
    H, W, N = 480, 752, 60
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.uniform(size=(H + 8, W + 8)), 2.0)
    img1 = jnp.asarray(base[4:4 + H, 4:4 + W], jnp.float32)
    img2 = jnp.asarray(base[1:1 + H, 6:6 + W], jnp.float32)
    p1 = tuple(fe.build_pyramid(img1, 3))
    p2 = tuple(fe.build_pyramid(img2, 3))
    pts = jnp.asarray(rng.uniform(size=(N, 2)) * [W - 60, H - 60] + 30,
                      jnp.float32)
    val = jnp.ones(N, jnp.float32)
    g_pts, g_ok = fe.lk_track(p1, p2, pts, val, impl="gather")
    m_pts, m_ok = fe.lk_track(p1, p2, pts, val, impl="matmul")
    both = np.asarray(g_ok) & np.asarray(m_ok)
    assert both.sum() >= 0.9 * N
    assert np.abs(np.asarray(g_pts)[both]
                  - np.asarray(m_pts)[both]).max() < 1e-2
    # and it actually tracked the planted (dx=+3, dy=-2)... (content shift)
    flow = np.asarray(m_pts)[both] - np.asarray(pts)[both]
    med = np.median(flow, axis=0)
    assert np.allclose(med, [-2.0, 3.0], atol=0.2)
