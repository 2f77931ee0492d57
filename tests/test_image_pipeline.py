"""Full image→tracker→estimator pipeline on a rendered scene."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import frontend as fe
from anticipated_vins_mono_tpu.models.estimator import VioEstimator
from anticipated_vins_mono_tpu.models.pipeline import run_from_images
from anticipated_vins_mono_tpu.ops import cameras
from anticipated_vins_mono_tpu.ops.factors import GRAVITY
from anticipated_vins_mono_tpu.ops.window import WindowConfig
from anticipated_vins_mono_tpu.utils.synthetic import Trajectory


def _render_plane(cam, tex, p, R, z_plane=8.0):
    """Render a textured plane at z=z_plane (world) from camera pose."""
    H, W = cam.height, cam.width
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    rays = np.asarray(cameras.lift_projective(
        cam, jnp.asarray(np.stack([xx, yy], -1).reshape(-1, 2),
                         jnp.float32)))
    d_w = rays @ R.T
    lam = (z_plane - p[2]) / np.maximum(d_w[:, 2], 1e-6)
    X = p[None] + lam[:, None] * d_w
    ui = (X[:, 0] * 12.0) % tex.shape[1]
    vi = (X[:, 1] * 12.0) % tex.shape[0]
    from anticipated_vins_mono_tpu.models.frontend import _bilinear
    vals = np.asarray(_bilinear(
        jnp.asarray(tex, jnp.float32),
        jnp.asarray(np.stack([ui, vi], -1), jnp.float32)))
    return vals.reshape(H, W)


def test_images_to_trajectory():
    rng = np.random.default_rng(0)
    cam = cameras.PinholeCamera.create(110.0, 110.0, 80.0, 60.0,
                                       width=160, height=120)
    tex = np.kron(rng.random((60, 60)), np.ones((3, 3)))

    # constant-velocity translation, level attitude (camera looks at floor
    # plane below along +z body = world +z)
    dur, hz_img, hz_imu = 2.4, 10, 200
    n_imu = int(dur * hz_imu)
    t_imu = np.arange(n_imu) / hz_imu
    v = np.array([0.4, 0.15, 0.0])
    p_traj = t_imu[:, None] * v
    q_traj = np.tile([1.0, 0, 0, 0], (n_imu, 1))
    acc = np.tile([0.0, 0.0, GRAVITY], (n_imu, 1))  # specific force (level)
    gyr = np.zeros((n_imu, 3))
    traj = Trajectory(t_imu, p_traj, q_traj, t_imu[:, None] * 0 + v,
                      acc, gyr)

    frames_t = np.arange(0, dur - 0.05, 1.0 / hz_img)
    images = [_render_plane(cam, tex, v * t, np.eye(3)) for t in frames_t]

    tracker = fe.FeatureTracker(cam, fe.TrackerParams(
        max_features=60, min_dist=10, equalize=False))
    # zupt=False: this synthetic IMU stream is exactly noise-free and the
    # motion is constant-velocity — indistinguishable from rest by an IMU
    # (a physical impossibility with real sensors, which the ZUPT detector's
    # thresholds assume)
    est = VioEstimator(WindowConfig(window=10, max_feats=96, iters=8),
                       init_state={"p": np.zeros(3),
                                   "q": np.array([1.0, 0, 0, 0]), "v": v},
                       zupt=False)
    res = run_from_images(est, tracker, images, frames_t,
                          t_imu, acc, gyr, gt=traj)
    assert res.diag.failures == 0
    assert len(res.est_t) == len(frames_t)
    assert res.ate < 0.15, res.ate
