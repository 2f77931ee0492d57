"""Intrinsic calibration tooling tests (VERDICT item 9).

Parity target: /root/reference/camera_model/src/intrinsic_calib.cc —
chessboard detection + intrinsic estimation must recover synthetic
fx/fy/cx/cy/k1/k2 to <0.5%.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from anticipated_vins_mono_tpu.ops import cameras, lie
from anticipated_vins_mono_tpu.utils import calibration as cal

NX, NY, SQ = 8, 6, 0.06
CENTER = np.array([-(NX - 1) * SQ / 2, -(NY - 1) * SQ / 2, 0.0])


def _view(cam, ypr_deg, tc, ss=3):
    R = np.asarray(lie.ypr_to_rot(jnp.asarray(ypr_deg, jnp.float64)))
    t = np.asarray(tc) + R @ CENTER
    img = cal.render_chessboard(cam, jnp.asarray(R), jnp.asarray(t),
                                NX, NY, SQ, ss=ss)
    return np.asarray(img), R, t


def test_detect_chessboard_subpixel():
    """Saddle-point detector finds all inner corners to <0.5 px."""
    cam = cameras.euroc_camera(dtype=jnp.float64)
    img, R, t = _view(cam, [15.0, -10.0, 8.0], [0.03, -0.02, 0.6], ss=3)
    det = cal.detect_chessboard(img, NX, NY)
    assert det is not None and det.shape == (NX * NY, 2)
    board = cal.board_points(NX, NY, SQ)
    uv_gt = np.asarray(cameras.space_to_plane(
        cam, jnp.asarray(board @ R.T + t)))
    # ordering maps the lattice up to the board's 180° symmetry; compare as
    # point sets
    err = np.sqrt(((det[:, None] - uv_gt[None]) ** 2).sum(-1)).min(1)
    assert err.max() < 0.5, err.max()
    # and the ordering is a bijection onto the true corners
    nearest = np.sqrt(((det[:, None] - uv_gt[None]) ** 2).sum(-1)).argmin(1)
    assert len(set(nearest.tolist())) == NX * NY


def test_calibrate_pinhole_from_images():
    """Image-in calibration recovers EuRoC intrinsics to <0.5% (the VERDICT
    bar for intrinsic_calib.cc parity)."""
    gt = cameras.euroc_camera(dtype=jnp.float64)
    rng = np.random.default_rng(1)
    imgs = []
    # corner-coverage views (radial distortion is observable at high image
    # radius), two close frontals, then random tilts
    for sx, sy in [(-1, -1), (1, -1), (-1, 1), (1, 1)]:
        imgs.append(_view(gt, [10.0 * sx, 10.0 * sy, 0.0],
                          [0.13 * sx, 0.08 * sy, 0.45])[0])
    for z in (0.38, 0.45):
        imgs.append(_view(gt, [0.0, 0.0, 0.0], [0.0, 0.0, z])[0])
    for _ in range(10):
        ypr = rng.uniform([-30, -30, -25], [30, 30, 25])
        tc = [rng.uniform(-0.12, 0.12), rng.uniform(-0.08, 0.08),
              rng.uniform(0.45, 0.9)]
        imgs.append(_view(gt, ypr, tc)[0])

    tmpl = cameras.PinholeCamera.create(400., 400., 376., 240.,
                                        width=752, height=480,
                                        dtype=jnp.float64)
    res = cal.calibrate_from_images(imgs, NX, NY, SQ, tmpl, iters=60)
    assert res is not None and res.n_views >= 6
    assert res.rms_px < 0.3, res.rms_px
    c = res.camera
    for f in ("fx", "fy", "cx", "cy", "k1", "k2"):
        est, true = float(getattr(c, f)), float(getattr(gt, f))
        rel = abs(est - true) / abs(true)
        assert rel < 0.005, (f, est, true, rel)


def test_calibrate_equidistant_model():
    """Model polymorphism: the SAME LM program calibrates a Kannala-Brandt
    fisheye from corner correspondences (the reference needs a separate
    Ceres functor per model)."""
    gt = cameras.EquidistantCamera.create(
        mu=380.0, mv=379.0, u0=370.0, v0=242.0,
        k2=0.02, k3=-0.005, k4=0.001, k5=0.0,
        width=752, height=480, dtype=jnp.float64)
    board = cal.board_points(NX, NY, SQ)
    rng = np.random.default_rng(0)
    dets = []
    for v in range(10):
        ypr = rng.uniform([-25, -25, -20], [25, 25, 20])
        R = np.asarray(lie.ypr_to_rot(jnp.asarray(ypr, jnp.float64)))
        t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.07, 0.07),
                      rng.uniform(0.5, 0.9)]) + R @ CENTER
        uv = np.asarray(cameras.space_to_plane(
            gt, jnp.asarray(board @ R.T + t)))
        uv = uv + rng.normal(0, 0.05, uv.shape)       # 0.05 px corner noise
        dets.append(uv)
    tmpl = cameras.EquidistantCamera.create(
        300., 300., 376., 240., width=752, height=480, dtype=jnp.float64)
    res = cal.calibrate_camera(dets, board, tmpl, iters=60)
    assert res.rms_px < 0.2
    for f in ("mu", "mv", "u0", "v0"):
        est, true = float(getattr(res.camera, f)), float(getattr(gt, f))
        assert abs(est - true) / abs(true) < 0.005, (f, est, true)
    # the θ³..θ⁹ terms are near-collinear over the observed θ range, so
    # individual coefficients are not identifiable — the distortion CURVE
    # r(θ) is what the model uses; require it to match to <0.3 px
    theta = jnp.linspace(0.0, 0.5, 64)
    r_est = np.asarray(cal.cameras._kb_r(res.camera, theta))
    r_gt = np.asarray(cal.cameras._kb_r(gt, theta))
    assert float(np.abs(r_est - r_gt).max()) * float(gt.mu) < 0.3


def test_order_grid_rotations():
    """Lattice ordering survives in-plane rotation (incl. the 45°-adjacent
    angles where naive doubled-angle direction estimates cancel)."""
    board = cal.board_points(NX, NY, 20.0)[:, :2] + 100.0
    for deg in (0, 30, 44, 60, 90):
        th = np.radians(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        uv = board @ R.T
        rng = np.random.default_rng(deg)
        got = cal._order_grid(uv + rng.normal(0, 0.1, uv.shape), NX, NY)
        assert got is not None, deg
        # rows must be lattice-consistent: consecutive in-row spacing ≈ 20
        rows = got.reshape(NY, NX, 2)
        d = np.linalg.norm(np.diff(rows, axis=1), axis=-1)
        assert np.allclose(d, 20.0, atol=1.0)
