"""Scaramuzza camera + visualization + GT-horizon selector tests."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import cameras
from anticipated_vins_mono_tpu.utils import viz


def _scaramuzza_fixture():
    # forward polynomial of a typical catadioptric rig: z(ρ) = a0 + a2 ρ²
    poly = np.array([-200.0, 0.0, 2.0e-3])
    # fit the inverse polynomial ρ(θ) from the forward model
    rho = np.linspace(1.0, 320.0, 400)
    theta = np.arctan2(np.polyval(poly[::-1], rho), rho)
    coeff = np.polyfit(theta, rho, 9)[::-1]
    return cameras.ScaramuzzaCamera.create(
        poly, coeff, c=1.0, d=0.0, e=0.0, cx=376.0, cy=240.0,
        dtype=jnp.float64)


def test_scaramuzza_roundtrip():
    cam = _scaramuzza_fixture()
    uv = jnp.asarray([[300.0, 200.0], [420.0, 280.0], [376.0, 100.0]])
    ray = cameras.lift_projective(cam, uv)
    np.testing.assert_allclose(np.asarray(ray)[:, 2], 1.0)
    uv2 = cameras.space_to_plane(cam, ray * 2.0)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=0.2)


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((40, 60))
    path = str(tmp_path / "x.ppm")
    viz.write_ppm(path, img)
    raw = open(path, "rb").read()
    assert raw.startswith(b"P6\n60 40\n255\n")
    assert len(raw) == len(b"P6\n60 40\n255\n") + 40 * 60 * 3


def test_attention_overlay_and_ar(tmp_path):
    cam = cameras.PinholeCamera.create(100.0, 100.0, 80.0, 60.0,
                                       width=160, height=120,
                                       dtype=jnp.float64)
    img = np.random.default_rng(1).random((120, 160)) * 0.5
    tracked = {1: np.array([0.1, 0.0, 1.0])}
    selected = {2: np.array([-0.2, 0.1, 1.0])}
    rejected = {3: np.array([0.0, -0.2, 1.0])}
    rgb = viz.attention_overlay(img, cam, tracked, selected, rejected)
    # markers actually drawn in their colors
    assert (rgb == viz.COLORS["tracked"]).all(-1).any()
    assert (rgb == viz.COLORS["selected"]).all(-1).any()
    assert (rgb == viz.COLORS["rejected"]).all(-1).any()

    rgb2 = viz.ar_boxes(img, cam, np.zeros(3), np.array([1.0, 0, 0, 0]),
                        [[0.0, 0.0, 3.0]])
    assert (rgb2 == viz.COLORS["box"]).all(-1).any()
    viz.write_ppm(str(tmp_path / "o.ppm"), rgb2)


def test_trajectory_topdown():
    t = np.linspace(0, 2 * np.pi, 100)
    gt = np.stack([np.cos(t), np.sin(t), 0 * t], -1)
    est = gt + 0.03
    rgb = viz.trajectory_topdown(est, gt)
    assert (rgb == viz.COLORS["est"]).all(-1).any()
    assert (rgb == viz.COLORS["gt"]).all(-1).any()


def test_gt_horizon_selector_mode():
    """Selector consumes a GT provider and still returns a valid subset."""
    from anticipated_vins_mono_tpu.models import anticipation as ant
    from anticipated_vins_mono_tpu.models.feature_selector import (
        AttentionSelector)

    H = 8
    cfg = ant.SelectorConfig(horizon=H, max_features=4)

    def gt_provider(t):
        ps = np.stack([[t + 0.1 * h, 0.0, 0.0] for h in range(H + 1)])
        qs = np.tile([1.0, 0, 0, 0], (H + 1, 1))
        return ps, qs

    sel = AttentionSelector(cfg, max_candidates=16, gt_provider=gt_provider)
    st = {"p": np.zeros(3), "q": np.array([1.0, 0, 0, 0]),
          "v": np.zeros(3), "ba": np.zeros(3), "bg": np.zeros(3),
          "acc": np.array([0.0, 0, 9.81]), "gyr": np.zeros(3), "t": 0.0}
    first = {0: (np.array([0.0, 0.0, 1.0]), np.zeros(2), 1.0)}
    sel.select(first, st)
    feats = dict(first)
    for i in range(1, 8):
        feats[i] = (np.array([0.05 * i - 0.2, 0.02, 1.0]), np.zeros(2), 1.0)
    out = sel.select(feats, st)
    assert 0 in out
    assert len(out) <= cfg.max_features
    assert len(out) > 1  # selection actually happened via the GT horizon
