"""Front-end tests on synthetic imagery.

Oracles: known translations for LK flow; synthetic corner grids for GFTT;
a warping texture sequence for the full tracker (persistent ids, velocity
signs, probability normalization)."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import frontend as fe
from anticipated_vins_mono_tpu.ops import cameras


def _texture(H=120, W=160, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((H // 4, W // 4))
    img = np.kron(base, np.ones((4, 4)))
    # smooth a touch so gradients are well-behaved
    x = jnp.asarray(img, jnp.float32)
    x = fe._blur3(x)
    return np.asarray(x)


def _shifted(img, dx, dy):
    """Subpixel shift via bilinear sampling."""
    H, W = img.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pts = jnp.asarray(np.stack([xx - dx, yy - dy], -1).reshape(-1, 2),
                      jnp.float32)
    return np.asarray(fe._bilinear(jnp.asarray(img, jnp.float32),
                                   pts)).reshape(H, W)


def test_gftt_finds_corners():
    img = np.zeros((100, 100), np.float32)
    img[20:50, 30:70] = 1.0  # a bright rectangle: corners at 4 points
    uv, score, valid = fe.detect_features(
        jnp.asarray(img), jnp.zeros_like(jnp.asarray(img)), 8, min_dist=9)
    uv = np.asarray(uv)[np.asarray(valid)]
    corners = np.array([[30, 20], [69, 20], [30, 49], [69, 49]])
    for c in corners:
        d = np.linalg.norm(uv - c, axis=1).min()
        assert d < 3.0, (c, uv)


def test_lk_recovers_translation():
    img = _texture()
    shift = (3.3, -2.1)
    img2 = _shifted(img, *shift)
    pyr1 = tuple(fe.build_pyramid(jnp.asarray(img), 3))
    pyr2 = tuple(fe.build_pyramid(jnp.asarray(img2), 3))
    pts = np.array([[40.0, 60.0], [80.0, 40.0], [120.0, 70.0], [60.0, 30.0]],
                   np.float32)
    new_pts, ok = fe.lk_track(pyr1, pyr2, jnp.asarray(pts),
                              jnp.ones(len(pts)))
    new_pts = np.asarray(new_pts)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(new_pts - pts,
                               np.tile(shift, (len(pts), 1)), atol=0.25)


def test_tracker_persistent_ids_and_velocity():
    cam = cameras.PinholeCamera.create(100.0, 100.0, 80.0, 60.0,
                                       width=160, height=120)
    tracker = fe.FeatureTracker(cam, fe.TrackerParams(
        max_features=40, min_dist=10, equalize=False))
    img = _texture()
    out0 = tracker.process(img, 0.0)
    assert len(out0) > 10
    dx = 2.0
    out1 = tracker.process(_shifted(img, dx, 0.0), 0.1)
    common = set(out0) & set(out1)
    assert len(common) > 5  # ids persist through tracking
    for fid in list(common)[:5]:
        pt0, _, _ = out0[fid]
        pt1, vel, prob = out1[fid]
        # normalized-plane shift = dx / fx; velocity = shift / dt
        np.testing.assert_allclose(pt1[0] - pt0[0], dx / 100.0, atol=5e-3)
        np.testing.assert_allclose(vel[0], dx / 100.0 / 0.1, atol=0.5)
        assert 0.0 <= prob <= 1.0


def test_tracker_tops_up_to_budget():
    cam = cameras.PinholeCamera.create(100.0, 100.0, 80.0, 60.0,
                                       width=160, height=120)
    tracker = fe.FeatureTracker(cam, fe.TrackerParams(
        max_features=30, min_dist=8, equalize=False))
    img = _texture(seed=3)
    out = tracker.process(img, 0.0)
    assert len(out) <= 30
    assert len(out) >= 20


def test_clahe_properties():
    """Tiled CLAHE (feature_tracker.cpp:36-40 parity): local contrast
    amplification with clip-limited redistribution."""
    import numpy as np
    import jax.numpy as jnp
    from anticipated_vins_mono_tpu.models.frontend import clahe, equalize
    rng = np.random.default_rng(0)
    # left half dim (0..0.12), right half bright (0.8..1.0)
    img = np.zeros((64, 96), np.float32)
    img[:, :48] = rng.uniform(0.0, 0.12, (64, 48))
    img[:, 48:] = rng.uniform(0.8, 1.0, (64, 48))
    out = np.asarray(clahe(jnp.asarray(img), clip_limit=4.0, tiles=4))
    assert out.shape == img.shape
    assert np.all(np.isfinite(out)) and out.min() >= 0.0 and out.max() <= 1.0001
    # each half's local dynamic range must be stretched well beyond input
    assert out[:, :40].std() > 3.0 * img[:, :40].std()
    assert out[:, 56:].std() > 3.0 * img[:, 56:].std()
    # monotone in the clip limit: lower limit → less contrast amplification
    # (the clipped mass is redistributed uniformly, flattening the mapping)
    low = np.asarray(clahe(jnp.asarray(img), clip_limit=1.0, tiles=4))
    assert low[:, :40].std() < 0.5 * out[:, :40].std()
    assert np.abs(low - img).mean() < np.abs(out - img).mean()
    # tiles=1 + huge clip limit ≈ global histogram equalization
    g1 = np.asarray(clahe(jnp.asarray(img), clip_limit=1e9, tiles=1, bins=64))
    g2 = np.asarray(equalize(jnp.asarray(img), bins=64))
    assert np.abs(g1 - g2).mean() < 0.03
