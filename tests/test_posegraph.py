"""Pose-graph tests: BRIEF/Hamming kernels + 4-DoF PGO drift correction.

Oracle: a drifting loop trajectory whose loop-closure edge carries the true
relative pose — optimization must pull the endpoint back (optimize4DoF
semantics, pose_graph.cpp:403-560)."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import posegraph as pg
from anticipated_vins_mono_tpu.models.frontend import _blur3
from anticipated_vins_mono_tpu.ops import lie


def test_brief_hamming():
    rng = np.random.default_rng(0)
    img = jnp.asarray(np.kron(rng.random((30, 40)), np.ones((4, 4))),
                      jnp.float32)
    pts = jnp.asarray([[40.0, 40.0], [80.0, 60.0], [100.0, 30.0]])
    d1 = pg.brief_descriptors(img, pts)
    d2 = pg.brief_descriptors(img, pts)
    ham = np.asarray(pg.hamming_match(d1, d2))
    assert np.all(np.diag(ham) == 0)            # identical patches
    assert ham[0, 1] > 40                        # different patches differ
    # descriptor survives small illumination change (monotone)
    d3 = pg.brief_descriptors(img * 0.5 + 0.1, pts)
    assert np.all(np.diag(np.asarray(pg.hamming_match(d1, d3))) == 0)


def test_global_descriptor_similarity():
    rng = np.random.default_rng(1)
    d_a = jnp.asarray(rng.random((50, pg.BRIEF_BITS)) > 0.5)
    valid = jnp.ones(50)
    g1 = pg.global_descriptor(d_a, valid)
    g2 = pg.global_descriptor(d_a, valid)
    d_b = jnp.asarray(rng.random((50, pg.BRIEF_BITS)) > 0.5)
    g3 = pg.global_descriptor(d_b, valid)
    assert float(jnp.dot(g1, g2)) > 0.999
    assert float(jnp.dot(g1, g3)) < 0.995


def _circle_with_drift(n=40, drift=0.002):
    """Keyframes around a circle; odometry accumulates position drift."""
    true_p, true_yaw = [], []
    for k in range(n):
        th = 2 * np.pi * k / (n - 1)
        true_p.append([np.cos(th), np.sin(th), 0.0])
        true_yaw.append(np.degrees(th))
    true_p = np.asarray(true_p)
    drift_p = true_p + np.arange(n)[:, None] * [drift, drift * 0.5, drift * 0.2]
    return true_p, np.asarray(true_yaw), drift_p


def test_pgo_corrects_loop_drift():
    cfg = pg.PGOConfig(max_kf=64, max_loops=8, iters=30)
    graph = pg.PoseGraph(cfg)
    true_p, true_yaw, drift_p = _circle_with_drift()
    n = len(true_p)
    wrap = lambda y: (y + 180.0) % 360.0 - 180.0
    for k in range(n):
        q = lie.rot_to_quat(lie.ypr_to_rot(
            jnp.asarray([wrap(true_yaw[k]), 0.0, 0.0])))
        hint = None
        if k == n - 1:
            # verified loop to keyframe 0: true relative pose (identical spot)
            R0 = np.asarray(lie.ypr_to_rot(
                jnp.asarray([wrap(true_yaw[0]), 0.0, 0.0])))
            rel_t = R0.T @ (true_p[k] - true_p[0])
            rel_yaw = wrap(true_yaw[k] - true_yaw[0])
            hint = (0, rel_t, rel_yaw)
        graph.add_keyframe(drift_p[k], np.asarray(q), loop_hint=hint)
    end_err_before = np.linalg.norm(graph.pos[n - 1] - true_p[n - 1])
    graph.optimize()
    end_err_after = np.linalg.norm(graph.pos[n - 1] - true_p[n - 1])
    # sub-Huber drift (quadratic regime): the loop edge must absorb most of
    # it; larger drifts saturate at the Huber pull exactly as the reference's
    # HuberLoss(0.1) does (pose_graph.cpp:441)
    assert end_err_after < 0.6 * end_err_before, (end_err_before, end_err_after)
    # drift output moves subsequent VIO poses consistently
    p_corr, yaw_corr = graph.correct(drift_p[n - 1], true_yaw[n - 1])
    assert np.linalg.norm(p_corr - true_p[n - 1]) <= end_err_after + 1e-6


def test_similarity_loop_detection():
    cfg = pg.PGOConfig(max_kf=128, max_loops=8)
    graph = pg.PoseGraph(cfg, sim_thresh=0.95, exclude_recent=10)
    rng = np.random.default_rng(2)
    descs = [rng.random(pg.BRIEF_BITS) for _ in range(15)]
    descs = [d / np.linalg.norm(d) for d in descs]
    q = np.array([1.0, 0, 0, 0])
    for k in range(15):
        graph.add_keyframe(np.array([k, 0, 0.0]), q, gdesc=descs[k])
    # revisit place 2 → loop should fire
    loop = graph.add_keyframe(np.array([2.1, 0, 0.0]), q, gdesc=descs[2])
    assert loop == 2
