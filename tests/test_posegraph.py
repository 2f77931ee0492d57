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


def test_find_connection_on_rendered_revisit():
    """Full loop verification chain on imagery: BRIEF at corners of a
    rendered scene, Hamming matching against a revisit view, PnP recovery of
    the revisit camera pose (findConnection parity, keyframe.cpp:259-430)."""
    import jax.numpy as jnp2
    from anticipated_vins_mono_tpu.models import frontend as fe
    from anticipated_vins_mono_tpu.ops import cameras

    rng = np.random.default_rng(0)
    cam = cameras.PinholeCamera.create(120.0, 120.0, 80.0, 60.0,
                                       width=160, height=120)
    tex = np.kron(rng.random((80, 80)), np.ones((3, 3)))
    z_plane = 6.0

    def render(p_cam, R_cw):
        H, W = 120, 160
        yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        rays = np.asarray(cameras.lift_projective(
            cam, jnp2.asarray(np.stack([xx, yy], -1).reshape(-1, 2),
                              jnp2.float32)))
        d_w = rays @ R_cw   # R_cw: world->cam; rays cam->world via R^T
        lam = (z_plane - p_cam[2]) / np.maximum(d_w[:, 2], 1e-6)
        X = p_cam[None] + lam[:, None] * d_w
        ui = (X[:, 0] * 14.0) % tex.shape[1]
        vi = (X[:, 1] * 14.0) % tex.shape[0]
        vals = np.asarray(fe._bilinear(
            jnp2.asarray(tex, jnp2.float32),
            jnp2.asarray(np.stack([ui, vi], -1), jnp2.float32)))
        return vals.reshape(H, W)

    # old keyframe at origin, revisit slightly displaced + yawed
    p_old = np.zeros(3)
    R_old = np.eye(3)
    img_old = render(p_old, R_old)
    uv_o, score, valid = fe.detect_features(
        jnp2.asarray(img_old, jnp2.float32),
        jnp2.zeros((120, 160), jnp2.float32), 60, min_dist=8)
    uv_o = np.asarray(uv_o)[np.asarray(valid)]
    d_old = pg.brief_descriptors(jnp2.asarray(img_old, jnp2.float32),
                                 jnp2.asarray(uv_o, jnp2.float32))
    # 3-D of old keypoints from the known plane geometry
    rays_o = np.asarray(cameras.lift_projective(cam, jnp2.asarray(uv_o)))
    lam = z_plane / rays_o[:, 2]
    X_old = p_old + rays_o * lam[:, None]

    dyaw = np.radians(6.0)
    Rz = np.array([[np.cos(dyaw), -np.sin(dyaw), 0],
                   [np.sin(dyaw), np.cos(dyaw), 0], [0, 0, 1.0]])
    p_new = np.array([0.25, -0.1, 0.0])
    R_new = Rz  # world->cam
    img_new = render(p_new, R_new)
    uv_n, score_n, valid_n = fe.detect_features(
        jnp2.asarray(img_new, jnp2.float32),
        jnp2.zeros((120, 160), jnp2.float32), 60, min_dist=8)
    uv_n = np.asarray(uv_n)[np.asarray(valid_n)]
    d_new = pg.brief_descriptors(jnp2.asarray(img_new, jnp2.float32),
                                 jnp2.asarray(uv_n, jnp2.float32))
    kps_new = np.asarray(cameras.lift_projective(cam, jnp2.asarray(uv_n)))[:, :2]

    got = pg.find_connection(d_old, X_old, d_new, kps_new,
                             min_inliers=15, reproj_thresh=4.0 / 120.0)
    assert got is not None
    R_est, p_est, n_inl, pairs, rms = got
    assert n_inl >= 15
    assert len(pairs) == n_inl
    assert 0.0 <= rms < 4.0 / 120.0
    np.testing.assert_allclose(p_est, p_new, atol=0.15)
    ang = np.degrees(np.arccos(np.clip((np.trace(R_est @ R_new.T) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang


def test_find_connection_rejects_unrelated():
    import jax.numpy as jnp2
    rng = np.random.default_rng(5)
    d1 = jnp2.asarray(rng.random((40, pg.BRIEF_BITS)) > 0.5)
    d2 = jnp2.asarray(rng.random((40, pg.BRIEF_BITS)) > 0.5)
    X = rng.normal(size=(40, 3)) + [0, 0, 6]
    uv = rng.normal(size=(40, 2)) * 0.2
    assert pg.find_connection(d1, X, d2, uv) is None


def test_capacity_growth_past_static_cap():
    """Keyframe storage must grow (reference keeps an unbounded list)."""
    cfg = pg.PGOConfig(max_kf=8, max_loops=2, iters=10)
    graph = pg.PoseGraph(cfg)
    q = np.array([1.0, 0, 0, 0])
    for k in range(25):
        graph.add_keyframe(np.array([k * 0.1, 0, 0.0]), q, t=float(k))
    assert graph.n == 25
    assert graph.cfg.max_kf >= 25
    # loop-edge capacity also grows
    for k in range(5):
        graph.add_keyframe(np.array([0.1, 0, 0.0]), q,
                           loop_hint=(1, np.zeros(3), 0.0), t=25.0 + k)
    assert graph.n_loops == 5
    graph.optimize()   # solver runs at the grown capacity
    assert np.all(np.isfinite(graph.pos[:graph.n]))


def test_sequence_discontinuity_and_alignment():
    """>1 s stream gap opens a new sequence (pose_graph_node.cpp:93-113);
    a loop edge across sequences rigidly re-aligns the newer sequence
    (w_r_vio/w_t_vio, pose_graph.cpp:46-57)."""
    cfg = pg.PGOConfig(max_kf=64, max_loops=8, iters=15)
    graph = pg.PoseGraph(cfg)
    q = np.array([1.0, 0, 0, 0])
    # sequence 0: walk along +x
    for k in range(10):
        graph.add_keyframe(np.array([k * 1.0, 0, 0.0]), q, t=0.1 * k)
    # discontinuity: 5 s gap → new VIO session restarts near the origin
    # (its local frame), but physically the robot is back at x=3
    for k in range(5):
        graph.add_keyframe(np.array([k * 1.0, 0, 0.0]), q, t=6.0 + 0.1 * k)
    assert graph.cur_sequence == 1
    assert graph.seq_id[9] == 0 and graph.seq_id[10] == 1
    # no sequential edge across the boundary
    spans = [(graph.seq_i[e], graph.seq_j[e])
             for e in range(graph.n_seq) if graph.seq_valid[e] > 0]
    assert all(graph.seq_id[i] == graph.seq_id[j] for i, j in spans)
    # loop: keyframe 12 (x=2 in seq-1 local frame) is physically at x=5 ==
    # keyframe 5 of sequence 0 → alignment should shift sequence 1 by +3
    loop = graph.add_keyframe(np.array([5.0 - 3.0, 0, 0.0]), q,
                              loop_hint=(5, np.zeros(3), 0.0), t=6.6)
    assert loop == 5
    np.testing.assert_allclose(graph.pos[graph.n - 1], [5.0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(graph.pos[10], [3.0, 0, 0], atol=1e-9)
    graph.optimize()
    assert np.all(np.isfinite(graph.pos[:graph.n]))
    np.testing.assert_allclose(graph.pos[graph.n - 1], [5.0, 0, 0], atol=0.2)


def test_alignment_persists_for_later_keyframes():
    """After a cross-sequence loop aligns sequence 1, keyframes added to
    that sequence LATER must be re-expressed through the same w_r_vio/
    w_t_vio transform (pose_graph.cpp:60-62) — otherwise vio-based
    sequential edges mix aligned and raw endpoints."""
    cfg = pg.PGOConfig(max_kf=64, max_loops=8, iters=15)
    graph = pg.PoseGraph(cfg)
    q = np.array([1.0, 0, 0, 0])
    for k in range(10):
        graph.add_keyframe(np.array([k * 1.0, 0, 0.0]), q, t=0.1 * k)
    # new session restarts its local frame at origin; physically at x=3
    for k in range(3):
        graph.add_keyframe(np.array([k * 1.0, 0, 0.0]), q, t=6.0 + 0.1 * k)
    graph.add_keyframe(np.array([2.0, 0, 0.0]), q,
                       loop_hint=(5, np.zeros(3), 0.0), t=6.3)
    # post-loop keyframes arrive in the session's RAW local frame
    k_post = graph.add_keyframe(np.array([3.0, 0, 0.0]), q, t=6.4)
    assert k_post is None
    np.testing.assert_allclose(graph.vio_pos[graph.n - 1], [6.0, 0, 0],
                               atol=1e-9)
    # the vio-based sequential edge spanning the alignment moment must
    # encode the true 1 m step, not the 3 m alignment jump
    hits = [e for e in range(graph.n_seq)
            if graph.seq_j[e] == graph.n - 1
            and graph.seq_i[e] == graph.n - 2]
    assert hits
    np.testing.assert_allclose(graph.seq_t[hits[0]], [1.0, 0, 0], atol=1e-9)
    # a second cross-sequence loop must NOT re-align (sequence_loop gate)
    pos_before = graph.pos[:graph.n].copy()
    graph.add_keyframe(np.array([4.0, 0, 0.0]), q,
                       loop_hint=(7, np.zeros(3), 0.0), t=6.5)
    np.testing.assert_allclose(graph.pos[:len(pos_before) - 0][:graph.n - 1],
                               pos_before, atol=1e-9)


def test_new_sequence_resets_drift():
    """new_sequence() zeroes yaw/t drift (pose_graph.cpp:47-56): an
    unrelated stream must not inherit the previous sequence's correction."""
    graph = pg.PoseGraph(pg.PGOConfig(max_kf=32, max_loops=4, iters=10))
    graph.yaw_drift = 12.0
    graph.t_drift = np.array([1.0, 2.0, 3.0])
    graph.new_sequence()
    assert graph.yaw_drift == 0.0
    np.testing.assert_allclose(graph.t_drift, 0.0)
