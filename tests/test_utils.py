"""Config / timing / checkpoint subsystem tests."""

import os

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.utils import checkpoint, config, timing


def test_config_defaults_bridge():
    cfg = config.VinsConfig()
    w = cfg.window_config()
    assert w.window == 10 and w.iters == 8
    n = cfg.imu_noise()
    assert n.acc_n == 0.08
    cam = cfg.camera_model()
    assert cam.width == 752


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("""
%YAML:1.0
estimator:
  acc_n: 0.2
  max_solver_iterations: 4
selector:
  use_feature_selector: 1
  max_features: 55
output_path: /tmp/out.csv
""")
    cfg = config.load_config(str(p))
    assert cfg.estimator.acc_n == 0.2
    assert cfg.estimator.max_solver_iterations == 4
    assert cfg.selector.use_feature_selector is True
    assert cfg.selector.max_features == 55
    assert cfg.output_path == "/tmp/out.csv"
    assert cfg.window_config().iters == 4


def test_tictoc_binary_log(tmp_path):
    timing.reset_stats()
    for _ in range(3):
        with timing.TicToc("unit_cost", log_dir=str(tmp_path)):
            pass
    s = timing.stats()["unit_cost"]
    assert s["count"] == 3
    samples = timing.read_bin_log(str(tmp_path / "unit_cost.bin"))
    assert len(samples) == 3
    assert np.all(samples >= 0)


def test_estimator_checkpoint_roundtrip(tmp_path):
    from anticipated_vins_mono_tpu.models.estimator import VioEstimator
    from anticipated_vins_mono_tpu.models.pipeline import run_sequence
    from anticipated_vins_mono_tpu.ops.window import WindowConfig
    from anticipated_vins_mono_tpu.utils.sequence import SequenceSimulator
    from anticipated_vins_mono_tpu.utils.synthetic import analytic_trajectory

    cfg = WindowConfig(window=5, max_feats=48, iters=6)
    traj = analytic_trajectory(3.0)
    sim = SequenceSimulator(traj, seed=0, pixel_noise=0.5, max_features=40)
    est = VioEstimator(cfg, init_state={"p": traj.p[0], "q": traj.q[0],
                                        "v": traj.v[0]})
    frames = list(sim.frames(20))
    for fm in frames[:14]:
        est.process_frame(fm)

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_estimator(path, est)

    est2 = VioEstimator(cfg, init_state={"p": traj.p[0], "q": traj.q[0],
                                         "v": traj.v[0]})
    checkpoint.load_estimator(path, est2)
    np.testing.assert_allclose(est2.p, est.p)
    np.testing.assert_allclose(np.asarray(est2.prior.J0),
                               np.asarray(est.prior.J0))

    # resumed estimator continues identically to the uninterrupted one
    for fm in frames[14:]:
        est.process_frame(fm)
        est2.process_frame(fm)
    np.testing.assert_allclose(est2.p, est.p, atol=1e-9)
    np.testing.assert_allclose(est2.db.inv_depth, est.db.inv_depth, atol=1e-9)


def test_posegraph_checkpoint_roundtrip(tmp_path):
    from anticipated_vins_mono_tpu.models.posegraph import PGOConfig, PoseGraph
    g = PoseGraph(PGOConfig(max_kf=32, max_loops=4))
    q = np.array([1.0, 0, 0, 0])
    for k in range(6):
        g.add_keyframe(np.array([k, 0.0, 0.0]), q)
    path = str(tmp_path / "pg.npz")
    checkpoint.save_posegraph(path, g)
    g2 = PoseGraph(PGOConfig(max_kf=32, max_loops=4))
    checkpoint.load_posegraph(path, g2)
    assert g2.n == 6
    np.testing.assert_allclose(g2.pos, g.pos)
    np.testing.assert_allclose(g2.seq_t, g.seq_t)
