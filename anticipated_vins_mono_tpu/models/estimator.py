"""Sliding-window VIO estimator — host orchestration over jitted device steps.

Capability parity with the reference Estimator + estimator_node
(/root/reference/vins_estimator/src/estimator.cpp, estimator_node.cpp):

- measurement alignment & IMU-rate propagation   (estimator_node.cpp:44-141)
- keyframe decision → marginalization flag       (estimator.cpp:117-120)
- triangulation of new landmarks                 (estimator.cpp:471)
- windowed optimization (one jitted LM solve)    (estimator.cpp:661-994)
- yaw-gauge re-anchoring after each solve        (double2vector, :521-568)
- marginalization + window slide                 (:817-990, 996-1081)
- failure detection + reboot                     (:612-658, 186-194)
- outlier rejection                              (f_manager.removeOutlier)

TPU-first split: ALL numerics (preintegration, LM solve, marginalization,
triangulation) are jitted device functions with static shapes; the host only
mutates the padded feature DB, shuffles window slots, and decides branches —
the roles the reference spreads across threads + mutexes collapse into a
single-threaded feed of pure device steps (SURVEY.md §2.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.ops.preintegration import ImuNoise, preintegrate
from anticipated_vins_mono_tpu.ops.factors import GRAVITY
from anticipated_vins_mono_tpu.ops.triangulation import triangulate
from anticipated_vins_mono_tpu.ops.window import (
    PriorFactor, WindowConfig, WindowMeasurements, WindowState, lm_solve)
from anticipated_vins_mono_tpu.ops import marginalization as mg
from anticipated_vins_mono_tpu.models.feature_db import FeatureDB
from anticipated_vins_mono_tpu.utils.jaxenv import on_host
from anticipated_vins_mono_tpu.utils.sequence import FrameMeasurement

MAX_IMU_PER_PAIR = 64  # static pad for per-pair raw IMU buffers

def _host_op(fn, *args):
    """Run a tiny pure-jnp op on the host CPU backend and return numpy.

    The estimator's per-frame bookkeeping (quaternion conversions, gravity
    alignment, ypr gauge math) is scalar-sized; on an accelerator backend —
    worse, the REMOTE axon TPU tunnel — every eager dispatch is a network
    round-trip. Inputs must be fresh numpy (uncommitted) so
    jax.default_device can steer the chain to the CPU (see
    utils/jaxenv.on_host)."""
    with on_host():
        return np.asarray(fn(*[jnp.asarray(np.asarray(a)) for a in args]))



def _np_quat_mul(q, p):
    qw, qx, qy, qz = q
    pw, px, py, pz = p
    return np.array([
        qw * pw - qx * px - qy * py - qz * pz,
        qw * px + qx * pw + qy * pz - qz * py,
        qw * py - qx * pz + qy * pw + qz * px,
        qw * pz + qx * py - qy * px + qz * pw])


def _np_exp_quat(theta):
    angle = np.linalg.norm(theta)
    half = 0.5 * angle
    if angle < 1e-9:
        return np.array([1.0, *(0.5 * theta)])
    k = np.sin(half) / angle
    return np.array([np.cos(half), *(k * theta)])


def _np_quat_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _fuse_to_cap(dts, acc, gyr, cap: int = MAX_IMU_PER_PAIR):
    """Fuse adjacent IMU samples (dt-summed, dt-weighted averaged) until the
    buffer fits the static pad. Only long stationary/non-keyframe streaks or
    IMU-rate spikes ever hit this, where the coarser quadrature is harmless
    (noise is inflated by (dt/dt_ref)^2 at preintegration time)."""
    while len(dts) > cap:
        n = len(dts) // 2 * 2
        d2 = dts[:n].reshape(-1, 2)
        w = d2 / np.maximum(d2.sum(1, keepdims=True), 1e-12)
        acc2 = (acc[:n].reshape(-1, 2, 3) * w[..., None]).sum(1)
        gyr2 = (gyr[:n].reshape(-1, 2, 3) * w[..., None]).sum(1)
        dts = np.concatenate([d2.sum(1), dts[n:]])
        acc = np.concatenate([acc2, acc[n:]])
        gyr = np.concatenate([gyr2, gyr[n:]])
    return dts, acc, gyr


def _merge_imu_pairs(a: dict, b: dict) -> dict:
    """Concatenate two raw-IMU pair buffers (non-keyframe slide merges the
    dropped interval into its successor, reference slideWindowNew +
    IntegrationBase::push_back), fusing down to the static pad on overflow."""
    dts, acc, gyr = _fuse_to_cap(
        np.concatenate([a["dts"], b["dts"]]),
        np.concatenate([a["acc"], b["acc"]]),
        np.concatenate([a["gyr"], b["gyr"]]))
    return {"dts": dts, "acc": acc, "gyr": gyr,
            "acc0": a["acc0"], "gyr0": a["gyr0"]}


@dataclass
class EstimatorDiagnostics:
    solves: int = 0
    failures: int = 0
    keyframes: int = 0
    costs: list = field(default_factory=list)
    # per-frame wall times [s]: selector / window solve incl. device sync
    # (the reference's per-stage TicToc table, results.tex:74-83)
    sel_s: list = field(default_factory=list)
    solve_s: list = field(default_factory=list)
    # solves where no LM iteration was accepted despite a large cost0
    lm_stalls: int = 0
    # per-solve mean whitened IMU chi² (window.imu_chi2_mean): noise-model
    # consistency diagnostic. Measured (results/r4/imu_chi2_traces_all.json)
    # NOT to separate the MH_04 scale runaway — a rigid drift of the whole
    # window is residual-free — which is why the failure tripwire uses
    # `speeds` instead (see max_speed_fail).
    imu_chi2s: list = field(default_factory=list)
    # per-solve ‖v‖ of the newest frame — the failure detector's
    # slow-runaway statistic (see VioEstimator.max_speed_fail)
    speeds: list = field(default_factory=list)
    # per-solve marginalization-prior chi² (window.prior_chi2): the tension
    # between the solution and the marginalized history — the statistic that
    # CAN see a rigid window drift (imu_chi2 cannot, see above)
    prior_chi2s: list = field(default_factory=list)


class VioEstimator:
    """Host-side sliding-window estimator."""

    def __init__(self, cfg: WindowConfig, noise: ImuNoise = ImuNoise(),
                 dtype=jnp.float64,
                 init_state: Optional[dict] = None,
                 tic: Optional[np.ndarray] = None,
                 qic: Optional[np.ndarray] = None,
                 selector=None,
                 calibrate_extrinsic: bool = False,
                 zupt: bool = True,
                 zupt_weight: float = 30.0,
                 zupt_gyr_thresh: float = 0.05,
                 zupt_gyr_mean_thresh: float = 0.03,
                 zupt_acc_thresh: float = 1.0,
                 demote_px: float = 5.0,
                 prob_weight: bool = False,
                 prob_floor: float = 0.2,
                 max_speed_fail: float = 10.0,
                 init_align_rms_max: float = float("inf"),
                 adaptive_speed_ratio: float = 2.0,
                 adaptive_speed_floor: float = 4.0):
        # slow-runaway tripwire (EXTENSION beyond the reference's
        # failureDetection jump thresholds, estimator.cpp:612-658): reboot
        # when the rolling median-of-8 of the newest frame's speed ‖v‖
        # exceeds this [m/s]. Rationale from measurement: the MH_04
        # full-length scale runaway reaches km-scale ATE with failures=0
        # (results/r3/grid_full.json) because each solve moves the newest
        # pose <5 m (the jump check's blind spot) and the in-window IMU
        # residuals stay healthy (a rigid drift of the whole window is
        # residual-free — measured: imu_chi2 ≤ 10 throughout the blow-up,
        # results/r4/imu_chi2_traces_all.json). But position drift of that
        # magnitude REQUIRES a velocity state far beyond the platform:
        # rte_median 254 m means sustained ≳100 m/s estimated speed vs
        # EuRoC's true ≤2.5 m/s (calibration trace:
        # results/r4/speed_traces.json). Default 10 m/s = 4× the fastest
        # true EuRoC motion; set to the platform's physical envelope.
        self.max_speed_fail = max_speed_fail
        self.init_align_rms_max = init_align_rms_max
        self.init_diag: Optional[dict] = None
        # self-calibrating tripwire (see _failure); ratio 0 disables
        self.adaptive_speed_ratio = adaptive_speed_ratio
        self.adaptive_speed_floor = adaptive_speed_floor
        # prob-weighted projection factors (see WindowMeasurements.feat_w):
        # sqrt-info scaled by sqrt(max(prob, floor))
        self.prob_weight = prob_weight
        self.prob_floor = prob_floor
        # landmark demotion threshold [px mean reprojection]. The reference
        # rejects at 3 px (outliersRejection); round-3 measurement: at 20 px,
        # slip-corrupted tracks (persistent 2.5-px random-walk offsets)
        # survive in the window and a kappa=30 budget collects enough of
        # them to absorb a wrong scale on MH_04's fast segment (7 m ATE);
        # at 5 px the same cells hold. 4-sigma above the degraded-regime
        # pixel noise, so clean tracks are untouched.
        self.demote_px = demote_px
        self.zupt_gyr_mean_thresh = zupt_gyr_mean_thresh
        # zero-velocity updates when the IMU flags a frame stationary —
        # stabilizes the accel-bias/tilt null direction during long hovers
        # (extension; the reference diverges there, results.tex:49)
        self.zupt = zupt
        self.zupt_weight = zupt_weight
        self.zupt_gyr_thresh = zupt_gyr_thresh
        self.zupt_acc_thresh = zupt_acc_thresh
        # ESTIMATE_EXTRINSIC=2 mode (parameters.cpp:96-107): estimate the
        # camera-IMU rotation online from rotation consistency before init
        self.calibrate_extrinsic = calibrate_extrinsic
        self._ex_calibrator = None
        self.cfg = cfg
        # optional anticipation/attention selector (models.feature_selector.
        # AttentionSelector) — applied to incoming features like the
        # reference's f_selector->select() call (estimator_node.cpp:340)
        self.selector = selector
        self.noise = noise
        self.dtype = dtype
        self.init_hint = init_state or {}
        # oracle_init: trust the provided first-frame state + zero biases and
        # skip the visual-inertial initialization chain (tests/benchmarks on
        # bias-free synthetic data)
        self.oracle_init = bool(init_state) and init_state.get("oracle", True)
        self.tic0 = np.zeros(3) if tic is None else np.asarray(tic, float)
        self.qic0 = np.array([1.0, 0, 0, 0]) if qic is None else np.asarray(qic, float)
        self.reset()

    # ------------------------------------------------------------------

    def reset(self):
        cfg = self.cfg
        self.db = FeatureDB(cfg.max_feats, cfg.nf)
        self.p = np.zeros((cfg.nf, 3))
        self.q = np.tile(np.array([1.0, 0, 0, 0]), (cfg.nf, 1))
        self.v = np.zeros((cfg.nf, 3))
        self.ba = np.zeros((cfg.nf, 3))
        self.bg = np.zeros((cfg.nf, 3))
        self.td = 0.0
        self.tic = self.tic0.copy()
        self.qic = self.qic0.copy()
        self.prior = PriorFactor.empty(cfg, self.dtype)
        self.n_frames = 0
        self.imu_pairs: list = []   # raw IMU per adjacent pair
        self.stationary = np.zeros(cfg.nf)  # per-frame ZUPT flags
        self.td_at_frame = np.zeros(cfg.nf)  # td at capture (cur_td parity)
        self.frame_times: list = []
        self.trajectory: list = []  # (t, p, q, v) of the newest frame
        # diagnostics survive failure reboots — reset() runs on every
        # failureDetection trigger, and wiping the counter there would
        # report failures=0 for a run that rebooted N times
        if not hasattr(self, "diag"):
            self.diag = EstimatorDiagnostics()
        self.initialized = False
        # rolling speed statistic (cleared on reboot so the fresh window
        # starts with a clean history)
        self._speed_hist: list = []
        self.pending_relo = None   # (p, q, {feature_id: pt3 in relo frame})
        self.relo_result = None    # (relative_t, relative_q) after the solve
        # keyframe snapshot for the pose-graph consumer (pubKeyframe,
        # visualization.cpp:343-428): set after each keyframe solve
        self.last_keyframe = None

    # ------------------------------------------------------------------
    # IMU-rate propagation (midpoint, matching estimator_node predict(),
    # estimator_node.cpp:44-80)
    # ------------------------------------------------------------------

    @staticmethod
    def _propagate(p, q, v, ba, bg, dts, accs, gyrs, acc0, gyr0):
        """Midpoint IMU propagation — pure numpy (host hot path: runs per
        frame on ~20 samples; tracing jnp ops per sample costs 100x more
        than the arithmetic)."""
        g = np.array([0.0, 0.0, -GRAVITY])
        a_prev, w_prev = np.asarray(acc0, float), np.asarray(gyr0, float)
        q = np.asarray(q, float)
        for dt, a, w in zip(dts, accs, gyrs):
            un_w = 0.5 * (w_prev + w) - bg
            q_new = _np_quat_mul(q, _np_exp_quat(un_w * dt))
            q_new /= np.linalg.norm(q_new)
            R0 = _np_quat_rot(q)
            R1 = _np_quat_rot(q_new)
            un_a = 0.5 * (R0 @ (a_prev - ba) + R1 @ (a - ba)) + g
            p = p + v * dt + 0.5 * un_a * dt * dt
            v = v + un_a * dt
            q = q_new
            a_prev, w_prev = a, w
        return p, q, v

    # ------------------------------------------------------------------

    def process_frame(self, fm: FrameMeasurement):
        cfg = self.cfg
        k = self.n_frames
        self.last_keyframe = None

        if k == 0:
            # first frame: align roll/pitch with measured gravity
            # (matches initialStructure's g2R usage, estimator.cpp:416-426)
            if "p" in self.init_hint:
                self.p[0] = self.init_hint["p"]
                self.q[0] = self.init_hint["q"]
                self.v[0] = self.init_hint.get("v", np.zeros(3))
            else:
                R0 = _host_op(lie.gravity_to_rot, fm.acc0)
                self.q[0] = _host_op(lie.rot_to_quat, R0.T)
            self.db.add_frame(0, fm.feats)
            self.td_at_frame[0] = 0.0
            self.frame_times.append(fm.t)
            self.n_frames = 1
            self._record_output(fm.t, 0)
            return

        # store raw IMU for pair (k-1 → k) and propagate the new frame state
        self.imu_pairs.append({
            "dts": np.asarray(fm.imu_dts, float),
            "acc": np.asarray(fm.imu_acc, float),
            "gyr": np.asarray(fm.imu_gyr, float),
            "acc0": np.asarray(fm.acc0, float),
            "gyr0": np.asarray(fm.gyr0, float),
        })
        if self.zupt and len(fm.imu_gyr):
            gyr = np.asarray(fm.imu_gyr)
            gyr_fluct = np.abs(gyr - gyr.mean(0)).max()
            gyr_mean = np.linalg.norm(gyr.mean(0) - self.bg[k - 1])
            acc = np.asarray(fm.imu_acc)
            acc_fluct = np.abs(acc - acc.mean(0)).max()
            self.stationary[k] = float(
                gyr_fluct < self.zupt_gyr_thresh
                and gyr_mean < self.zupt_gyr_mean_thresh
                and acc_fluct < self.zupt_acc_thresh)
        else:
            self.stationary[k] = 0.0
        self.p[k], self.q[k], self.v[k] = self._propagate(
            self.p[k - 1], self.q[k - 1], self.v[k - 1],
            self.ba[k - 1], self.bg[k - 1],
            fm.imu_dts, fm.imu_acc, fm.imu_gyr, fm.acc0, fm.gyr0)
        self.ba[k] = self.ba[k - 1]
        self.bg[k] = self.bg[k - 1]

        feats = fm.feats
        if self.selector is not None and len(fm.imu_acc):
            # "t" enables the ground-truth horizon mode (use_ground_truth_hgen,
            # horizon_generator.cpp:73-123): the selector's gt_provider is
            # queried at the current frame time
            state_k1 = {
                "t": fm.t,
                "p": self.p[k], "q": self.q[k], "v": self.v[k],
                "ba": self.ba[k], "bg": self.bg[k],
                "acc": np.asarray(fm.imu_acc[-1], float),
                "gyr": np.asarray(fm.imu_gyr[-1], float),
            }
            import time as _time
            _t0 = _time.perf_counter()
            feats = self.selector.select(feats, state_k1, self.db,
                                         initialized=self.initialized)
            self.diag.sel_s.append(_time.perf_counter() - _t0)
        keyframe = self.db.add_frame(k, feats)
        # td stored per observation frame (cur_td parity,
        # feature_manager.h FeaturePerFrame): the reference stores the
        # CURRENT estimate because its node RE-STAMPS frames by td
        # (estimator_node getMeasurements aligns IMU to t_img + td), so the
        # factor only corrects the DELTA (td - td_i). This pipeline never
        # re-stamps — measurements keep their raw timestamps — so the
        # correct stored value is 0 (full absolute correction td·vel).
        # Storing the running estimate here under-corrects and RATCHETS td
        # upward without bound (measured: MH_05 full-length clean-velocity
        # converges to 2x the injected offset, results/r4/
        # td_recovery_full.json; the fix restores ~1x,
        # results/r4/td_recovery_fix.json).
        self.td_at_frame[k] = 0.0
        self.frame_times.append(fm.t)
        self.n_frames += 1

        if self.calibrate_extrinsic:
            self._run_extrinsic_calibration(k)

        if self.n_frames < cfg.nf:
            self._record_output(fm.t, k)
            return

        if not self.initialized and not self.oracle_init:
            # initialization waits for extrinsic calibration
            # (estimator.cpp:151-156: init only once ESTIMATE_EXTRINSIC != 2)
            if self.calibrate_extrinsic or not self._try_initialize():
                # stay in INITIAL: slide without building a prior
                # (estimator.cpp:151-179 — init retried as frames arrive)
                if keyframe:
                    R0 = _host_op(lie.quat_to_rot, self.q[0])
                    R1 = _host_op(lie.quat_to_rot, self.q[1])
                    Ric = _host_op(lie.quat_to_rot, self.qic)
                    self.db.slide_oldest(R0, self.p[0], R1, self.p[1],
                                         self.tic, Ric)
                    self._shift_state(0)
                    self.imu_pairs.pop(0)
                    self.frame_times.pop(0)
                else:
                    self.db.slide_second_newest()
                    self._shift_state(cfg.nf - 2)
                    a = self.imu_pairs.pop(cfg.nf - 3)
                    b = self.imu_pairs[cfg.nf - 3]
                    self.imu_pairs[cfg.nf - 3] = _merge_imu_pairs(a, b)
                    self.frame_times.pop(cfg.nf - 2)
                self.n_frames = cfg.nf - 1
                self._record_output(fm.t, cfg.nf - 2)
                return

        # ---- window full: triangulate, solve, marginalize, slide
        state = self._device_state()
        meas = self._measurements(state)

        inv_d, good = triangulate(state, meas.pts, meas.mask, meas.anchor, cfg)
        fresh = (self.db.solved < 0.5) & (self.db.feat_valid > 0)
        self.db.inv_depth[fresh] = np.asarray(inv_d)[fresh]
        self.db.solved[fresh] = np.asarray(good)[fresh]
        state = state._replace(inv_depth=jnp.asarray(self.db.inv_depth, self.dtype))
        # only solved landmarks participate in the BA
        meas = meas._replace(feat_valid=meas.feat_valid *
                             jnp.asarray(self.db.solved, self.dtype))

        relo_active = False
        if self.pending_relo is not None:
            rp, rq, matches = self.pending_relo
            relo_pts = np.zeros((cfg.max_feats, 3))
            relo_valid = np.zeros(cfg.max_feats)
            for fid, pt in matches.items():
                slot = self.db._find(fid)
                if slot >= 0 and self.db.solved[slot] > 0:
                    relo_pts[slot] = pt
                    relo_valid[slot] = 1.0
            if relo_valid.sum() >= 6:
                relo_active = True
                state = state._replace(
                    relo_p=jnp.asarray(rp, self.dtype),
                    relo_q=jnp.asarray(rq, self.dtype))
                meas = meas._replace(
                    relo_pts=jnp.asarray(relo_pts, self.dtype),
                    relo_valid=jnp.asarray(relo_valid, self.dtype))

        import time as _time
        _t0 = _time.perf_counter()
        new_state, sdiag = lm_solve(state, meas, cfg)
        self.diag.solves += 1
        self.diag.costs.append(float(sdiag["cost"]))  # float() syncs device
        self.diag.imu_chi2s.append(float(sdiag["imu_chi2"]))
        self.diag.prior_chi2s.append(float(sdiag.get("prior_chi2", 0.0)))
        speed = float(np.linalg.norm(np.asarray(new_state.v[cfg.nf - 1])))
        self.diag.speeds.append(speed)
        self._speed_hist.append(speed)
        if len(self._speed_hist) > 8:
            self._speed_hist.pop(0)
        # a solve whose cost never improved means EVERY LM iteration was
        # rejected — either truly converged (tiny cost0) or a silently-dead
        # solver (e.g. a non-finite prior; the round-3 df32 NaN bug showed
        # as exactly this). Count it so runs can't die quietly.
        if float(sdiag["cost"]) >= float(sdiag["cost0"]) and \
                float(sdiag["cost0"]) > 1e3:
            self.diag.lm_stalls += 1
        self.diag.solve_s.append(_time.perf_counter() - _t0)
        self.last_solve = (state, meas, new_state)  # diagnostics hook

        if self._failure(new_state):
            self.diag.failures += 1
            self.reset()
            return

        if relo_active:
            # relative transform: optimized relo pose → newest window frame
            # (relo_relative_t/q, estimator.cpp:1117-1127)
            r_p = np.array(new_state.relo_p)
            r_q = np.array(new_state.relo_q)
            R_r = _host_op(lie.quat_to_rot, r_q)
            nf1 = cfg.nf - 1
            rel_t = R_r.T @ (np.array(new_state.p[nf1]) - r_p)
            rel_q = _host_op(
                lambda a, b: lie.quat_mul(lie.quat_conj(a), b),
                r_q, np.asarray(new_state.q[nf1]))
            self.relo_result = (rel_t, rel_q)
            self.pending_relo = None
            new_state = new_state._replace(relo_p=None, relo_q=None)

        self._adopt(new_state)
        # NOTE: unlike the reference's double2vector yaw re-anchoring
        # (estimator.cpp:521-568), the window is NOT rigidly re-anchored
        # after the solve: our marginalization prior carries (soft) absolute
        # gauge information inherited from the first window's anchor rows, so
        # re-anchoring would fight the prior and random-walk the gauge.
        self._reject_outliers()
        self.initialized = True

        # marginalize + slide (estimator.cpp:817-990 + slideWindow :996-1081)
        state_sol = self._device_state()
        if keyframe:
            self.diag.keyframes += 1
            # snapshot of the just-optimized newest frame + its solved
            # landmarks for the pose-graph node (pubKeyframe publishes pose +
            # point cloud with ids, visualization.cpp:343-428; the reference
            # publishes the 2nd-newest — we publish the newest, equivalent
            # content one frame earlier)
            self.last_keyframe = self._keyframe_snapshot(fm.t)
            self.prior = mg.marginalize_oldest(state_sol, self._measurements(
                state_sol), cfg)
            R0 = _host_op(lie.quat_to_rot, self.q[0])
            R1 = _host_op(lie.quat_to_rot, self.q[1])
            Ric = _host_op(lie.quat_to_rot, self.qic)
            self.db.slide_oldest(R0, self.p[0], R1, self.p[1], self.tic, Ric)
            self._shift_state(0)
            self.imu_pairs.pop(0)
            self.frame_times.pop(0)
        else:
            self.prior = mg.marginalize_second_newest(state_sol, self.prior, cfg)
            self.db.slide_second_newest()
            self._shift_state(cfg.nf - 2)
            # merge the IMU of the dropped pair into its successor
            a = self.imu_pairs.pop(cfg.nf - 3)
            b = self.imu_pairs[cfg.nf - 3]
            self.imu_pairs[cfg.nf - 3] = _merge_imu_pairs(a, b)
            self.frame_times.pop(cfg.nf - 2)
        self.n_frames = cfg.nf - 1
        self._record_output(fm.t, cfg.nf - 2)

    def _run_extrinsic_calibration(self, k: int):
        """Feed (frame-pair correspondences, preintegrated Δq) to the
        online rotation calibrator (CalibrationExRotation usage at
        estimator.cpp:123-149); adopt R_ic once converged."""
        from anticipated_vins_mono_tpu.models.initialization import (
            ExtrinsicRotationCalibrator)
        if self._ex_calibrator is None:
            self._ex_calibrator = ExtrinsicRotationCalibrator(self.cfg.window)
        db = self.db
        both = (db.mask[:, k - 1] > 0) & (db.mask[:, k] > 0)
        if both.sum() < 20 or not self.imu_pairs:
            return
        pair = self.imu_pairs[-1]
        from anticipated_vins_mono_tpu.ops.preintegration import preintegrate
        pre = preintegrate(
            jnp.asarray(pair["dts"], self.dtype),
            jnp.asarray(pair["acc"], self.dtype),
            jnp.asarray(pair["gyr"], self.dtype),
            jnp.asarray(pair["acc0"], self.dtype),
            jnp.asarray(pair["gyr0"], self.dtype),
            jnp.zeros(3, self.dtype), jnp.asarray(self.bg[k], self.dtype),
            self.noise, with_cov=False)
        ric, done = self._ex_calibrator.add_pair(
            db.pts[both, k - 1, :2], db.pts[both, k, :2],
            np.asarray(pre.dq))
        if done:
            self.qic = _host_op(lie.rot_to_quat, ric)
            self.calibrate_extrinsic = False   # calibrated; switch to refine

    # ------------------------------------------------------------------
    # relocalization input (setReloFrame parity, estimator.cpp:1095-1129)
    # ------------------------------------------------------------------

    def set_relo_frame(self, relo_p, relo_q, matches: dict):
        """Attach a relocalization frame: its (drift-free, loop-corrected)
        pose and {feature_id: normalized pt3 observed in that frame}. The
        next window solve jointly optimizes the relo pose via projection
        factors (estimator.cpp:760-792) and leaves the relative transform
        in `self.relo_result` for the pose-graph consumer."""
        self.pending_relo = (np.asarray(relo_p, float),
                             np.asarray(relo_q, float), dict(matches))

    def _keyframe_snapshot(self, t: float):
        """Pose + solved landmarks of the newest window frame, in world
        coordinates — the content of the reference's keyframe_pose +
        keyframe_point topics (visualization.cpp:343-428): per landmark its
        world 3-D position (anchor obs / inverse depth through the anchor
        pose) and its normalized observation in this frame, keyed by id."""
        cfg = self.cfg
        nf1 = cfg.nf - 1
        db = self.db
        sel = np.nonzero((db.ids >= 0) & (db.solved > 0.5)
                         & (db.mask[:, nf1] > 0))[0]
        Ric = _host_op(lie.quat_to_rot, self.qic)
        X = np.zeros((len(sel), 3))
        anchors = db.anchor
        for row, s in enumerate(sel):
            a = int(anchors[s])
            pt_c = db.pts[s, a] / max(db.inv_depth[s], 1e-6)
            R_a = _host_op(lie.quat_to_rot, self.q[a])
            X[row] = R_a @ (Ric @ pt_c + self.tic) + self.p[a]
        return {
            "t": float(t),
            "p": self.p[nf1].copy(), "q": self.q[nf1].copy(),
            "ids": db.ids[sel].copy(),
            "X": X,
            "uv": db.pts[sel, nf1, :2].copy(),
        }

    # ------------------------------------------------------------------
    # visual-inertial initialization (initialStructure + visualInitialAlign,
    # estimator.cpp:211-431)
    # ------------------------------------------------------------------

    def _try_initialize(self) -> bool:
        from anticipated_vins_mono_tpu.models import initialization as vi_init
        cfg = self.cfg
        nf = cfg.nf
        self._init_attempts = getattr(self, "_init_attempts", 0) + 1

        sfm = vi_init.construct_sfm(self.db.pts, self.db.mask, nf,
                                    seed=self._init_attempts)
        if sfm is None:
            return False
        # structure-quality gate (GlobalSFM BA-convergence analog,
        # initial_sfm.cpp:226-232): accepting geometrically corrupted
        # structure locks a bad scale/gravity into the prior and the run
        # never recovers — rejecting waits for a cleaner window
        if sfm["med_reproj"] > 2.5 / 460.0:
            return False
        R_cw, c_w = sfm["R_cw"], sfm["c_w"]
        Ric = _host_op(lie.quat_to_rot, self.qic)  # cam→body
        # body→world rotations: R_wb = R_cwᵀ · Ricᵀ
        R_wb = np.einsum("nij->nji", R_cw) @ Ric.T
        q_wb = np.stack([_host_op(lie.rot_to_quat, R) for R in R_wb])

        # gyro bias LS + repropagation (initial_aligment.cpp:3-37) — host
        # f64 preintegration keeps init behavior identical across backends
        def host_pres():
            return [vi_init.preintegrate_host(
                pr["dts"], pr["acc"], pr["gyr"], pr["acc0"], pr["gyr0"],
                np.zeros(3), self.bg[i].copy())
                for i, pr in enumerate(self.imu_pairs[:cfg.window])]

        pres = host_pres()
        dbg = vi_init.solve_gyro_bias(q_wb, pres)
        if not np.all(np.isfinite(dbg)) or np.linalg.norm(dbg) > 1.0:
            return False
        self.bg[:] = self.bg + dbg
        pres = host_pres()

        out = vi_init.linear_alignment(R_wb, c_w, pres, self.tic)
        if out is None:
            return False
        vel_body, g_w, s, align_rms = out
        self.init_diag = {"attempt": self._init_attempts,
                          "med_reproj": float(sfm["med_reproj"]),
                          "dbg_norm": float(np.linalg.norm(dbg)),
                          "scale": float(s),
                          "align_rms": float(align_rms)}
        # alignment-quality gate: a window whose (v, g, s) solution fits
        # the preintegration this poorly starts the run with meters of
        # baked-in error that only slowly decays (the MH_04 1.5-10 m cells
        # — calibrated in results/r5/init_quality.json). Waiting for a
        # cleaner window costs ~a second of latency.
        if align_rms > self.init_align_rms_max:
            return False

        # apply (visualInitialAlign, estimator.cpp:355-431): metric scale,
        # gravity-aligned world with zero initial yaw
        p_b = s * c_w - np.einsum("nij,j->ni", R_wb, self.tic)
        p_b = p_b - p_b[0]
        R0 = _host_op(lie.gravity_to_rot, g_w)
        yaw0 = float(_host_op(lie.rot_to_ypr, R0 @ R_wb[0])[0])
        Rfix = _host_op(lie.ypr_to_rot, np.asarray([-yaw0, 0.0, 0.0])) @ R0
        self.p[:] = p_b @ Rfix.T
        for i in range(nf):
            self.q[i] = _host_op(lie.rot_to_quat, Rfix @ R_wb[i])
            self.v[i] = Rfix @ (R_wb[i] @ vel_body[i])
        self.ba[:] = 0.0
        # depths: force re-triangulation with the metric poses
        self.db.solved[:] = 0
        self.db.inv_depth[:] = 1.0
        self.trajectory.clear()   # outputs restart at initialization
        self.initialized = True
        return True

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _device_state(self) -> WindowState:
        # jnp.array (copy), NOT jnp.asarray: on the CPU backend asarray is
        # zero-copy for aligned f64, and CPU dispatch is ASYNC — a device
        # computation consuming these buffers can still be running when the
        # host's in-place mutations (slides, _shift_state) land, silently
        # corrupting the solve inputs (same defect class as the
        # vio_init_from_host handoff aliasing).
        d = self.dtype
        return WindowState(
            p=jnp.array(self.p, dtype=d), q=jnp.array(self.q, dtype=d),
            v=jnp.array(self.v, dtype=d), ba=jnp.array(self.ba, dtype=d),
            bg=jnp.array(self.bg, dtype=d),
            tic=jnp.array(self.tic, dtype=d),
            qic=jnp.array(self.qic, dtype=d),
            td=jnp.array(self.td, dtype=d),
            inv_depth=jnp.array(self.db.inv_depth, dtype=d))

    def _preintegrate_pairs(self):
        """One jitted vmapped preintegration over all W pairs (padded)."""
        cfg, d = self.cfg, self.dtype
        W, S = cfg.window, MAX_IMU_PER_PAIR
        dts = np.zeros((W, S))
        acc = np.zeros((W, S, 3))
        gyr = np.zeros((W, S, 3))
        a0 = np.zeros((W, 3))
        g0 = np.zeros((W, 3))
        for i in range(W):
            pair = self.imu_pairs[i]
            if len(pair["dts"]) > S:
                # graceful degradation instead of a hard assert: fuse down
                # to the pad (the reference's unbounded std::vector never
                # overflows; our static shape must not kill a run either)
                pd, pa, pg = _fuse_to_cap(pair["dts"], pair["acc"],
                                          pair["gyr"])
                pair = dict(pair, dts=pd, acc=pa, gyr=pg)
                self.imu_pairs[i] = pair
            n = len(pair["dts"])
            dts[i, :n] = pair["dts"]
            acc[i, :n] = pair["acc"]
            gyr[i, :n] = pair["gyr"]
            a0[i] = pair["acc0"]
            g0[i] = pair["gyr0"]
        if not hasattr(self, "_pre_jit"):
            noise = self.noise
            self._pre_jit = jax.jit(jax.vmap(
                lambda dt, a, g, a0_, g0_, ba, bg: preintegrate(
                    dt, a, g, a0_, g0_, ba, bg, noise)))
        return self._pre_jit(
            jnp.asarray(dts, d), jnp.asarray(acc, d), jnp.asarray(gyr, d),
            jnp.asarray(a0, d), jnp.asarray(g0, d),
            # copies: self.ba/bg are host-mutated (async-aliasing note)
            jnp.array(self.ba[:W], dtype=d), jnp.array(self.bg[:W], dtype=d))

    def _measurements(self, state: WindowState) -> WindowMeasurements:
        cfg, d = self.cfg, self.dtype
        pre = self._preintegrate_pairs()
        # jnp.array (copy) for every buffer the host mutates in place —
        # see _device_state's async-aliasing note
        return WindowMeasurements(
            pre=pre, pre_valid=jnp.ones(cfg.window, d),
            pts=jnp.array(self.db.pts, dtype=d),
            vel=jnp.array(self.db.vel, dtype=d),
            mask=jnp.array(self.db.mask, dtype=d),
            anchor=jnp.asarray(self.db.anchor),
            feat_valid=jnp.asarray(self.db.feat_valid, d),
            prior=self.prior,
            zupt_w=jnp.asarray(self.stationary * self.zupt_weight, d)
            if self.zupt else None,
            td_obs=jnp.array(self.td_at_frame, dtype=d)
            if cfg.estimate_td else None,
            feat_w=jnp.asarray(np.sqrt(np.maximum(
                self.db.prob, self.prob_floor)), d)
            if self.prob_weight else None)

    def _adopt(self, st: WindowState):
        self.p = np.array(st.p)
        self.q = np.array(st.q)
        self.v = np.array(st.v)
        self.ba = np.array(st.ba)
        self.bg = np.array(st.bg)
        self.tic = np.array(st.tic)
        self.qic = np.array(st.qic)
        self.td = float(st.td)
        self.db.inv_depth = np.asarray(st.inv_depth).copy()

    def _shift_state(self, drop: int):
        for arr in (self.p, self.q, self.v, self.ba, self.bg):
            arr[drop:-1] = arr[drop + 1:]
        self.stationary[drop:-1] = self.stationary[drop + 1:]
        self.td_at_frame[drop:-1] = self.td_at_frame[drop + 1:]

    def _failure(self, st: WindowState) -> bool:
        """failureDetection (estimator.cpp:612-658)."""
        nf = self.cfg.nf
        ba = np.asarray(st.ba[nf - 1])
        bg = np.asarray(st.bg[nf - 1])
        if np.linalg.norm(ba) > 2.5 or np.linalg.norm(bg) > 1.0:
            return True
        dp = np.asarray(st.p[nf - 1]) - self.p[nf - 1]
        if np.linalg.norm(dp) > 5.0 or abs(dp[2]) > 1.0:
            return True
        if not np.all(np.isfinite(np.asarray(st.p))):
            return True
        # slow-runaway tripwire (see max_speed_fail docstring): the rolling
        # MEDIAN of ‖v[newest]‖ so one aggressive-turn transient can't
        # reboot a healthy run
        if len(self._speed_hist) == 8 and \
                float(np.median(self._speed_hist)) > self.max_speed_fail:
            return True
        # SELF-CALIBRATING tripwire for the mid-scale (1.5-10 m) drift
        # mode: the MH_04 event forensics (results/r5/event_trace_s1.json)
        # show the tilt-gauge velocity ramp reaching 2-5× the run's OWN
        # recent speed envelope while staying under any platform-safe
        # absolute ceiling (peak 3.8-5.2 m/s vs the 10 m/s wire; true
        # MH_04 motion peaks 3.4). A fixed threshold cannot separate those
        # without dataset tuning — the run's own history can: trip when
        # the rolling median exceeds adaptive_speed_ratio × the 95th
        # percentile of the PREVIOUS few hundred solves (floor
        # adaptive_speed_floor so quiet hover phases don't hair-trigger).
        if self.adaptive_speed_ratio and len(self._speed_hist) == 8 \
                and len(self.diag.speeds) > 160:
            # reference excludes the last 8 s so a slow ramp cannot
            # launder itself into its own baseline
            ref = float(np.percentile(self.diag.speeds[-600:-80], 95))
            thresh = max(self.adaptive_speed_ratio * ref,
                         self.adaptive_speed_floor)
            if float(np.median(self._speed_hist)) > thresh:
                return True
        return False

    def _reject_outliers(self, demote_px: float = None):
        if demote_px is None:
            demote_px = self.demote_px
        """Depth-failure handling (reference removeFailures semantics).

        Features whose depth collapsed to the clamp, or whose reprojection is
        grossly wrong, are DEMOTED (solved=0, depth reset → re-triangulated
        next frame with their full track history) — never deleted. Deleting
        re-allocates the same tracker id as a fresh zero-baseline track and
        permanently destroys its history, which ratchets drift during
        low-excitation phases. Per-observation robustness is the Cauchy
        loss's job (estimator.cpp:717).
        """
        db, cfg = self.db, self.cfg
        R = _host_op(lie.quat_to_rot, self.q)
        Ric = _host_op(lie.quat_to_rot, self.qic)
        valid = np.nonzero(db.feat_valid * db.solved)[0]
        anchor = db.anchor
        for s in valid:
            a = anchor[s]
            demote = db.inv_depth[s] <= self.cfg.min_inv_depth * 1.001
            if not demote:
                ptc = db.pts[s, a] / db.inv_depth[s]
                pw = R[a] @ (Ric @ ptc + self.tic) + self.p[a]
                errs = []
                for j in np.nonzero(db.mask[s])[0]:
                    if j == a:
                        continue
                    pc = Ric.T @ (R[j].T @ (pw - self.p[j]) - self.tic)
                    if pc[2] < 1e-3:
                        errs.append(100.0)
                        continue
                    e = pc[:2] / pc[2] - db.pts[s, j, :2]
                    errs.append(np.linalg.norm(e) * 460.0)
                demote = bool(errs and np.mean(errs) > demote_px)
            if demote:
                db.solved[s] = 0
                db.inv_depth[s] = 0.2

    def _record_output(self, t: float, slot: int):
        self.trajectory.append((
            t, self.p[slot].copy(), self.q[slot].copy(), self.v[slot].copy()))
