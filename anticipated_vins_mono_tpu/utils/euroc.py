"""EuRoC ground-truth state loading + IMU derivation.

Parses the EuRoC `state_groundtruth_estimate0` CSV layout
(timestamp[ns], p[3], q[wxyz], v[3], bg[3], ba[3]) exactly as the reference
does in HorizonGenerator::loadGroundTruth
(/root/reference/vins_estimator/src/utility/horizon_generator.cpp:169-196)
and benchmark_publisher (src/benchmark_publisher_node.cpp:33-52).

Since raw EuRoC imagery is not shipped with the reference, sequences are
replayed as *state* trajectories: body-frame IMU measurements are derived
from the GT states (finite-difference accelerations + body rates, plus the
recorded biases), and feature tracks are synthesized from a persistent
landmark field (utils.sequence). This preserves the motion realism that the
benchmark numbers depend on (fast MAV flight for MH_05 etc.).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import lie
from anticipated_vins_mono_tpu.utils.synthetic import G_W, Trajectory

REFERENCE_GT_DIR = "/root/reference/benchmark_publisher/config"


def available_sequences() -> list:
    if not os.path.isdir(REFERENCE_GT_DIR):
        return []
    return sorted(d for d in os.listdir(REFERENCE_GT_DIR)
                  if os.path.isfile(os.path.join(REFERENCE_GT_DIR, d, "data.csv")))


def load_gt_csv(path: str, max_rows: int | None = None) -> dict:
    """Load a EuRoC GT CSV → dict of arrays (t seconds, p, q wxyz, v, bg, ba).

    Uses the native C++ parser (native/src/avm_native.cc) when the toolchain
    is available — ~30x faster than genfromtxt — with identical output."""
    try:
        from anticipated_vins_mono_tpu import native
        out = native.load_euroc_csv(path, max_rows=max_rows or 400000)
        if out is not None:
            return out
    except Exception:
        pass
    raw = np.genfromtxt(path, delimiter=",", skip_header=1,
                        max_rows=max_rows)
    t = (raw[:, 0] - raw[0, 0]) * 1e-9
    return {
        "t": t, "p": raw[:, 1:4], "q": raw[:, 4:8], "v": raw[:, 8:11],
        "bg": raw[:, 11:14], "ba": raw[:, 14:17],
    }


def gt_to_trajectory(gt: dict, add_bias: bool = True) -> Trajectory:
    """Derive body-frame IMU measurements from GT states.

    gyr_k = log(q_k⁻¹ ⊗ q_{k+1}) / dt           (body rates)
    acc_k = R_kᵀ (dv/dt − g) + ba                 (specific force)
    """
    t, p, q, v = gt["t"], gt["p"], gt["q"], gt["v"]
    n = len(t)
    dt = np.gradient(t)
    a_w = np.gradient(v, axis=0) / dt[:, None]

    q_j = jnp.asarray(q)
    # Gyro synthesis has an inherent timing/bandwidth trade at the GT's
    # 200 Hz sampling (measured A/B on MH_04 60 s, policy=all):
    # - FORWARD difference log(q_k^-1 ⊗ q_{k+1})/dt (default): the exact
    #   AVERAGE rate over [t_k, t_{k+1}] — full bandwidth, but it is the
    #   instantaneous rate at t_k+dt/2, so the stream LEADS its stamps by
    #   half a GT sample (2.5 ms at 200 Hz). ATE 0.082 m. The skew acts as
    #   a true cam-IMU offset: online td estimation on an injected 5 ms
    #   recovers 2.44–2.58 ms ≡ (injected − 2.5) to within ±0.1 ms
    #   (results/r4/td_recovery_backfill.json) — td experiments must
    #   compare against (cam_td − dt/2).
    # - CENTRAL difference (ANT_GT_GYRO=central): timing-true (td then
    #   recovers the full injected value: 5.006/5.136 ms measured,
    #   results/r4/td_recovery_central.json) but halves the effective
    #   gyro bandwidth, which costs real accuracy under MH_04's
    #   aggressive rotation: ATE 0.188 m. Kept as the control mode.
    if os.environ.get("ANT_GT_GYRO", "forward") == "forward":
        dq = lie.quat_mul(lie.quat_conj(q_j[:-1]), q_j[1:])
        w_body = np.asarray(lie.log_so3(dq)) / dt[:-1, None]
        w_body = np.vstack([w_body, w_body[-1:]])
    else:
        dq2 = lie.quat_mul(lie.quat_conj(q_j[:-2]), q_j[2:])
        dt2 = (t[2:] - t[:-2])[:, None]
        w_mid = np.asarray(lie.log_so3(dq2)) / dt2
        dq_f = lie.quat_mul(lie.quat_conj(q_j[:1]), q_j[1:2])
        dq_b = lie.quat_mul(lie.quat_conj(q_j[-2:-1]), q_j[-1:])
        w_first = np.asarray(lie.log_so3(dq_f)) / dt[:1, None]
        w_last = np.asarray(lie.log_so3(dq_b)) / dt[-1:, None]
        w_body = np.vstack([w_first, w_mid, w_last])

    R = np.asarray(lie.quat_to_rot(q_j))
    acc_body = np.einsum("nij,nj->ni", R.transpose(0, 2, 1), a_w - G_W)
    if add_bias:
        acc_body = acc_body + gt["ba"]
        w_body = w_body + gt["bg"]
    return Trajectory(t, p, q, v, acc_body, w_body)


def load_sequence(name: str, max_seconds: float | None = None) -> Trajectory:
    """Load a named EuRoC sequence's GT as a measurement trajectory."""
    path = os.path.join(REFERENCE_GT_DIR, name, "data.csv")
    max_rows = int(max_seconds * 200) if max_seconds else None
    gt = load_gt_csv(path, max_rows=max_rows)
    return gt_to_trajectory(gt)
