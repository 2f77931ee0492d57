"""Place-recognition fidelity evaluation: precision/recall of the global
descriptor against ground-truth revisits.

The reference's detectLoop queries a DBoW2 BRIEF vocabulary with top-4 /
dual-threshold (0.05/0.015) / 50-frame-exclusion acceptance
(/root/reference/pose_graph/src/pose_graph.cpp:304-385). Our TPU-native
replacement is a per-bit-majority BRIEF signature compared by cosine
similarity. This tool quantifies that replacement (VERDICT item 4): render
keyframes along a multi-lap circuit, label pairs by ground-truth pose
proximity, sweep the similarity threshold → P/R curve, and report the
operating point used by LoopClosureNode.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import frontend as fe
from anticipated_vins_mono_tpu.models import posegraph as pg
from anticipated_vins_mono_tpu.ops import cameras, lie
from anticipated_vins_mono_tpu.utils import render
from anticipated_vins_mono_tpu.utils.synthetic import loop_trajectory


def build_keyframe_descriptors(duration: float = 60.0, laps: float = 3.0,
                               radius: float = 3.0, kf_hz: float = 2.0,
                               n_corners: int = 300, seed: int = 0,
                               cam=None):
    """Render keyframes along the circuit → (global descs [K,256],
    positions [K,3], view dirs [K,3])."""
    cam = cam or cameras.euroc_camera()
    gt = loop_trajectory(duration, laps=laps, radius=radius)
    world = render.make_box_world(gt.p, margin=5.0, seed=seed)
    rays = render.camera_rays(cam)
    R_all = np.asarray(lie.quat_to_rot(jnp.asarray(gt.q)))
    stride = int(round(200.0 / kf_hz))
    ks = np.arange(0, len(gt.t), stride)
    gdescs, pos, view = [], [], []
    for k in ks:
        img = render.render_frame(world, cam, rays, gt.p[k], R_all[k])
        imj = jnp.asarray(img, jnp.float32)
        uv, score, valid = fe.detect_features(imj, jnp.zeros_like(imj),
                                              n_corners, 12)
        uv = np.asarray(uv)[np.asarray(valid)]
        desc = pg.brief_descriptors(imj, jnp.asarray(uv))
        g = np.asarray(pg.bow_histogram(desc, jnp.ones(len(uv))))
        gdescs.append(g)
        pos.append(gt.p[k])
        view.append(R_all[k][:, 2])     # camera forward = body +z
    return np.stack(gdescs), np.stack(pos), np.stack(view)


def pr_curve(gdescs, pos, view, exclude: int = 20,
             dist_thresh: float = 0.6, angle_thresh_deg: float = 25.0):
    """Label every (i, j<i-exclude) pair by GT revisit; sweep similarity."""
    K = len(gdescs)
    sims, labels = [], []
    cosa = np.cos(np.radians(angle_thresh_deg))
    for i in range(exclude + 1, K):
        js = np.arange(0, i - exclude)
        # causal tf-idf scoring, exactly as LoopClosureNode queries
        s = pg.idf_similarities(gdescs[js], gdescs[i])
        d = np.linalg.norm(pos[js] - pos[i], axis=1)
        a = view[js] @ view[i]
        lab = (d < dist_thresh) & (a > cosa)
        sims.append(s)
        labels.append(lab)
    sims = np.concatenate(sims)
    labels = np.concatenate(labels)
    order = np.argsort(sims)[::-1]
    tp = np.cumsum(labels[order])
    fp = np.cumsum(~labels[order])
    n_pos = labels.sum()
    precision = tp / np.maximum(tp + fp, 1)
    recall = tp / max(n_pos, 1)
    return sims[order], precision, recall, int(n_pos), int(len(labels))


def best_query_eval(gdescs, pos, view, exclude: int = 20,
                    dist_thresh: float = 0.6, angle_thresh_deg: float = 25.0,
                    sim_hi: float = 0.32):
    """Per-query top-1 evaluation — the way detectLoop actually uses the
    database: for every keyframe with ≥1 true revisit, does the best-scoring
    candidate (above threshold) land on a true revisit?"""
    K = len(gdescs)
    cosa = np.cos(np.radians(angle_thresh_deg))
    n_q = n_hit = n_false = 0
    for i in range(exclude + 1, K):
        js = np.arange(0, i - exclude)
        d = np.linalg.norm(pos[js] - pos[i], axis=1)
        a = view[js] @ view[i]
        lab = (d < dist_thresh) & (a > cosa)
        s = pg.idf_similarities(gdescs[js], gdescs[i])
        best = int(np.argmax(s))
        fired = s[best] > sim_hi
        if lab.any():
            n_q += 1
            if fired and lab[best]:
                n_hit += 1
        elif fired:
            n_false += 1
    return {"queries_with_revisit": n_q, "top1_hits": n_hit,
            "false_fires": n_false,
            "recall_top1": n_hit / max(n_q, 1)}


def main(duration=60.0, laps=3.0, seed=0):
    g, p, v = build_keyframe_descriptors(duration, laps, seed=seed)
    sims, prec, rec, n_pos, n_pairs = pr_curve(g, p, v)
    # recall at the last index where precision is still 1.0 / ≥0.99
    r_at_p100 = float(rec[prec >= 1.0].max()) if (prec >= 1.0).any() else 0.0
    r_at_p99 = float(rec[prec >= 0.99].max()) if (prec >= 0.99).any() else 0.0
    t_at_p100 = float(sims[prec >= 1.0][np.argmax(rec[prec >= 1.0])]) \
        if (prec >= 1.0).any() else None
    out = {
        "benchmark": "place_recognition",
        "keyframes": len(g), "positive_pairs": n_pos, "pairs": n_pairs,
        "recall_at_precision_1.0": r_at_p100,
        "recall_at_precision_0.99": r_at_p99,
        "sim_threshold_at_precision_1.0": t_at_p100,
        "top1": best_query_eval(g, p, v),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    main(a.duration, a.laps, a.seed)
