"""LoopClosureNode unit tests: detectLoop acceptance semantics + drift
application (pose_graph.cpp:304-385, 561-575). The full imagery→PGO chain
is exercised end-to-end by utils/loop_benchmark (RESULTS.md)."""

import numpy as np
import jax.numpy as jnp

from anticipated_vins_mono_tpu.models import posegraph as pg
from anticipated_vins_mono_tpu.models.loop_node import LoopClosureNode
from anticipated_vins_mono_tpu.ops import cameras, lie


def _node(**kw):
    cam = cameras.PinholeCamera.create(100.0, 100.0, 60.0, 40.0,
                                       width=120, height=80)
    kw.setdefault("exclude_recent", 5)
    kw.setdefault("sim_hi", 0.5)
    kw.setdefault("retrieval", "bow")   # hist-driven unit tests
    return LoopClosureNode(cam=cam, graph=pg.PoseGraph(), **kw)


def _push_hist(node, hist, p=None):
    """Insert a keyframe entry directly (bypassing imagery)."""
    from anticipated_vins_mono_tpu.models.loop_node import KeyframeEntry
    k = node.graph.n
    p = np.zeros(3) if p is None else p
    node.graph.add_keyframe(p, np.array([1.0, 0, 0, 0]), t=float(k))
    node.entries.append(KeyframeEntry(
        t=float(k), p_vio=p, q_vio=np.array([1.0, 0, 0, 0]), hist=hist,
        corner_desc=np.zeros((1, pg.BRIEF_BITS), bool),
        corner_norm=np.zeros((1, 2)), win_ids=np.zeros(0, np.int64),
        win_desc=np.zeros((0, pg.BRIEF_BITS), bool),
        win_X=np.zeros((0, 3))))
    return k


def _dummy_desc(n=1):
    return np.zeros((n, pg.BRIEF_BITS), np.uint8)


def _rand_hist(rng, words=40):
    """Sparse BoW-like histogram (a real frame quantizes a few hundred
    descriptors into ~tens of distinct words — dense random vectors would
    all be cosine-similar and say nothing about the thresholds)."""
    h = np.zeros(pg.BOW_WORDS)
    idx = rng.choice(pg.BOW_WORDS, words, replace=False)
    h[idx] = 0.5 + rng.random(words)
    return h


def test_detect_loop_dual_threshold():
    """Fires only when best > hi AND a second candidate > lo; returns the
    EARLIEST candidate above lo (pose_graph.cpp:304-385)."""
    rng = np.random.default_rng(0)
    node = _node(sim_hi=0.5, sim_lo_ratio=0.5)
    base = _rand_hist(rng)
    # kf 0 and 1: the "place"; 2-9: distinct places
    for h in (base, base * 1.05):
        _push_hist(node, h)
    for _ in range(8):
        _push_hist(node, _rand_hist(rng))
    # query identical to the place → both top candidates similar → fires,
    # returns the EARLIEST (index 0, not the best-scoring duplicate)
    k = node.graph.n
    got = node._detect_loop(k, base, _dummy_desc())
    assert got == 0, got
    # query matching nothing → no fire
    assert node._detect_loop(k, _rand_hist(rng), _dummy_desc()) is None


def test_detect_loop_needs_second_candidate():
    """A single high-scoring candidate with no support does not fire."""
    rng = np.random.default_rng(1)
    node = _node(sim_hi=0.5, sim_lo_ratio=0.9)
    base = _rand_hist(rng)
    _push_hist(node, base)
    for _ in range(9):
        _push_hist(node, _rand_hist(rng))
    # only ONE candidate resembles the query; with sim_lo ≈ sim_hi the
    # second-candidate gate fails
    assert node._detect_loop(node.graph.n, base, _dummy_desc()) is None


def test_exclusion_window():
    rng = np.random.default_rng(2)
    node = _node(exclude_recent=50)
    h = np.abs(rng.random(pg.BOW_WORDS))
    for _ in range(10):
        _push_hist(node, h)
    # all matches are within the exclusion window
    assert node._detect_loop(node.graph.n, h, _dummy_desc()) is None


def test_correct_pose_applies_drift():
    node = _node()
    node.graph.yaw_drift = 90.0
    node.graph.t_drift = np.array([1.0, 2.0, 3.0])
    p, q = node.correct_pose(np.array([1.0, 0, 0]),
                             np.array([1.0, 0, 0, 0.0]))
    np.testing.assert_allclose(p, [1.0, 3.0, 3.0], atol=1e-9)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def _push_desc(node, desc, p=None):
    """Insert a keyframe with a real descriptor set (direct retrieval)."""
    k = _push_hist(node, np.zeros(pg.BOW_WORDS), p)
    node._desc_cat = np.concatenate([node._desc_cat,
                                     desc.astype(np.uint8)])
    node._desc_off.append(len(node._desc_cat))
    return k


def _flip_bits(rng, desc, n_flip):
    out = desc.copy()
    for row in out:
        idx = rng.choice(desc.shape[1], n_flip, replace=False)
        row[idx] ^= 1
    return out


def test_direct_similarities_oracle():
    """posegraph.direct_similarities == naive per-pair min-Hamming loop,
    including empty keyframes."""
    rng = np.random.default_rng(3)
    sizes = (5, 0, 7, 3)
    descs = [rng.integers(0, 2, (m, pg.BRIEF_BITS)).astype(np.uint8)
             for m in sizes]
    off = np.concatenate([[0], np.cumsum(sizes)])
    cat = np.concatenate(descs)
    q = rng.integers(0, 2, (6, pg.BRIEF_BITS)).astype(np.uint8)
    got = pg.direct_similarities(cat, off, q, ham_thresh=120)
    for k, d in enumerate(descs):
        if len(d) == 0:
            assert got[k] == 0.0
            continue
        ham = (q[:, None, :] ^ d[None, :, :]).sum(-1)
        want = (ham.min(1) < 120).mean()
        np.testing.assert_allclose(got[k], want)


def test_detect_loop_direct_retrieval():
    """Direct BRIEF set matching: a revisit (same descriptors, a few bits
    flipped) fires and returns the earliest instance; unrelated random
    descriptor sets never fire (random 256-bit pairs sit ~128±8 bits apart,
    far outside the 48-bit match radius)."""
    rng = np.random.default_rng(4)
    node = _node(retrieval="direct", sim_hi=None)
    assert node.sim_hi == 0.9    # per-retrieval default resolved
    place = rng.integers(0, 2, (40, pg.BRIEF_BITS)).astype(np.uint8)
    _push_desc(node, place)                                  # kf 0
    _push_desc(node, _flip_bits(rng, place, 5))              # kf 1 same place
    for _ in range(8):
        _push_desc(node, rng.integers(0, 2, (40, pg.BRIEF_BITS))
                   .astype(np.uint8))
    k = node.graph.n
    got = node._detect_loop(k, np.zeros(pg.BOW_WORDS),
                            _flip_bits(rng, place, 5))
    assert got == 0, got
    novel = rng.integers(0, 2, (40, pg.BRIEF_BITS)).astype(np.uint8)
    assert node._detect_loop(k, np.zeros(pg.BOW_WORDS), novel) is None
