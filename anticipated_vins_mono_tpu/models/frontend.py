"""Front end (L2): feature tracking on images — batched JAX kernels.

Capability parity with the fork's own tracker re-implementation
(/root/reference/feature_tracker/src/feature_tracker.cpp +
cvmodified.cpp):

- histogram equalization (CLAHE stand-in)            (feature_tracker.cpp:36-40)
- pyramidal Lucas-Kanade optical flow                (:54-86, cv::calcOpticalFlowPyrLK)
- fundamental/essential RANSAC outlier rejection     (rejectWithF, :263-296)
- min-distance mask favoring long-lived features     (enforceMinDist, :191-259)
- Shi-Tomasi (GFTT) corner detection that RETURNS THE QUALITY SCORE — the
  score becomes the tracking probability p_ℓ         (cvmodified.cpp:43+,
  createMeasurements score/maxscore normalization, :300-343)
- measurement packaging {id: (normalized pt, velocity, prob)}

TPU-first: the image pipeline is conv/reduce-window ops (VPU/MXU); LK is a
vmap over features with a fixed-iteration inner loop; detection is NMS via
`lax.reduce_window` + top-k. All static shapes; masks handle variable
feature counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import cameras


# ----------------------------------------------------------------------------
# Image ops
# ----------------------------------------------------------------------------


def equalize(img: jax.Array, bins: int = 64) -> jax.Array:
    """Global histogram equalization (cheap fallback; the tracker default is
    `clahe` below, matching the reference)."""
    flat = img.reshape(-1)
    hist = jnp.histogram(flat, bins=bins, range=(0.0, 1.0))[0]
    cdf = jnp.cumsum(hist) / flat.size
    idx = jnp.clip((img * bins).astype(jnp.int32), 0, bins - 1)
    return cdf[idx]


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles", "bins",
                                              "impl"))
def clahe(img: jax.Array, clip_limit: float = 3.0, tiles: int = 8,
          bins: int = 256, impl: str = None) -> jax.Array:
    """Contrast-limited adaptive histogram equalization.

    Parity with the reference's cv::createCLAHE(3.0, cv::Size(8, 8))
    (feature_tracker.cpp:36-40): per-tile clipped histograms with excess
    redistribution, then bilinear interpolation of the 4 neighboring tile
    mappings per pixel.

    Two implementations of the SAME map (parity-tested to fp tolerance,
    tests/test_frontend.py):
    - "gather": vmapped bincount histograms + 4 per-pixel LUT gathers —
      the natural CPU formulation.
    - "onehot": gather-free TPU formulation. Per-element gathers serialize
      on the TPU's vector memory (measured 17.4 ms/frame for the gather
      CLAHE on a v5 chip vs 0.9 ms for this path): histograms become a
      fused compare-and-reduce over the bin axis, and the LUT lookup
      becomes, per half-tile interpolation CELL (within which the 4
      neighbor tiles and the bilinear weight ramps are STATIC), a
      one-hot·table contraction — pure VPU work, no scatter/gather.
    impl=None picks by backend at trace time.
    """
    if impl is None:
        impl = "gather" if jax.default_backend() == "cpu" else "onehot"
    H, W = img.shape
    ty, tx = -(-H // tiles), -(-W // tiles)          # ceil tile size
    pad_y, pad_x = ty * tiles - H, tx * tiles - W
    imp = jnp.pad(img, ((0, pad_y), (0, pad_x)), mode="edge")

    idx = jnp.clip((imp * bins).astype(jnp.int32), 0, bins - 1)
    npix = ty * tx
    if impl == "onehot":
        binv = jnp.arange(bins, dtype=jnp.int32)
        oh = (idx.reshape(tiles, ty, tiles, tx)[..., None]
              == binv).astype(img.dtype)
        hists = jnp.einsum("aybxc->abc", oh).reshape(tiles * tiles, bins)
    else:
        tiles_idx = idx.reshape(tiles, ty, tiles, tx).transpose(0, 2, 1, 3)
        tiles_idx = tiles_idx.reshape(tiles * tiles, ty * tx)
        hists = jax.vmap(lambda v: jnp.bincount(v, length=bins))(tiles_idx)
        hists = hists.astype(img.dtype)   # keep the image dtype under x64

    limit = jnp.maximum(clip_limit * npix / bins, 1.0)
    excess = jnp.sum(jnp.maximum(hists - limit, 0.0), axis=1, keepdims=True)
    hists = jnp.minimum(hists, limit) + excess / bins
    luts = jnp.cumsum(hists, axis=1) / npix              # [T*T, bins]
    luts = luts.reshape(tiles, tiles, bins)

    if impl == "onehot":
        out = _clahe_lookup_onehot(imp, idx, luts, tiles, ty, tx, bins)
        return out[:H, :W]

    Hp, Wp = imp.shape
    yy = jnp.arange(Hp, dtype=img.dtype)
    xx = jnp.arange(Wp, dtype=img.dtype)
    fy = jnp.clip((yy + 0.5) / ty - 0.5, 0.0, tiles - 1.0)
    fx = jnp.clip((xx + 0.5) / tx - 0.5, 0.0, tiles - 1.0)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, tiles - 2)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, tiles - 2)
    wy = (fy - y0)[:, None]
    wx = (fx - x0)[None, :]
    Y0 = jnp.broadcast_to(y0[:, None], (Hp, Wp))
    X0 = jnp.broadcast_to(x0[None, :], (Hp, Wp))
    v00 = luts[Y0, X0, idx]
    v01 = luts[Y0, X0 + 1, idx]
    v10 = luts[Y0 + 1, X0, idx]
    v11 = luts[Y0 + 1, X0 + 1, idx]
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    return out[:H, :W]


def _clahe_lookup_onehot(imp, idx, luts, tiles, ty, tx, bins):
    """Gather-free bilinear LUT interpolation.

    Splits the padded image into (tiles+1)² half-tile-shifted CELLS. Within
    a cell the 4 neighboring tile LUTs are fixed and the bilinear weights
    are static ramps, so the per-pixel lookup is a one-hot(bin) · LUT
    contraction per (cell, corner) — a fused compare+reduce, zero gathers.
    Reproduces the gather path's y0/fy clipping semantics exactly (border
    cells clamp to the edge tile pair with saturated weights)."""
    dtype = imp.dtype
    Hp, Wp = imp.shape
    hy, hx = ty // 2, tx // 2
    idxp = jnp.pad(idx, ((hy, ty - hy), (hx, tx - hx)), mode="edge")
    cells = idxp.reshape(tiles + 1, ty, tiles + 1, tx)

    # static per-cell neighbor tiles + weight ramps (numpy, trace-time)
    y0c = np.clip(np.arange(tiles + 1) - 1, 0, tiles - 2)       # [T+1]
    x0c = np.clip(np.arange(tiles + 1) - 1, 0, tiles - 2)
    yy = np.arange(Hp + ty) - hy                   # padded global row idx
    fy = np.clip((yy + 0.5) / ty - 0.5, 0.0, tiles - 1.0)
    wyv = (fy - y0c[np.arange(Hp + ty) // ty]).reshape(tiles + 1, ty)
    xx = np.arange(Wp + tx) - hx
    fx = np.clip((xx + 0.5) / tx - 0.5, 0.0, tiles - 1.0)
    wxv = (fx - x0c[np.arange(Wp + tx) // tx]).reshape(tiles + 1, tx)
    wy = jnp.asarray(np.clip(wyv, 0.0, 1.0), dtype)             # [T+1,ty]
    wx = jnp.asarray(np.clip(wxv, 0.0, 1.0), dtype)             # [T+1,tx]

    binv = jnp.arange(bins, dtype=jnp.int32)
    oh = (cells[..., None] == binv).astype(dtype)  # [T+1,ty,T+1,tx,B]
    T00 = luts[y0c][:, x0c]                        # [T+1,T+1,B] static sel
    T01 = luts[y0c][:, x0c + 1]
    T10 = luts[y0c + 1][:, x0c]
    T11 = luts[y0c + 1][:, x0c + 1]
    v00 = jnp.einsum("aybxc,abc->aybx", oh, T00)
    v01 = jnp.einsum("aybxc,abc->aybx", oh, T01)
    v10 = jnp.einsum("aybxc,abc->aybx", oh, T10)
    v11 = jnp.einsum("aybxc,abc->aybx", oh, T11)
    wyc = wy[:, :, None, None]
    wxc = wx[None, None, :, :]
    out = (v00 * (1 - wyc) * (1 - wxc) + v01 * (1 - wyc) * wxc
           + v10 * wyc * (1 - wxc) + v11 * wyc * wxc)
    out = out.reshape(Hp + ty, Wp + tx)
    return out[hy:hy + Hp, hx:hx + Wp]


def _blur3(img: jax.Array) -> jax.Array:
    """Separable [1 2 1]/4 blur."""
    k = jnp.array([0.25, 0.5, 0.25], img.dtype)

    def conv1(x, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad, mode="edge")
        out = 0.0
        for o, kv in zip((0, 1, 2), k):
            s = [slice(None), slice(None)]
            s[axis] = slice(o, o + x.shape[axis])
            out = out + kv * xp[tuple(s)]
        return out

    return conv1(conv1(img, 0), 1)


def build_pyramid(img: jax.Array, levels: int = 3) -> list:
    """Gaussian pyramid, factor-2 downsampling."""
    pyr = [img]
    for _ in range(levels - 1):
        img = _blur3(img)[::2, ::2]
        pyr.append(img)
    return pyr


def _gradients(img: jax.Array):
    """Central-difference gradients (edge-padded)."""
    xp = jnp.pad(img, ((0, 0), (1, 1)), mode="edge")
    Ix = 0.5 * (xp[:, 2:] - xp[:, :-2])
    yp = jnp.pad(img, ((1, 1), (0, 0)), mode="edge")
    Iy = 0.5 * (yp[2:, :] - yp[:-2, :])
    return Ix, Iy


def gftt_response(img: jax.Array, window: int = 3) -> jax.Array:
    """Shi-Tomasi min-eigenvalue corner response.

    Mirrors cvmodified::goodFeaturesToTrack's cornerMinEigenVal core — the
    per-pixel score that the fork surfaces as the tracking probability
    (cvmodified.cpp:43+)."""
    Ix, Iy = _gradients(img)
    a, b, c = Ix * Ix, Ix * Iy, Iy * Iy
    for _ in range(window // 2 + 1):
        a, b, c = _blur3(a), _blur3(b), _blur3(c)
    tr = 0.5 * (a + c)
    det = jnp.sqrt(jnp.maximum(((a - c) * 0.5) ** 2 + b * b, 0.0))
    return jnp.maximum(tr - det, 0.0)


@functools.partial(jax.jit, static_argnames=("max_n", "min_dist"))
def detect_features(img: jax.Array, occupied_mask: jax.Array,
                    max_n: int, min_dist: int = 16,
                    quality_level: float = 0.01):
    """Top-`max_n` corners with non-max suppression + occupancy mask.

    Returns (uv [max_n,2] float pixels, score [max_n], valid [max_n]).
    occupied_mask: 1 where features already exist (their min-dist region) —
    the same role as the reference's mask image (enforceMinDist :191-259,
    detectFeatures :161-176).
    """
    resp = gftt_response(img)
    resp = resp * (1.0 - occupied_mask)
    # NMS: keep pixels that are the max in their (min_dist x min_dist) window
    wmax = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max,
        (min_dist, min_dist), (1, 1), "SAME")
    is_peak = (resp >= wmax) & (resp > quality_level * jnp.max(resp))
    flat = jnp.where(is_peak, resp, 0.0).reshape(-1)
    score, idx = jax.lax.top_k(flat, max_n)
    H, W = img.shape
    uv = jnp.stack([(idx % W).astype(img.dtype),
                    (idx // W).astype(img.dtype)], axis=-1)
    valid = score > 0.0
    return uv, score, valid


def _bilinear(img: jax.Array, uv: jax.Array):
    """Bilinear sample img at float pixel coords uv [...,2] (x,y)."""
    H, W = img.shape
    x = jnp.clip(uv[..., 0], 0.0, W - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _extract_patches(img: jax.Array, anchor: jax.Array, S: int):
    """Gather [N,S,S] patches with top-left integer corners `anchor` [N,2]
    (x,y), border-replicated. ONE gather for all points — the only gather
    the tracker issues per (level, image)."""
    H, W = img.shape
    ar = jnp.arange(S, dtype=jnp.int32)
    ys = jnp.clip(anchor[:, 1, None, None] + ar[None, :, None], 0, H - 1)
    xs = jnp.clip(anchor[:, 0, None, None] + ar[None, None, :], 0, W - 1)
    return img[ys, xs]


def _shift_sample(P: jax.Array, iy, ix, fy, fx, win: int):
    """Sample [N,win,win] windows from patches P [N,S,S] translated by an
    integer offset (iy, ix) [N] plus a fractional (fy, fx) [N]: a vmapped
    contiguous dynamic_slice + a separable 2-tap filter — no gathers."""
    def slice_one(p, y0, x0):
        return jax.lax.dynamic_slice(p, (y0, x0), (win + 1, win + 1))

    Pw = jax.vmap(slice_one)(P, iy, ix)                       # [N,w+1,w+1]
    fx_ = fx[:, None, None]
    fy_ = fy[:, None, None]
    Px = (1.0 - fx_) * Pw[:, :, :-1] + fx_ * Pw[:, :, 1:]
    return (1.0 - fy_) * Px[:, :-1, :] + fy_ * Px[:, 1:, :]  # [N,win,win]


def _extract_patches_mm(img: jax.Array, anchor: jax.Array, S: int):
    """[N,S,S] patches as SELECTION-MATRIX MATMULS — the gather-free TPU
    form of `_extract_patches`: P[n] = Ry[n] · img · Rx[n]ᵀ where Ry/Rx are
    one-hot row/column selectors (border-replicated via index clipping).
    Converts a 228k-element random gather into two MXU contractions
    (measured: the gather LK is 14.6 ms/frame on a v5 chip; the matmul
    form 1.87 ms — results/r4/tracker_tpu_v3.json)."""
    H, W = img.shape
    ar = jnp.arange(S, dtype=jnp.int32)
    ys = jnp.clip(anchor[:, 1, None] + ar[None, :], 0, H - 1)   # [N,S]
    xs = jnp.clip(anchor[:, 0, None] + ar[None, :], 0, W - 1)
    Ry = (ys[..., None] == jnp.arange(H, dtype=jnp.int32)).astype(img.dtype)
    Rx = (xs[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(img.dtype)
    tmp = jnp.einsum("nih,hw->niw", Ry, img,
                     preferred_element_type=img.dtype)
    return jnp.einsum("niw,njw->nij", tmp, Rx,
                      preferred_element_type=img.dtype)


def _shift_sample_mm(P: jax.Array, iy, ix, fy, fx, win: int):
    """Gather-free `_shift_sample`: the per-feature dynamic_slice becomes a
    pair of one-hot selection matmuls over the (small) patch axes — the
    same trick as `_extract_patches_mm`, sized [N,win+1,S]."""
    S = P.shape[-1]
    ar = jnp.arange(win + 1, dtype=jnp.int32)
    sv = jnp.arange(S, dtype=jnp.int32)
    Sy = ((iy[:, None] + ar)[..., None] == sv).astype(P.dtype)  # [N,w+1,S]
    Sx = ((ix[:, None] + ar)[..., None] == sv).astype(P.dtype)
    Pw = jnp.einsum("nis,nst->nit", Sy, P,
                    preferred_element_type=P.dtype)
    Pw = jnp.einsum("nit,njt->nij", Pw, Sx,
                    preferred_element_type=P.dtype)              # [N,w+1,w+1]
    fx_ = fx[:, None, None]
    fy_ = fy[:, None, None]
    Px = (1.0 - fx_) * Pw[:, :, :-1] + fx_ * Pw[:, :, 1:]
    return (1.0 - fy_) * Px[:, :-1, :] + fy_ * Px[:, 1:, :]


def _sample_window_mm(img: jax.Array, pts: jax.Array, half: int):
    """Bilinear [N,2h+1,2h+1] windows centered at float `pts` — the
    matmul-form counterpart of the vmapped `_bilinear` residual check."""
    p0 = jnp.floor(pts)
    f = pts - p0
    P = _extract_patches_mm(img, p0.astype(jnp.int32)
                            - jnp.int32(half), 2 * half + 2)
    fx_ = f[:, 0, None, None]
    fy_ = f[:, 1, None, None]
    Px = (1.0 - fx_) * P[:, :, :-1] + fx_ * P[:, :, 1:]
    return (1.0 - fy_) * Px[:, :-1, :] + fy_ * Px[:, 1:, :]


@functools.partial(jax.jit, static_argnames=("half", "iters", "levels",
                                             "pad", "impl"))
def lk_track(prev_pyr: tuple, cur_pyr: tuple, pts: jax.Array,
             valid: jax.Array, half: int = 7, iters: int = 10,
             levels: int = 3, pad: int = 8, impl: str = None):
    """Pyramidal Lucas-Kanade: track `pts` [N,2] from prev to cur.

    Mirrors cv::calcOpticalFlowPyrLK usage (feature_tracker.cpp:54-60,
    winsize 15x15 ⇒ half=7, 3 levels). Returns (new_pts [N,2], ok [N]).

    TPU-shaped (round-3 rewrite): the original per-point `_bilinear`
    formulation issued ~1M scattered gathers per frame and measured
    64 ms/frame on the chip (results/r3/tracker_tpu.json). Here each level
    extracts ONE local patch per image per point (two big gathers), the
    template/gradients come from static slices + a separable 2-tap
    fractional filter, and every GN iteration samples the moving window
    with a contiguous dynamic_slice + the same 2-tap filter — elementwise
    VPU work. `pad` bounds the per-level search excursion (flow beyond it
    clamps and fails the residual check, like leaving cv's pyramid basin).

    impl: "gather" (patch gathers + per-feature dynamic_slice — the CPU
    form) | "matmul" (one-hot selection matmuls, `_extract_patches_mm` /
    `_shift_sample_mm` — identical arithmetic, zero gathers: per-element
    gathers serialize on TPU vector memory; measured 14.6 → 1.9 ms/frame,
    results/r4/tracker_tpu_v3.json). None picks by backend at trace time.
    Parity: tests/test_frontend.py.
    """
    if impl is None:
        impl = "gather" if jax.default_backend() == "cpu" else "matmul"
    extract = _extract_patches if impl == "gather" else _extract_patches_mm
    shift = _shift_sample if impl == "gather" else _shift_sample_mm
    N = pts.shape[0]
    dtype = pts.dtype
    win = 2 * half + 1

    def track_level(flow, level):
        scale = 2.0 ** level
        prev_img = prev_pyr[level]
        cur_img = cur_pyr[level]
        p_lvl = pts / scale
        p0 = jnp.floor(p_lvl)
        f = p_lvl - p0                                # [N,2] in [0,1)
        p0i = p0.astype(jnp.int32)

        # template + gradients from ONE prev-patch gather
        Sp = win + 4                                  # ±(half+1) + bilinear
        Pp = extract(prev_img, p0i - (half + 1), Sp)
        fx_ = f[:, 0, None, None]
        fy_ = f[:, 1, None, None]
        Px = (1.0 - fx_) * Pp[:, :, :-1] + fx_ * Pp[:, :, 1:]
        Pxy = (1.0 - fy_) * Px[:, :-1, :] + fy_ * Px[:, 1:, :]  # [N,Sp-1,Sp-1]
        T = Pxy[:, 1:1 + win, 1:1 + win]
        gx = 0.5 * (Pxy[:, 1:1 + win, 2:2 + win]
                    - Pxy[:, 1:1 + win, 0:win])
        gy = 0.5 * (Pxy[:, 2:2 + win, 1:1 + win]
                    - Pxy[:, 0:win, 1:1 + win])
        # 2×2 normal matrix, closed-form inverse
        gxx = jnp.sum(gx * gx, (-2, -1)) + 1e-6
        gyy = jnp.sum(gy * gy, (-2, -1)) + 1e-6
        gxy = jnp.sum(gx * gy, (-2, -1))
        det = gxx * gyy - gxy * gxy

        # cur-patch gather with excursion margin
        Sc = win + 2 * pad + 1
        Pc = extract(cur_img, p0i - (half + pad), Sc)

        def it(fl, _):
            t = f + fl                                # total frac+int shift
            ti = jnp.floor(t)
            tf = t - ti
            iy = jnp.clip(ti[:, 1].astype(jnp.int32) + pad, 0, 2 * pad)
            ix = jnp.clip(ti[:, 0].astype(jnp.int32) + pad, 0, 2 * pad)
            I = shift(Pc, iy, ix, tf[:, 1], tf[:, 0], win)
            err = I - T
            bx = jnp.sum(gx * err, (-2, -1))
            by = jnp.sum(gy * err, (-2, -1))
            dx = -(gyy * bx - gxy * by) / det
            dy = -(gxx * by - gxy * bx) / det
            return fl + jnp.stack([dx, dy], -1), None

        fl, _ = jax.lax.scan(it, flow, None, length=iters)
        return fl

    flow = jnp.zeros((N, 2), dtype)
    for level in range(levels - 1, -1, -1):
        flow = track_level(flow, level)
        if level > 0:
            flow = flow * 2.0  # upsample flow to the next finer level
    new_pts = pts + flow

    # validity: in-border (BORDER=1 px like :68-73 BORDER_SIZE) + residual check
    H, W = cur_pyr[0].shape
    inb = (new_pts[:, 0] > 2) & (new_pts[:, 0] < W - 3) & \
        (new_pts[:, 1] > 2) & (new_pts[:, 1] < H - 3)
    if impl == "gather":
        offs = jnp.stack(jnp.meshgrid(
            jnp.arange(-half, half + 1, dtype=dtype),
            jnp.arange(-half, half + 1, dtype=dtype), indexing="xy"),
            axis=-1).reshape(-1, 2)                       # [P,2]
        patch_prev = jax.vmap(
            lambda p: _bilinear(prev_pyr[0], p[None, :] + offs))(pts)
        patch_cur = jax.vmap(
            lambda p: _bilinear(cur_pyr[0], p[None, :] + offs))(new_pts)
        resid = jnp.mean(jnp.abs(patch_cur - patch_prev), axis=(-1,))
    else:
        patch_prev = _sample_window_mm(prev_pyr[0], pts, half)
        patch_cur = _sample_window_mm(cur_pyr[0], new_pts, half)
        resid = jnp.mean(jnp.abs(patch_cur - patch_prev), axis=(-2, -1))
    ok = inb & (resid < 0.25) & (valid > 0)
    return new_pts, ok


# ----------------------------------------------------------------------------
# Tracker orchestration (anticipation::FeatureTracker parity)
# ----------------------------------------------------------------------------


class TrackerParams(NamedTuple):
    max_features: int = 150       # Parameters struct (feature_tracker.h:31-41)
    min_dist: int = 16
    ransac_thresh: float = 1.0    # px (F_THRESHOLD)
    equalize: bool = True
    levels: int = 3


class FeatureTracker:
    """Host wrapper: persistent ids/lifetimes over jitted image kernels.

    process(img, t) → {id: (normalized pt3, velocity2, prob)} — the same
    measurement dict the ROS node publishes as PointCloud channels
    [id,u,v,vx,vy,prob] (feature_tracker_ros.cpp:75-115).
    """

    def __init__(self, cam: cameras.PinholeCamera,
                 params: TrackerParams = TrackerParams()):
        self.cam = cam
        self.p = params
        self.prev_pyr = None
        self.prev_pts = np.zeros((0, 2))
        self.ids = np.zeros(0, np.int64)
        self.life = np.zeros(0, np.int64)
        self.scores = np.zeros(0)
        self.next_id = 0
        self.prev_t = None
        self.prev_norm = {}

    def process(self, img: np.ndarray, t: float) -> dict:
        p = self.p
        img = jnp.asarray(img, jnp.float32)
        if p.equalize:
            # tiled CLAHE, clipLimit 3.0, 8×8 (feature_tracker.cpp:36-40)
            img = clahe(img)
        pyr = tuple(build_pyramid(img, p.levels))

        N = p.max_features
        if self.prev_pyr is not None and len(self.prev_pts):
            pts = np.zeros((N, 2), np.float32)
            val = np.zeros(N, np.float32)
            n = len(self.prev_pts)
            pts[:n] = self.prev_pts
            val[:n] = 1.0
            new_pts, ok = lk_track(self.prev_pyr, pyr, jnp.asarray(pts),
                                   jnp.asarray(val), levels=p.levels)
            new_pts = np.asarray(new_pts)[:n]
            ok = np.asarray(ok)[:n]
            # RANSAC on normalized coords (rejectWithF, :263-296)
            if ok.sum() >= 15:
                from anticipated_vins_mono_tpu.models.initialization import (
                    relative_pose_ransac)
                n1 = np.asarray(cameras.lift_projective(
                    self.cam, jnp.asarray(self.prev_pts[ok])))[:, :2]
                n2 = np.asarray(cameras.lift_projective(
                    self.cam, jnp.asarray(new_pts[ok])))[:, :2]
                got = relative_pose_ransac(
                    n1, n2, thresh=p.ransac_thresh / float(self.cam.fx))
                if got is not None:
                    sub = np.zeros(int(ok.sum()), bool)
                    sub[got[2]] = True
                    full = np.zeros(len(ok), bool)
                    full[np.nonzero(ok)[0]] = sub
                    ok = full
            self.prev_pts = new_pts[ok]
            self.ids = self.ids[ok]
            self.life = self.life[ok] + 1
            self.scores = self.scores[ok]
        # top-up detection in unoccupied regions
        budget = p.max_features - len(self.prev_pts)
        if budget > 0:
            occ = np.zeros(pyr[0].shape, np.float32)
            r = p.min_dist // 2
            Himg, Wimg = occ.shape
            for (x, y) in self.prev_pts:
                x0, y0 = int(x), int(y)
                occ[max(0, y0 - r):y0 + r, max(0, x0 - r):x0 + r] = 1.0
            uv, score, valid = detect_features(
                pyr[0], jnp.asarray(occ), p.max_features, p.min_dist)
            uv, score, valid = (np.asarray(uv), np.asarray(score),
                                np.asarray(valid))
            take = np.nonzero(valid)[0][:budget]
            self.prev_pts = np.concatenate([self.prev_pts, uv[take]], 0)
            self.ids = np.concatenate(
                [self.ids, self.next_id + np.arange(len(take))])
            self.life = np.concatenate([self.life, np.ones(len(take), np.int64)])
            self.scores = np.concatenate([self.scores, score[take]])
            self.next_id += len(take)

        self.prev_pyr = pyr
        # measurements: undistort → normalized plane + velocity + prob
        out = {}
        if len(self.prev_pts):
            rays = np.asarray(cameras.lift_projective(
                self.cam, jnp.asarray(self.prev_pts)))
            smax = max(self.scores.max(), 1e-9)
            dt = (t - self.prev_t) if self.prev_t is not None else None
            for k, fid in enumerate(self.ids):
                vel = np.zeros(2)
                if dt and fid in self.prev_norm:
                    vel = (rays[k, :2] - self.prev_norm[fid]) / dt
                out[int(fid)] = (rays[k], vel, float(self.scores[k] / smax))
            self.prev_norm = {int(f): rays[k, :2].copy()
                              for k, f in enumerate(self.ids)}
        self.prev_t = t
        return out
