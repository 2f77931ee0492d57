"""Intrinsic camera calibration tooling (L1) — chessboard to intrinsics.

Capability parity with the reference's calibration surface
(/root/reference/camera_model/src/intrinsic_calib.cc:1-247 — the
`Chessboard` detector, `CameraCalibration::addChessboardData` +
`calibrate()`; chessboard detection in
camera_model/src/chessboard/Chessboard.cc), redesigned TPU-first:

- chessboard **rendering** and **corner detection** are single jitted
  programs (separable Gaussian + Hessian saddle response + NMS — image-wide
  convolutions instead of OpenCV's region-growing heuristics);
- the nonlinear refinement is ONE branchless Levenberg-Marquardt program:
  all views' reprojection residuals are evaluated batched by `vmap`, the
  full Jacobian [2·V·N, 8+6V] comes from `jacfwd` through the *same*
  `cameras.space_to_plane` code the runtime uses (the reference maintains
  hand-written Jacobians per model, e.g. PinholeCamera.cc:552), and the
  normal equations are one MXU matmul;
- the closed-form bootstrap is Zhang's method (homography constraints →
  K), mirroring CameraCalibration's per-model `estimateIntrinsics`.

Any camera model in ops.cameras can be refined — the parameter adapter
below maps a flat vector into the model's NamedTuple, so the LM program is
model-polymorphic at trace time (the reference needs a Ceres cost functor
per model).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from anticipated_vins_mono_tpu.ops import cameras, lie


# ---------------------------------------------------------------------------
# Board geometry + synthetic imagery
# ---------------------------------------------------------------------------


def board_points(nx: int, ny: int, square: float) -> np.ndarray:
    """Inner-corner lattice [ny*nx, 3] (z=0), row-major — the `objectPoints`
    the reference builds in CameraCalibration::addChessboardData."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny))
    return np.stack([xs.ravel() * square, ys.ravel() * square,
                     np.zeros(nx * ny)], axis=-1)


def render_chessboard(cam, R_cb: jax.Array, t_cb: jax.Array,
                      nx: int, ny: int, square: float,
                      ss: int = 2) -> jax.Array:
    """Render the chessboard through the (distorted) camera model.

    R_cb, t_cb: board→camera transform (X_cam = R X_board + t). The board's
    squares span [-square, nx·square] × [-square, ny·square] so the nx×ny
    INNER corners sit at (i·square, j·square). `ss`×`ss` supersampling
    antialiases the edges (the detector's subpixel accuracy depends on it).
    Rendering goes through `lift_projective` — the same fixed-point
    undistortion the runtime uses — so the imagery carries the model's true
    distortion field.
    """
    return _render_chessboard(cam, R_cb, t_cb, nx, ny, square, ss,
                              int(cam.height), int(cam.width))


@functools.partial(jax.jit, static_argnames=("nx", "ny", "ss", "H", "W"))
def _render_chessboard(cam, R_cb, t_cb, nx, ny, square, ss, H, W):
    jj, ii = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    offs = (jnp.arange(ss) + 0.5) / ss - 0.5
    ou, ov = jnp.meshgrid(offs, offs, indexing="ij")
    uv = jnp.stack([ii[None, None] + ou[:, :, None, None],
                    jj[None, None] + ov[:, :, None, None]], axis=-1)
    rays = cameras.lift_projective(cam, uv.astype(jnp.float32))  # [ss,ss,H,W,3]
    # camera center + ray directions in board frame
    C_b = -R_cb.T @ t_cb
    d_b = jnp.einsum("ab,...b->...a", R_cb.T, rays)
    s = -C_b[2] / jnp.where(jnp.abs(d_b[..., 2]) < 1e-9, 1e-9, d_b[..., 2])
    pt = C_b[None, None, None, None] + s[..., None] * d_b
    x, y = pt[..., 0] / square, pt[..., 1] / square
    # checker occupies [-1, nx]×[-1, ny]: interior crossings land EXACTLY on
    # the nx×ny inner corners. A white quiet border (real boards have one)
    # keeps the outer black/white junctions from reading as saddle points.
    in_checker = ((x >= -1.0) & (x <= nx) & (y >= -1.0) & (y <= ny))
    in_border = ((x >= -2.5) & (x <= nx + 1.5)
                 & (y >= -2.5) & (y <= ny + 1.5))
    checker = (jnp.floor(x) + jnp.floor(y)) % 2.0
    shade = jnp.where(in_checker, jnp.where(checker > 0.5, 0.95, 0.08), 0.95)
    img = jnp.where((s > 0) & in_border, shade, 0.55)
    return img.mean(axis=(0, 1))                       # [H,W] in [0,1]


# ---------------------------------------------------------------------------
# Corner detection (saddle points of the checker pattern)
# ---------------------------------------------------------------------------


def _gauss_kernel(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("n_corners",))
def _saddle_response(img: jax.Array, n_corners: int):
    """Hessian-determinant saddle response + 5×5 NMS + top-k subpixel peaks.

    Chessboard inner corners are saddle points of the intensity surface:
    det(Hessian) = Ixx·Iyy − Ixy² is strongly NEGATIVE there (and positive
    at blob-like extrema), so the response is −det. One fused program:
    separable Gaussian → finite-difference Hessian → NMS → top-k → 3×3
    quadratic subpixel fit. (The reference's Chessboard.cc uses OpenCV's
    region-growing detector — heuristic and sequential; this is two convs
    and a reduction.)
    """
    k = _gauss_kernel(1.5, 4)

    def conv_sep(a):
        pad = 4
        ap = jnp.pad(a, pad, mode="edge")                      # [H+8, W+8]
        ar = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(ap)
        ac = jax.vmap(lambda col: jnp.correlate(col, k, mode="valid"),
                      in_axes=1, out_axes=1)(ar)               # [H, W]
        return ac

    f = conv_sep(img.astype(jnp.float32))
    fx = 0.5 * (jnp.roll(f, -1, 1) - jnp.roll(f, 1, 1))
    fy = 0.5 * (jnp.roll(f, -1, 0) - jnp.roll(f, 1, 0))
    fxx = jnp.roll(f, -1, 1) - 2 * f + jnp.roll(f, 1, 1)
    fyy = jnp.roll(f, -1, 0) - 2 * f + jnp.roll(f, 1, 0)
    fxy = 0.5 * (jnp.roll(fx, -1, 0) - jnp.roll(fx, 1, 0))
    resp = -(fxx * fyy - fxy * fxy)
    resp = jnp.where(resp > 0, resp, 0.0)

    # 5×5 NMS via max-pool comparison. Supersampled renders can produce
    # EXACT response ties on adjacent pixels (two "peaks" of one corner): a
    # tiny index-keyed perturbation (≤1e-6 relative) makes every plateau's
    # argmax unique without reordering genuinely distinct peaks.
    H, W = resp.shape
    tie = (jnp.arange(H * W, dtype=resp.dtype).reshape(H, W)
           / (H * W)) * (resp.max() * 1e-6)
    keyed = resp + tie
    mx = jax.lax.reduce_window(keyed, -jnp.inf, jax.lax.max,
                               (5, 5), (1, 1), "SAME")
    is_peak = (keyed >= mx) & (resp > 0)
    # suppress the border (rolling wraps + padding artifacts)
    border = 8
    mask = jnp.zeros_like(resp, bool).at[border:-border, border:-border].set(True)
    score = jnp.where(is_peak & mask, resp, 0.0)

    vals, idx = jax.lax.top_k(score.reshape(-1), n_corners)
    py, px = idx // W, idx % W

    # subpixel: quadratic fit on the response in the 3×3 neighborhood
    def subpix(cy, cx):
        nb = jax.lax.dynamic_slice(resp, (cy - 1, cx - 1), (3, 3))
        gx = 0.5 * (nb[1, 2] - nb[1, 0])
        gy = 0.5 * (nb[2, 1] - nb[0, 1])
        hxx = nb[1, 2] - 2 * nb[1, 1] + nb[1, 0]
        hyy = nb[2, 1] - 2 * nb[1, 1] + nb[0, 1]
        hxy = 0.25 * (nb[2, 2] - nb[2, 0] - nb[0, 2] + nb[0, 0])
        det = hxx * hyy - hxy * hxy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = -(hyy * gx - hxy * gy) / det
        dy = -(hxx * gy - hxy * gx) / det
        dx = jnp.clip(dx, -1.0, 1.0)
        dy = jnp.clip(dy, -1.0, 1.0)
        return jnp.stack([cx + dx, cy + dy])

    uv = jax.vmap(subpix)(py, px)
    return uv, vals


def _order_grid(uv: np.ndarray, nx: int, ny: int) -> Optional[np.ndarray]:
    """Order detected corners into the row-major nx×ny lattice.

    Lattice direction from the histogram of nearest-neighbor angles
    (mod 180°); rows split on the ny−1 largest gaps of the rotated
    y-coordinate; each row sorted by rotated x. Returns [ny*nx, 2] or None
    if the grid structure isn't recovered (caller should drop the view —
    the reference's Chessboard::findChessboardCorners also reports failure).
    """
    if len(uv) != nx * ny:
        return None
    d2 = ((uv[:, None] - uv[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = d2.argmin(1)
    vec = uv[nn] - uv
    ang = np.arctan2(vec[:, 1], vec[:, 0])
    # lattice orientation mod 90°: NN directions cluster at two ORTHOGONAL
    # angles, which cancel under a doubled-angle mean — fold by 4θ instead
    th = 0.25 * np.arctan2(np.sin(4 * ang).sum(), np.cos(4 * ang).sum())

    def attempt(th):
        R = np.array([[np.cos(-th), -np.sin(-th)],
                      [np.sin(-th), np.cos(-th)]])
        r = uv @ R.T
        order = np.argsort(r[:, 1], kind="stable")
        ys = r[order, 1]
        gaps = np.diff(ys)
        if ny > 1:
            splits = np.sort(np.argsort(gaps)[::-1][: ny - 1]) + 1
        else:
            splits = np.array([], int)
        rows = np.split(order, splits)
        if any(len(row) != nx for row in rows):
            return None
        out = []
        for row in rows:
            out.append(row[np.argsort(r[row, 0], kind="stable")])
        return uv[np.concatenate(out)]

    for cand in (th, th + np.pi / 2):
        got = attempt(cand)
        if got is not None:
            return got
    return None


def detect_chessboard(img, nx: int, ny: int) -> Optional[np.ndarray]:
    """Detect + order the nx×ny inner corners; [ny*nx, 2] pixels or None."""
    uv, vals = _saddle_response(jnp.asarray(img, jnp.float32), nx * ny)
    uv = np.asarray(uv)
    if float(np.asarray(vals)[-1]) <= 0:
        return None
    return _order_grid(uv, nx, ny)


# ---------------------------------------------------------------------------
# Zhang closed-form initialization
# ---------------------------------------------------------------------------


def _homography_dlt(xy: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Normalized DLT board-plane → pixels homography (f64 host math — the
    bootstrap is tiny; the refinement is the jitted TPU program)."""
    def norm_T(p):
        m, sd = p.mean(0), p.std(0).mean() + 1e-12
        T = np.array([[1 / sd, 0, -m[0] / sd],
                      [0, 1 / sd, -m[1] / sd], [0, 0, 1.0]])
        ph = np.concatenate([p, np.ones((len(p), 1))], 1) @ T.T
        return T, ph
    Ta, a = norm_T(xy[:, :2])
    Tb, b = norm_T(uv)
    rows = []
    for (x, y, _), (u, v, _) in zip(a, b):
        rows.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        rows.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    _, _, Vt = np.linalg.svd(np.asarray(rows))
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Tb) @ Hn @ Ta
    return H / H[2, 2]


def zhang_intrinsics(Hs: Sequence[np.ndarray], width: int, height: int):
    """Closed-form K from ≥3 homographies (Zhang 2000, §3.1; zero skew).

    The reference's per-model `estimateIntrinsics` plays the same role
    (PinholeCamera.cc — estimate f from vanishing constraints). Falls back
    to a centered 1.2·W focal guess if the constraint system is degenerate.
    """
    def v_ij(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j]])
    V = []
    for H in Hs:
        V.append(v_ij(H, 0, 1))
        V.append(v_ij(H, 0, 0) - v_ij(H, 1, 1))
    _, _, Vt = np.linalg.svd(np.asarray(V))
    b0, b1, b2, b3, b4, b5 = Vt[-1]
    fallback = (1.2 * width, 1.2 * width, width / 2.0, height / 2.0)
    denom = b0 * b2 - b1 * b1
    if abs(denom) < 1e-18 or abs(b0) < 1e-18:
        return fallback
    v0 = (b1 * b3 - b0 * b4) / denom
    lam = b5 - (b3 * b3 + v0 * (b1 * b3 - b0 * b4)) / b0
    alpha2, beta2 = lam / b0, lam * b0 / denom
    if not (np.isfinite(alpha2) and np.isfinite(beta2)
            and alpha2 > 0 and beta2 > 0):
        return fallback
    fx, fy = np.sqrt(alpha2), np.sqrt(beta2)
    u0 = -b3 * alpha2 / lam
    if not (0 < u0 < width and 0 < v0 < height
            and 0.2 * width < fx < 5 * width):
        return fallback
    return float(fx), float(fy), float(u0), float(v0)


def _extrinsics_from_H(K: np.ndarray, H: np.ndarray):
    """r1,r2 = λK⁻¹h1,2; R orthonormalized by SVD; t = λK⁻¹h3."""
    A = np.linalg.inv(K) @ H
    lam = 1.0 / (np.linalg.norm(A[:, 0]) + 1e-12)
    r1, r2, t = lam * A[:, 0], lam * A[:, 1], lam * A[:, 2]
    if t[2] < 0:                      # board must be in front of the camera
        r1, r2, t = -r1, -r2, -t
    Rm = np.stack([r1, r2, np.cross(r1, r2)], axis=1)
    U, _, Vt = np.linalg.svd(Rm)
    R = U @ np.diag([1, 1, np.linalg.det(U @ Vt)]) @ Vt
    return R, t


# ---------------------------------------------------------------------------
# Batched LM refinement (model-polymorphic)
# ---------------------------------------------------------------------------

_PARAM_FIELDS = {
    cameras.PinholeCamera: ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2"),
    cameras.EquidistantCamera: ("mu", "mv", "u0", "v0",
                                "k2", "k3", "k4", "k5"),
    cameras.MeiCamera: ("xi", "fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2"),
}


def camera_to_vector(cam) -> np.ndarray:
    return np.array([float(getattr(cam, f))
                     for f in _PARAM_FIELDS[type(cam)]])


def vector_to_camera(template, theta):
    fields = _PARAM_FIELDS[type(template)]
    return template._replace(**{f: theta[i] for i, f in enumerate(fields)})


@functools.partial(jax.jit, static_argnames=("tmpl_def", "iters"))
def _lm_refine(theta0: jax.Array, rvecs0: jax.Array, tvecs0: jax.Array,
               X: jax.Array, obs: jax.Array, tmpl_def, iters: int = 30):
    """Branchless LM over [P + 6V] parameters; residuals [V,N,2] batched.

    tmpl_def: (camera class, width, height) — static, rebuilt at trace time.
    The per-iteration work is jacfwd through space_to_plane (the MXU-batched
    analog of Ceres' autodiff cost blocks in intrinsic_calib) + one [M,D]ᵀ
    [M,D] matmul + one Cholesky.
    """
    cls, width, height = tmpl_def
    V = rvecs0.shape[0]
    P = theta0.shape[0]
    dtype = theta0.dtype
    template = vector_to_camera(
        cls.create(*np.zeros(P), width=width, height=height, dtype=dtype),
        theta0)  # only for structure; values replaced per-eval

    def unpack(z):
        cam = vector_to_camera(template, z[:P])
        rv = z[P:P + 3 * V].reshape(V, 3)
        tv = z[P + 3 * V:].reshape(V, 3)
        return cam, rv, tv

    def residual(z):
        cam, rv, tv = unpack(z)
        Rm = jax.vmap(lambda r: lie.quat_to_rot(lie.exp_so3_quat(r)))(rv)
        Xc = jnp.einsum("vab,nb->vna", Rm, X) + tv[:, None]
        pred = cameras.space_to_plane(cam, Xc)
        return (pred - obs).reshape(-1)

    z0 = jnp.concatenate([theta0, rvecs0.reshape(-1), tvecs0.reshape(-1)])

    def body(_, carry):
        z, lam, cost = carry
        r = residual(z)
        J = jax.jacfwd(residual)(z)
        Hm = J.T @ J
        g = J.T @ r
        damp = lam * jnp.maximum(jnp.diagonal(Hm), 1e-8)
        dscale = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(Hm) + damp, 1e-20))
        A = (Hm + jnp.diag(damp)) * dscale[:, None] * dscale[None, :]
        L = jnp.linalg.cholesky(A)
        dz = -dscale * jax.scipy.linalg.cho_solve((L, True), g * dscale)
        cand = z + dz
        new_cost = 0.5 * jnp.sum(residual(cand) ** 2)
        ok = new_cost < cost
        okf = ok.astype(dtype)
        z_next = okf * cand + (1 - okf) * z
        lam_next = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        return z_next, lam_next, jnp.where(ok, new_cost, cost)

    cost0 = 0.5 * jnp.sum(residual(z0) ** 2)
    z, lam, cost = jax.lax.fori_loop(
        0, iters, body, (z0, jnp.asarray(1e-3, dtype), cost0))
    return z, cost


class CalibrationResult(NamedTuple):
    camera: object
    rvecs: np.ndarray          # [V,3] board→camera rotation vectors
    tvecs: np.ndarray          # [V,3]
    rms_px: float              # reprojection RMS over all corners
    n_views: int


def calibrate_camera(detections: Sequence[np.ndarray], board: np.ndarray,
                     template, iters: int = 30) -> CalibrationResult:
    """Full intrinsic calibration: Zhang bootstrap + jitted LM refinement.

    detections: per-view ordered corner pixels [N,2] (from
    `detect_chessboard` or any source); board: [N,3] lattice (z=0);
    template: a camera instance of the target model class carrying
    width/height + dtype (parameter values ignored).

    Parity: CameraCalibration::calibrate (intrinsic_calib.cc drives it at
    :229-238) — init via homographies, refine all views jointly.
    """
    V = len(detections)
    assert V >= 3, "need ≥3 views"
    xy = board[:, :2]
    Hs = [_homography_dlt(xy, d) for d in detections]
    fx, fy, cx, cy = zhang_intrinsics(Hs, template.width, template.height)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    rvecs, tvecs = [], []
    for H in Hs:
        R, t = _extrinsics_from_H(K, H)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
        rv = np.asarray(lie.log_so3(jnp.asarray(q)))
        rvecs.append(rv)
        tvecs.append(t)

    dtype = jnp.asarray(template.fx if hasattr(template, "fx")
                        else template.mu).dtype
    theta0 = camera_to_vector(template).astype(np.float64)
    fields = _PARAM_FIELDS[type(template)]
    init_map = dict(fx=fx, fy=fy, cx=cx, cy=cy, mu=fx, mv=fy, u0=cx, v0=cy,
                    xi=1.0)
    theta0 = np.array([init_map.get(f, 0.0) for f in fields])

    z, cost = _lm_refine(
        jnp.asarray(theta0, dtype), jnp.asarray(np.stack(rvecs), dtype),
        jnp.asarray(np.stack(tvecs), dtype),
        jnp.asarray(board, dtype),
        jnp.asarray(np.stack(detections), dtype),
        (type(template), template.width, template.height), iters)
    z = np.asarray(z)
    P = len(fields)
    cam = vector_to_camera(template, jnp.asarray(z[:P], dtype))
    rv = z[P:P + 3 * V].reshape(V, 3)
    tv = z[P + 3 * V:].reshape(V, 3)
    n = sum(len(d) for d in detections)
    rms = float(np.sqrt(2.0 * float(cost) / n))
    return CalibrationResult(cam, rv, tv, rms, V)


def calibrate_from_images(images: Sequence[np.ndarray], nx: int, ny: int,
                          square: float, template,
                          iters: int = 30) -> Optional[CalibrationResult]:
    """Image-in calibration driver (`intrinsic_calib.cc` main flow: detect
    on every frame, drop failures, calibrate on the survivors)."""
    board = board_points(nx, ny, square)
    dets = []
    for img in images:
        d = detect_chessboard(img, nx, ny)
        if d is not None:
            dets.append(d)
    if len(dets) < 3:
        return None
    return calibrate_camera(dets, board, template, iters=iters)
