"""Dense line-segment detection (LSD-equivalent) as a fixed-shape array
program.

The reference vendors a multi-octave wrapper around cv::LineSegmentDetector
(3rdparty/line_descriptor/src/LSDDetector_custom.cpp:218-324) whose core is
sequential region-growing over a pseudo-ordered gradient list — inherently
data-dependent and hostile to XLA.  This module reformulates detection as a
dense pipeline with static shapes (SURVEY.md §7 "hard parts #1"):

  1. level-line field: 2x2 gradients, line angle = atan2(gx, -gy), magnitude
     threshold rho = quant / sin(ang_th)  (LSD's own threshold rule);
  2. for each of D discrete directions: the aligned-pixel mask is *sheared*
     so that direction becomes the row axis (one gather per direction), runs
     of aligned pixels are found with cumulative-max prefix scans, and the
     longest runs become segment candidates (top-k per direction);
  3. candidates are refined by a weighted least-squares line fit over
     gradient-magnitude-weighted perpendicular centroids sampled along the
     segment (the dense analogue of LSD's rectangle refinement) — this
     recovers sub-bin angular accuracy, which the VO residual
     (point-to-infinite-line) depends on;
  4. collinear fragments are merged and near-duplicate detections from
     adjacent direction bins suppressed with O(K^2) masked pairwise logic;
  5. final segments are ranked by response (aligned length x density) and
     returned as fixed-capacity arrays with validity masks.

Angle convention matches KeyLine.angle = atan2(dy, dx) of the endpoints
(LSDDetector_custom.cpp:266-308).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops.image import gaussian_blur


class LineSegments(NamedTuple):
    sp: jnp.ndarray       # [K, 2] start point (x, y)
    ep: jnp.ndarray       # [K, 2] end point (x, y)
    angle: jnp.ndarray    # [K] atan2(dy, dx)
    length: jnp.ndarray   # [K]
    resp: jnp.ndarray     # [K] response (aligned support length)
    valid: jnp.ndarray    # [K] bool


def _topk(x: jnp.ndarray, k: int):
    """top-k that uses the TPU-optimized approximate kernel when available."""
    if jax.default_backend() == "tpu" and x.dtype == jnp.float32:
        return jax.lax.approx_max_k(x, k)
    return jax.lax.top_k(x, k)


def level_line_field(img: jnp.ndarray):
    """LSD 2x2 block gradient at pixel corners.

    Returns (angle, mag): angle of the *level line* (edge direction,
    perpendicular to the gradient) in [-pi/2, pi/2), and gradient magnitude.
    """
    # I[y, x] grid; gradient of the 2x2 block at (y, x)
    d_down = img[1:, :-1] - img[:-1, :-1] + img[1:, 1:] - img[:-1, 1:]
    d_right = img[:-1, 1:] - img[:-1, :-1] + img[1:, 1:] - img[1:, :-1]
    gy = 0.5 * d_down
    gx = 0.5 * d_right
    gy = jnp.pad(gy, ((0, 1), (0, 1)))
    gx = jnp.pad(gx, ((0, 1), (0, 1)))
    mag = jnp.sqrt(gx * gx + gy * gy)
    # level line direction: perpendicular to (gx, gy) -> (-gy, gx); angle of
    # that direction folded into [-pi/2, pi/2)
    ang = jnp.arctan2(gx, -gy)  # LSD convention
    return ang, mag


def _angle_dist_mod_pi(a: jnp.ndarray, b: float) -> jnp.ndarray:
    """Distance between undirected line angles (mod pi)."""
    d = jnp.abs(a - b) % jnp.pi
    return jnp.minimum(d, jnp.pi - d)


def _runs_along_rows(mask: jnp.ndarray, weight: jnp.ndarray):
    """Maximal runs of True along each row.

    Returns (is_end [R, C] bool, run_len [R, C] int32, run_weight [R, C])
    where entries are meaningful at run-end positions.
    """
    R, C = mask.shape
    idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    # last index with ~mask at or before x (-1 if none)
    brk = jnp.where(~mask, idx, -1)
    last_break = jax.lax.associative_scan(jnp.maximum, brk, axis=1)
    run_len = jnp.where(mask, idx - last_break, 0)
    # run end: mask & (next is ~mask or last column)
    nxt = jnp.concatenate([mask[:, 1:], jnp.zeros((R, 1), bool)], axis=1)
    is_end = mask & ~nxt
    # accumulated weight since run start via prefix sums
    csum = jnp.cumsum(weight * mask.astype(weight.dtype), axis=1)
    start = last_break  # index of the break before the run
    base = jnp.where(start >= 0,
                     jnp.take_along_axis(csum, jnp.maximum(start, 0), axis=1),
                     0.0)
    run_weight = csum - base
    return is_end, run_len, run_weight


def _close1(mask: jnp.ndarray) -> jnp.ndarray:
    """1-D binary closing along rows (fills single-pixel gaps)."""
    left = jnp.concatenate([mask[:, :1], mask[:, :-1]], axis=1)
    right = jnp.concatenate([mask[:, 1:], mask[:, -1:]], axis=1)
    dil = mask | left | right
    dl = jnp.concatenate([dil[:, :1], dil[:, :-1]], axis=1)
    dr = jnp.concatenate([dil[:, 1:], dil[:, -1:]], axis=1)
    return dil & dl & dr


def _dilate_rows(mask: jnp.ndarray, r: int) -> jnp.ndarray:
    """Dilate along axis 0 (across rows) by radius r."""
    out = mask
    for k in range(1, r + 1):
        up = jnp.pad(mask[k:], ((0, k), (0, 0)))
        dn = jnp.pad(mask[:-k], ((k, 0), (0, 0)))
        out = out | up | dn
    return out


def _detect_one_direction(aligned: jnp.ndarray, weight: jnp.ndarray,
                          tan_t: float, k_per_dir: int, min_len: float):
    """Shear so lines at slope tan_t become horizontal; extract longest runs.

    aligned/weight: [H, W].  Returns (xs, ys, xe, ye, length, support) arrays
    of shape [k_per_dir] in *unsheared* (x, y) coordinates, plus valid mask.
    """
    H, W = aligned.shape
    # shear: S[r, x] = A[r - off + shift(x), x], shift(x) = round(x * tan_t)
    x = jnp.arange(W, dtype=jnp.int32)
    shift = jnp.round(jnp.arange(W, dtype=jnp.float32) * tan_t).astype(jnp.int32)
    max_shift = int(math.ceil(W * abs(tan_t)))
    off = max_shift if tan_t < 0 else 0
    R = H + max_shift
    r = jnp.arange(R, dtype=jnp.int32)
    ysrc = r[:, None] - off + shift[None, :]
    inb = (ysrc >= 0) & (ysrc < H)
    ysrc_c = jnp.clip(ysrc, 0, H - 1)
    S = aligned[ysrc_c, x[None, :]] & inb
    Wt = jnp.where(inb, weight[ysrc_c, x[None, :]], 0.0)

    # tolerate sub-bin slope drift: thicken across rows, close 1-px gaps
    S = _dilate_rows(S, 1)
    S = _close1(S)

    is_end, run_len, run_w = _runs_along_rows(S, Wt)
    # length along the true direction is run_len / cos(theta)
    inv_cos = math.sqrt(1.0 + tan_t * tan_t)
    true_len = run_len.astype(jnp.float32) * inv_cos
    score = jnp.where(is_end & (true_len >= min_len), true_len, 0.0)
    top, pos = _topk(score.reshape(-1), k_per_dir)
    rr = (pos // W).astype(jnp.int32)
    xe = (pos % W).astype(jnp.int32)
    ln = jnp.take(run_len.reshape(-1), pos)
    sup = jnp.take(run_w.reshape(-1), pos)
    xs = jnp.maximum(xe - ln + 1, 0)
    ys = (rr - off + jnp.take(shift, xs)).astype(jnp.float32)
    ye = (rr - off + jnp.take(shift, xe)).astype(jnp.float32)
    valid = top > 0
    return (xs.astype(jnp.float32), ys, xe.astype(jnp.float32), ye,
            top, sup, valid)


def _refine_segments(ang_field, mag, xs, ys, xe, ye, valid,
                     tol: float, n_samples: int = 24, search: int = 2):
    """Weighted least-squares refit of each candidate segment.

    Samples n_samples points along the segment; at each, computes the
    gradient-magnitude-weighted perpendicular centroid of aligned pixels
    within +/-search px; fits a line (PCA) through the corrected points; and
    projects the endpoints onto it.  Also returns the aligned-pixel density
    for LSD's density_th validation.
    """
    H, W = mag.shape
    K = xs.shape[0]
    sp = jnp.stack([xs, ys], axis=-1)
    ep = jnp.stack([xe, ye], axis=-1)
    d = ep - sp
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
    u = d / length[:, None]                       # along dir [K, 2]
    n = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)   # normal [K, 2]
    seg_ang = jnp.arctan2(d[:, 1], d[:, 0])

    t = jnp.linspace(0.0, 1.0, n_samples)[None, :, None]
    base = sp[:, None, :] + d[:, None, :] * t     # [K, S, 2]
    offs = jnp.arange(-search, search + 1, dtype=jnp.float32)
    pts = base[:, :, None, :] + n[:, None, None, :] * offs[None, None, :, None]
    px = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    m = mag[py, px]                               # [K, S, O]
    a = ang_field[py, px]
    align = _angle_dist_mod_pi(a, 0.0)  # placeholder, computed per-seg below
    # alignment with THIS segment's direction (undirected)
    dist = jnp.abs(a[..., None] * 0)  # shape helper (unused)
    da = jnp.abs(a - seg_ang[:, None, None]) % jnp.pi
    da = jnp.minimum(da, jnp.pi - da)
    w = jnp.where(da < tol, m, 0.0)               # [K, S, O]
    wsum = jnp.sum(w, axis=-1)
    delta = jnp.sum(w * offs[None, None, :], axis=-1) / jnp.maximum(wsum, 1e-6)
    good = wsum > 1e-6                            # sample supported at all
    corrected = base + delta[..., None] * n[:, None, :]

    # weighted PCA line fit over corrected points
    wgt = jnp.where(good, wsum, 0.0)
    wtot = jnp.maximum(jnp.sum(wgt, axis=1), 1e-6)
    mean = jnp.sum(corrected * wgt[..., None], axis=1) / wtot[:, None]
    c = corrected - mean[:, None, :]
    cov_xx = jnp.sum(wgt * c[..., 0] * c[..., 0], axis=1)
    cov_xy = jnp.sum(wgt * c[..., 0] * c[..., 1], axis=1)
    cov_yy = jnp.sum(wgt * c[..., 1] * c[..., 1], axis=1)
    # principal eigenvector of [[xx, xy], [xy, yy]]
    theta_fit = 0.5 * jnp.arctan2(2.0 * cov_xy, cov_xx - cov_yy)
    u_fit = jnp.stack([jnp.cos(theta_fit), jnp.sin(theta_fit)], axis=-1)
    # keep orientation consistent with the candidate direction
    flip = jnp.sum(u_fit * u, axis=-1) < 0
    u_fit = jnp.where(flip[:, None], -u_fit, u_fit)

    # project endpoints on the fitted line
    sp_r = mean + u_fit * jnp.sum((sp - mean) * u_fit, axis=-1, keepdims=True)
    ep_r = mean + u_fit * jnp.sum((ep - mean) * u_fit, axis=-1, keepdims=True)

    density = jnp.mean(good.astype(jnp.float32), axis=1)
    ok = valid & (density > 0.0)
    # fall back to raw endpoints when the fit degenerates
    degen = ~jnp.isfinite(theta_fit) | (wtot <= 1e-5)
    sp_r = jnp.where(degen[:, None], sp, sp_r)
    ep_r = jnp.where(degen[:, None], ep, ep_r)
    return sp_r, ep_r, density, ok


def _merge_collinear(sp, ep, length, valid, ang_tol: float,
                     perp_tol: float, gap_tol: float, n_rounds: int = 2):
    """Absorb collinear fragments into their longest member.

    For every pair (i, j) with j shorter: if directions agree (mod pi), j's
    endpoints lie within perp_tol of i's infinite line, and the longitudinal
    gap between the segments is < gap_tol, extend i to cover j and mark j
    consumed.
    """
    K = sp.shape[0]

    def one_round(state):
        sp, ep, length, valid = state
        d = ep - sp
        L = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
        u = d / L[:, None]
        ang = jnp.arctan2(d[:, 1], d[:, 0])

        da = jnp.abs(ang[:, None] - ang[None, :]) % jnp.pi
        da = jnp.minimum(da, jnp.pi - da)
        ang_ok = da < ang_tol

        # perpendicular distances of j's endpoints to i's line
        n = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)  # [K, 2]
        rel_s = sp[None, :, :] - sp[:, None, :]      # [i, j, 2]
        rel_e = ep[None, :, :] - sp[:, None, :]
        perp_s = jnp.abs(jnp.einsum("ijc,ic->ij", rel_s, n))
        perp_e = jnp.abs(jnp.einsum("ijc,ic->ij", rel_e, n))
        perp_ok = (perp_s < perp_tol) & (perp_e < perp_tol)

        # longitudinal projections onto i's axis
        t_s = jnp.einsum("ijc,ic->ij", rel_s, u)
        t_e = jnp.einsum("ijc,ic->ij", rel_e, u)
        lo = jnp.minimum(t_s, t_e)
        hi = jnp.maximum(t_s, t_e)
        gap = jnp.maximum(lo - L[:, None], -hi)      # >0 => disjoint by gap
        gap_ok = gap < gap_tol

        both = valid[:, None] & valid[None, :]
        ii = jnp.eye(K, dtype=bool)
        # absorb only strictly-shorter j (ties by index to stay symmetric-free)
        shorter = (L[None, :] < L[:, None]) | (
            (L[None, :] == L[:, None])
            & (jnp.arange(K)[None, :] > jnp.arange(K)[:, None]))
        absorb = both & ~ii & ang_ok & perp_ok & gap_ok & shorter

        # extend i to the extremes of everything it absorbs
        lo_all = jnp.where(absorb, lo, jnp.inf).min(axis=1)
        hi_all = jnp.where(absorb, hi, -jnp.inf).max(axis=1)
        new_lo = jnp.minimum(0.0, lo_all)
        new_hi = jnp.maximum(L, hi_all)
        sp_new = sp + u * new_lo[:, None]
        ep_new = sp + u * new_hi[:, None]
        consumed = jnp.any(absorb, axis=0)
        valid_new = valid & ~consumed
        L_new = jnp.linalg.norm(ep_new - sp_new, axis=-1)
        return sp_new, ep_new, jnp.where(valid_new, L_new, 0.0), valid_new

    state = (sp, ep, length, valid)
    for _ in range(n_rounds):
        state = one_round(state)
    return state


def _suppress_duplicates(sp, ep, resp, valid, perp_tol: float,
                         overlap_tol: float):
    """Kill near-duplicate segments from adjacent direction bins: if j lies
    on i's line (both endpoints within perp_tol) and overlaps i
    longitudinally by > overlap_tol of its own length, the weaker dies."""
    K = sp.shape[0]
    d = ep - sp
    L = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
    u = d / L[:, None]
    n = jnp.stack([-u[:, 1], u[:, 0]], axis=-1)
    rel_s = sp[None, :, :] - sp[:, None, :]
    rel_e = ep[None, :, :] - sp[:, None, :]
    perp_s = jnp.abs(jnp.einsum("ijc,ic->ij", rel_s, n))
    perp_e = jnp.abs(jnp.einsum("ijc,ic->ij", rel_e, n))
    on_line = (perp_s < perp_tol) & (perp_e < perp_tol)
    t_s = jnp.einsum("ijc,ic->ij", rel_s, u)
    t_e = jnp.einsum("ijc,ic->ij", rel_e, u)
    lo = jnp.minimum(t_s, t_e)
    hi = jnp.maximum(t_s, t_e)
    ov = jnp.minimum(hi, L[:, None]) - jnp.maximum(lo, 0.0)
    ov_frac = ov / jnp.maximum(hi - lo, 1e-6)
    dup = on_line & (ov_frac > overlap_tol)
    both = valid[:, None] & valid[None, :]
    stronger = (resp[:, None] > resp[None, :]) | (
        (resp[:, None] == resp[None, :])
        & (jnp.arange(K)[:, None] < jnp.arange(K)[None, :]))
    killed = jnp.any(dup & both & stronger & ~jnp.eye(K, dtype=bool), axis=0)
    return valid & ~killed


@functools.partial(jax.jit, static_argnames=(
    "capacity", "n_dirs", "k_per_dir", "ang_th_deg", "quant", "density_th",
    "sigma"))
def detect_line_segments(
    img: jnp.ndarray,
    min_length: float,
    capacity: int = 300,
    n_dirs: int = 16,
    k_per_dir: int = 64,
    ang_th_deg: float = 22.5,
    quant: float = 2.0,
    density_th: float = 0.6,
    sigma: float = 0.8,
) -> LineSegments:
    """Full dense line-segment detection on one grayscale image [H, W].

    min_length may be a traced scalar (reference: llength_th =
    min_line_length * min(W, H), src/stereoFrameHandler.cpp:39).
    """
    H, W = img.shape
    tol = math.radians(ang_th_deg)
    rho = quant / math.sin(tol)

    smoothed = gaussian_blur(img, sigma)
    ang, mag = level_line_field(smoothed)

    cands = []
    for dmir in range(n_dirs):
        theta = math.pi * dmir / n_dirs          # line direction in [0, pi)
        aligned = (_angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
        near_vertical = (math.pi / 4) < theta < (3 * math.pi / 4)
        if not near_vertical:
            tan_t = math.tan(theta)
            xs, ys, xe, ye, ln, sup, v = _detect_one_direction(
                aligned, mag, tan_t, k_per_dir, min_length)
        else:
            # transpose: x' = y, y' = x; direction angle' = pi/2 - theta
            tan_t = math.tan(math.pi / 2 - theta)
            ys, xs, ye, xe, ln, sup, v = _detect_one_direction(
                aligned.T, mag.T, tan_t, k_per_dir, min_length)
        cands.append((xs, ys, xe, ye, ln, sup, v))

    xs, ys, xe, ye, ln, sup, v = (jnp.concatenate(t) for t in zip(*cands))

    sp, ep, density, v = _refine_segments(ang, mag, xs, ys, xe, ye, v, tol)
    length = jnp.linalg.norm(ep - sp, axis=-1)
    v = v & (length >= min_length) & (density >= density_th)

    sp, ep, length, v = _merge_collinear(
        sp, ep, length, v, ang_tol=tol * 0.5, perp_tol=2.5, gap_tol=6.0)
    resp = jnp.where(v, length, 0.0)
    v = _suppress_duplicates(sp, ep, resp, v, perp_tol=2.5, overlap_tol=0.5)

    # clamp to image bounds and final top-capacity by response
    sp = jnp.clip(sp, jnp.zeros(2), jnp.asarray([W - 1.0, H - 1.0]))
    ep = jnp.clip(ep, jnp.zeros(2), jnp.asarray([W - 1.0, H - 1.0]))
    length = jnp.linalg.norm(ep - sp, axis=-1)
    resp = jnp.where(v & (length >= min_length), length, 0.0)
    top, pos = jax.lax.top_k(resp, capacity)
    take = lambda a: jnp.take(a, pos, axis=0)
    sp_o, ep_o = take(sp), take(ep)
    dvec = ep_o - sp_o
    return LineSegments(
        sp=sp_o, ep=ep_o,
        angle=jnp.arctan2(dvec[:, 1], dvec[:, 0]),
        length=take(length),
        resp=top,
        valid=top > 0,
    )
