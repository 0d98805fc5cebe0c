"""Dense line-segment detection (LSD-equivalent) as a fixed-shape array
program.

The reference vendors a multi-octave wrapper around cv::LineSegmentDetector
(3rdparty/line_descriptor/src/LSDDetector_custom.cpp:218-324) whose core is
sequential region-growing over a pseudo-ordered gradient list — inherently
data-dependent and hostile to XLA.  This module reformulates detection as a
dense pipeline with static shapes (SURVEY.md §7 "hard parts #1"):

  1. level-line field: 2x2 gradients, line angle = atan2(gx, -gy), magnitude
     threshold rho = quant / sin(ang_th)  (LSD's own threshold rule);
  2. for each of D integer direction vectors: maximal runs of aligned
     pixels are found with pointer doubling over statically *shifted*
     copies of the mask (pure windowed copies — no gathers, no scans:
     log2(max_len) shift+select rounds), and the longest runs become
     segment candidates (tile-reduced top-k per direction);
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


def _shift2d(x: jnp.ndarray, dy: int, dx: int):
    """Shift with zero fill (x[p] <- x[p + (dy, dx)]), static offsets.

    Implemented as pad+slice so there is no wraparound to mask — unlike roll
    — and XLA lowers it to a plain windowed copy (no gather)."""
    H, W = x.shape
    if abs(dy) >= H or abs(dx) >= W:
        return jnp.zeros_like(x)
    ys, ye = max(dy, 0), H + min(dy, 0)
    xs, xe = max(dx, 0), W + min(dx, 0)
    core = x[ys:ye, xs:xe]
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    return jnp.pad(core, (pad_y, pad_x))


# primitive integer step vectors spanning 180 deg (dx, dy); runs advance in
# exact integer hops so every data movement is a static shift, never a gather
DIR_STEPS = [
    (1, 0), (4, 1), (2, 1), (4, 3), (1, 1), (3, 4), (1, 2), (1, 4),
    (0, 1), (-1, 4), (-1, 2), (-3, 4), (-1, 1), (-4, 3), (-2, 1), (-4, 1),
]


def _run_pack_xla(aligned: jnp.ndarray, step: tuple,
                  max_doublings: int = 8) -> jnp.ndarray:
    """Maximal aligned runs along an integer direction via pointer doubling.

    f[p] = number of consecutive aligned hops starting at p going +step,
    computed in log2 steps with shifted copies:
        f_{k+1}[p] = f_k[p] if f_k[p] < 2^k else f_k[p] + f_k[p + 2^k step]
    Run starts are `aligned & ~aligned[p - step]`.  Returns the packed map
    f*64 + (63 - tile_local_idx) at run starts (0 elsewhere), padded to 8x8
    tile multiples — identical encoding to the Pallas kernel in
    ops/lsd_kernel.py (XLA fallback for non-TPU backends).
    """
    dx, dy = step
    H, W = aligned.shape

    # tolerate sub-bin angular drift: thicken across the dominant
    # perpendicular axis, then close single-hop gaps along the direction
    if abs(dx) >= abs(dy):
        thick = aligned | _shift2d(aligned, 1, 0) | _shift2d(aligned, -1, 0)
    else:
        thick = aligned | _shift2d(aligned, 0, 1) | _shift2d(aligned, 0, -1)
    dil = thick | _shift2d(thick, dy, dx) | _shift2d(thick, -dy, -dx)
    a = dil & _shift2d(dil, dy, dx) & _shift2d(dil, -dy, -dx)
    a = a | thick

    f = a.astype(jnp.int32)
    for k in range(max_doublings):
        h = 1 << k
        fwd = _shift2d(f, dy * h, dx * h)
        f = jnp.where(f == h, f + fwd, f)

    is_start = a & ~_shift2d(a, -dy, -dx).astype(bool)
    yy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :]
    idx = (yy % 8) * 8 + (xx % 8)
    packed = jnp.where(is_start, f * 64 + (63 - idx), 0)
    Hp = -(-H // 8) * 8
    Wp = -(-W // 8) * 8
    return jnp.pad(packed, ((0, Hp - H), (0, Wp - W)))


def _candidates_from_packed(packed: jnp.ndarray, step: tuple,
                            k_per_dir: int, min_len, tile: int = 8):
    """Packed run map -> top-k run candidates.

    One 8x8 reduce_window max recovers both the per-tile best run and its
    in-tile position (the packing makes max == (argmax by f, then first
    position), matching the old reshape+argmax semantics).  The min_len
    threshold commutes with max/top-k (it only zeroes entries), so it is
    applied to the k survivors rather than the full map.
    """
    dx, dy = step
    Hp, Wp = packed.shape
    hop = math.hypot(dx, dy)

    pooled = jax.lax.reduce_window(packed, 0, jax.lax.max,
                                   (tile, tile), (tile, tile), "VALID")
    Wt = Wp // tile
    flat = pooled.reshape(-1)
    k = min(k_per_dir, flat.size)
    top, pos = jax.lax.top_k(flat, k)
    f = top // 64
    idx = 63 - (top % 64)
    ys = ((pos // Wt) * tile + idx // 8).astype(jnp.float32)
    xs = ((pos % Wt) * tile + idx % 8).astype(jnp.float32)
    hops = f.astype(jnp.float32)
    score = jnp.where(hops * hop >= min_len, hops * hop, 0.0)
    xe = xs + jnp.maximum(hops - 1.0, 0.0) * dx
    ye = ys + jnp.maximum(hops - 1.0, 0.0) * dy
    sup = score  # support proxy: metric length
    valid = score > 0
    return xs, ys, xe, ye, score, sup, valid


def _detect_one_direction(aligned: jnp.ndarray, weight: jnp.ndarray,
                          step: tuple, k_per_dir: int, min_len,
                          max_doublings: int = 8, tile: int = 8):
    """Run detection for one direction: Pallas kernel on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        from stvo_pl_tpu.ops.lsd_kernel import run_pack
        packed = run_pack(aligned, step[0], step[1], max_doublings)
    else:
        packed = _run_pack_xla(aligned, step, max_doublings)
    return _candidates_from_packed(packed, step, k_per_dir, min_len, tile)


def _candidates_from_packed_multi(packed: jnp.ndarray, steps, k_total: int,
                                  min_len, tile: int = 8):
    """All-direction metric-packed run maps -> one global top-k candidate set.

    packed is [D, Hp, Wp] from lsd_kernel.run_pack_multi: values
    (hops * hq_d) * 64 + (63 - tile_idx), hq_d = round(16 * hop_d), so a
    single top-k ranks candidates across directions by true pixel length
    (the per-direction quota of the one-direction path becomes a global
    quota — downstream pruning kept only ~k_total by length anyway)."""
    from stvo_pl_tpu.ops.lsd_kernel import _hop_q
    D, Ht, Wp = packed.shape        # rows already pooled 8x in the kernel
    pooled = jax.lax.reduce_window(packed, 0, jax.lax.max,
                                   (1, 1, tile), (1, 1, tile), "VALID")
    Wt = Wp // tile
    # ONE global metric-ranked pool across directions — measured round 5
    # as the RIGHT design and re-adopted after a falsified experiment:
    # per-direction quotas (k/D each, mirroring the CPU fallback path)
    # were tried against the textured-scene dense-path degradation and
    # (a) did not move it (0.1655 -> 0.1653), (b) HURT the octave
    # default (stamps 0.0419 -> 0.0458, textured60 0.0158 -> 0.1625 —
    # reserving canvas slots per direction starves the directions that
    # actually carry the scene's lines).  The true textured lever is the
    # right-eye pool (config.lsd_oct_pool_right).
    flat = pooled.reshape(-1)
    k = min(k_total, flat.size)
    # packed values < 2^24, exact in f32; TPU-native partial reduction
    # instead of a full sort (see ops/fast_kernel.select_from_packed)
    topf, pos = jax.lax.approx_max_k(flat.astype(jnp.float32), k,
                                     recall_target=0.95)
    top = topf.astype(jnp.int32)
    d = pos // (Ht * Wt)
    rem = pos % (Ht * Wt)
    fm = top // 64
    idx = 63 - (top % 64)
    ys = ((rem // Wt) * tile + idx // 8).astype(jnp.float32)
    xs = ((rem % Wt) * tile + idx % 8).astype(jnp.float32)
    hq = jnp.asarray([_hop_q(sx, sy) for sx, sy in steps], jnp.int32)[d]
    sx = jnp.asarray([s[0] for s in steps], jnp.float32)[d]
    sy = jnp.asarray([s[1] for s in steps], jnp.float32)[d]
    hops = (fm // hq).astype(jnp.float32)
    length = fm.astype(jnp.float32) * (1.0 / 16.0)
    score = jnp.where(length >= min_len, length, 0.0)
    xe = xs + jnp.maximum(hops - 1.0, 0.0) * sx
    ye = ys + jnp.maximum(hops - 1.0, 0.0) * sy
    return xs, ys, xe, ye, score, score, score > 0


def _refine_segments(ang_field, mag, xs, ys, xe, ye, valid,
                     tol: float, n_samples: int = 16, search: int = 2,
                     stride: int = 1):
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
    # full-density perpendicular taps: stride>1 halves the gather cost but
    # biases the weighted centroid enough to cost ~40% synthetic-bench ATE
    # (0.034 -> 0.049 measured) — keep stride 1
    offs = jnp.arange(-search, search + 1, stride, dtype=jnp.float32)
    pts = base[:, :, None, :] + n[:, None, None, :] * offs[None, None, :, None]
    px = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    # ONE channel-paired gather: two separate 2-D gathers of ang and mag
    # lower to a ~100 ns/element scalar path on TPU (measured 4.6 ms/step,
    # the dominant cost of the whole detector); pairing (ang, mag)
    # channel-last vectorizes the same lookups ~8x.  (Packing the pair as
    # bf16 in one u32 to halve the bytes measured SLOWER — XLA's vectorized
    # gather path keys on the trailing 2-channel layout.)
    field2 = jnp.stack([ang_field, mag], axis=-1)  # [H, W, 2]
    am = field2[py, px]                            # [K, S, O, 2]
    a = am[..., 0]
    m = am[..., 1]
    # alignment with THIS segment's direction (undirected)
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
    # per-tap aligned fraction across the whole sampled rectangle — the
    # alignment statistic the a-contrario (NFA) validation consumes
    align_frac = jnp.mean((w > 0).astype(jnp.float32), axis=(1, 2))
    ok = valid & (density > 0.0)
    # fall back to raw endpoints when the fit degenerates
    degen = ~jnp.isfinite(theta_fit) | (wtot <= 1e-5)
    sp_r = jnp.where(degen[:, None], sp, sp_r)
    ep_r = jnp.where(degen[:, None], ep, ep_r)
    return sp_r, ep_r, density, ok, align_frac


def nfa_neg_log10(length: jnp.ndarray, align_frac: jnp.ndarray,
                  H: int, W: int, tol: float, width: int) -> jnp.ndarray:
    """-log10(NFA) of each candidate under the a-contrario model.

    The reference's advanced-refinement path validates rectangles with the
    Helmholtz principle (cv::LSD NFA, also EDLine's LineValidation_,
    binary_descriptor_custom.cpp:2645): NFA = N_tests * P[B(n, k, p) >= k]
    with N_tests = (WH)^{5/2}, p = tol/pi, n rectangle pixels, k aligned
    pixels.  Dense reformulation: k/n is the sampled aligned fraction, and
    the binomial tail is bounded by the Chernoff/KL form
    log10 P <= -n * KL_10(r || p), exact enough for a detection threshold
    (the reference thresholds at log_eps = 1, i.e. one order of magnitude).

    p is the probability a uniformly-random undirected angle falls within
    +-tol of the line direction: 2*tol/pi (for tol = 22.5 deg, p = 0.25).
    """
    p = 2.0 * tol / math.pi
    r = jnp.clip(align_frac, 1e-4, 1.0 - 1e-4)
    n = jnp.maximum(jnp.round(length), 1.0) * width
    kl10 = (r * jnp.log10(r / p)
            + (1.0 - r) * jnp.log10((1.0 - r) / (1.0 - p)))
    tail = jnp.where(r > p, n * kl10, 0.0)
    n_tests = 2.5 * math.log10(float(H) * float(W))
    return tail - n_tests


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

        # perpendicular distances of j's endpoints to i's line (component
        # form: [i,j,2] einsums force relayout-heavy batched dots on TPU)
        nx, ny = -u[:, 1:2], u[:, 0:1]               # [K, 1] each
        rsx = sp[None, :, 0] - sp[:, None, 0]        # [i, j]
        rsy = sp[None, :, 1] - sp[:, None, 1]
        rex = ep[None, :, 0] - sp[:, None, 0]
        rey = ep[None, :, 1] - sp[:, None, 1]
        perp_s = jnp.abs(rsx * nx + rsy * ny)
        perp_e = jnp.abs(rex * nx + rey * ny)
        perp_ok = (perp_s < perp_tol) & (perp_e < perp_tol)

        # longitudinal projections onto i's axis
        ux, uy = u[:, 0:1], u[:, 1:2]
        t_s = rsx * ux + rsy * uy
        t_e = rex * ux + rey * uy
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
    nx, ny = -u[:, 1:2], u[:, 0:1]
    ux, uy = u[:, 0:1], u[:, 1:2]
    rsx = sp[None, :, 0] - sp[:, None, 0]
    rsy = sp[None, :, 1] - sp[:, None, 1]
    rex = ep[None, :, 0] - sp[:, None, 0]
    rey = ep[None, :, 1] - sp[:, None, 1]
    perp_s = jnp.abs(rsx * nx + rsy * ny)
    perp_e = jnp.abs(rex * nx + rey * ny)
    on_line = (perp_s < perp_tol) & (perp_e < perp_tol)
    t_s = rsx * ux + rsy * uy
    t_e = rex * ux + rey * uy
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
    "sigma", "refine", "log_eps", "refine_samples", "refine_search",
    "with_field", "k_total"))
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
    refine: bool = True,
    log_eps: float = -1.0,
    refine_samples: int = 16,
    refine_search: int = 2,
    valid_mask: jnp.ndarray | None = None,
    with_field: bool = False,
    k_total: int | None = None,
) -> LineSegments:
    """Full dense line-segment detection on one grayscale image [H, W].

    min_length may be a traced scalar (reference: llength_th =
    min_line_length * min(W, H), src/stereoFrameHandler.cpp:39).

    log_eps >= 0 adds the a-contrario NFA validation of the reference's
    advanced-refinement mode (lsd_refine >= 2: cv::LSD log_eps threshold /
    EDLine LineValidation_): keep a segment iff -log10(NFA) >= log_eps.
    The default -1 disables it, matching lsd_refine = 0 (src/config.cpp:105)
    where OpenCV ignores log_eps.

    valid_mask (optional [H, W] bool) restricts detection to True pixels —
    used by the one-pass multi-octave atlas (models/frame.py
    detect_lines_octaves) to exclude the guard gaps and region borders of
    the composed canvas.

    with_field=True additionally returns the (ang, mag) level-line field
    of the smoothed input, so callers can re-refine mapped-back segments
    against it without recomputing the blur (the octave path's level-0
    precision pass).
    """
    H, W = img.shape
    tol = math.radians(ang_th_deg)
    rho = quant / math.sin(tol)

    smoothed = gaussian_blur(img, sigma)
    ang, mag = level_line_field(smoothed)
    if valid_mask is not None:
        mag = jnp.where(valid_mask, mag, 0.0)

    if n_dirs >= len(DIR_STEPS):
        steps = DIR_STEPS
    else:
        # subsample evenly over the half-circle so every angle keeps a
        # nearby direction bin
        idx = np.round(np.linspace(0, len(DIR_STEPS), n_dirs,
                                   endpoint=False)).astype(int)
        steps = [DIR_STEPS[i] for i in idx]

    # raw-run candidate pool fed to the O(K^2) merges: wide enough that
    # the fragments of off-bin lines survive to be reassembled.  The
    # merge/dedup HBM traffic scales with k_total^2, so callers whose
    # capacity is NOT proportional to image content (the multi-octave
    # canvas: 1.5x capacity over only 1.31x pixels) pass their own.
    if k_total is None:
        k_total = max(2 * capacity, 256)
    if jax.default_backend() == "tpu":
        # ONE kernel launch for all directions: XLA packs the per-direction
        # alignment masks into an i32 bitmask image; the kernel keeps it
        # VMEM-resident across a (image, direction) grid
        from stvo_pl_tpu.ops.lsd_kernel import run_pack_multi
        bits = jnp.zeros(ang.shape, jnp.int32)
        for i, (dx, dy) in enumerate(steps):
            theta = math.atan2(dy, dx) % math.pi
            aligned = (_angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
            bits = bits | (aligned.astype(jnp.int32) << i)
        packed = run_pack_multi(bits, tuple(steps))
        xs, ys, xe, ye, ln, sup, v = _candidates_from_packed_multi(
            packed, steps, k_total, min_length)
        sp = jnp.stack([xs, ys], axis=-1)
        ep = jnp.stack([xe, ye], axis=-1)
        length = jnp.where(v, ln, 0.0)
    else:
        cands = []
        for (dx, dy) in steps:
            theta = math.atan2(dy, dx) % math.pi    # undirected line angle
            aligned = (_angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
            xs, ys, xe, ye, ln, sup, v = _detect_one_direction(
                aligned, mag, (dx, dy), k_per_dir, min_length)
            cands.append((xs, ys, xe, ye, ln, sup, v))

        xs, ys, xe, ye, ln, sup, v = (jnp.concatenate(t) for t in zip(*cands))
        sp = jnp.stack([xs, ys], axis=-1)
        ep = jnp.stack([xe, ye], axis=-1)
        length = jnp.where(v, ln, 0.0)

        # prune the candidate pool by raw run length before the O(K^2) merge
        # and the gather-heavy refinement: only ~capacity segments can
        # survive, so carrying every (k_per_dir x n_dirs) candidate through
        # those stages is wasted work
        K = length.shape[0]
        prune = min(K, k_total)
        if prune < K:
            _, keep = jax.lax.top_k(length, prune)
            take0 = lambda a: jnp.take(a, keep, axis=0)
            sp, ep, length, v = take0(sp), take0(ep), take0(length), take0(v)

    # merge collinear fragments on the raw integer-direction endpoints and
    # kill only HARD duplicates (off-bin lines fragment into perpendicular-
    # offset "staircase" runs that a loose duplicate filter would destroy —
    # they are pieces of one segment that only refinement can reassemble)
    sp, ep, length, v = _merge_collinear(
        sp, ep, length, v, ang_tol=tol * 0.5, perp_tol=2.5, gap_tol=6.0)
    resp = jnp.where(v, length, 0.0)
    v = _suppress_duplicates(sp, ep, resp, v, perp_tol=2.0, overlap_tol=0.8)
    resp = jnp.where(v & (length >= min_length), length, 0.0)

    # reduce to final capacity, then refine only the survivors
    top, pos = jax.lax.top_k(resp, capacity)
    take = lambda a: jnp.take(a, pos, axis=0)
    sp, ep, v = take(sp), take(ep), top > 0

    if refine:
        sp, ep, density, v, align_frac = _refine_segments(
            ang, mag, sp[:, 0], sp[:, 1], ep[:, 0], ep[:, 1], v, tol,
            n_samples=refine_samples, search=refine_search)
        v = v & (density >= density_th)
        if log_eps >= 0:
            nl10 = nfa_neg_log10(jnp.linalg.norm(ep - sp, axis=-1),
                                 align_frac, H, W, tol, width=5)
            v = v & (nl10 >= log_eps)
        # refined fragments of one off-bin line are now truly collinear:
        # merge them into full segments, then drop remaining duplicates
        length = jnp.linalg.norm(ep - sp, axis=-1)
        sp, ep, length, v = _merge_collinear(
            sp, ep, length, v, ang_tol=tol * 0.25, perp_tol=2.5, gap_tol=8.0)
        resp = jnp.where(v, length, 0.0)
        v = _suppress_duplicates(sp, ep, resp, v, perp_tol=4.0,
                                 overlap_tol=0.4)
    else:
        # FLD-like fast path (reference use_fld_lines,
        # src/stereoFrame.cpp:244-304): raw run endpoints, ranked by length
        resp = jnp.where(v, jnp.linalg.norm(ep - sp, axis=-1), 0.0)
        v = _suppress_duplicates(sp, ep, resp, v, perp_tol=4.0,
                                 overlap_tol=0.4)

    # clamp to image bounds, final filters, re-rank by (refined) length
    sp = jnp.clip(sp, jnp.zeros(2), jnp.asarray([W - 1.0, H - 1.0]))
    ep = jnp.clip(ep, jnp.zeros(2), jnp.asarray([W - 1.0, H - 1.0]))
    length = jnp.linalg.norm(ep - sp, axis=-1)
    resp = jnp.where(v & (length >= min_length), length, 0.0)
    top, pos = jax.lax.top_k(resp, capacity)
    take = lambda a: jnp.take(a, pos, axis=0)
    sp_o, ep_o = take(sp), take(ep)
    dvec = ep_o - sp_o
    segs = LineSegments(
        sp=sp_o, ep=ep_o,
        angle=jnp.arctan2(dvec[:, 1], dvec[:, 0]),
        length=take(length),
        resp=top,
        valid=top > 0,
    )
    if with_field:
        return segs, ang, mag
    return segs
