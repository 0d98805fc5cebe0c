"""EDLine-style line-segment detector (Edge Drawing), TPU-shaped.

Rebuilds the capability of the reference's vendored EDLineDetector
(3rdparty/line_descriptor/src/binary_descriptor_custom.cpp:1398-2728:
anchor extraction -> edge chaining -> least-squares fit -> validation) as
dense, fixed-capacity array passes — no sequential pixel walking:

  1. Sobel gradient, magnitude + continuous orientation;
  2. directional non-maximum suppression (Canny-style 4-sector thinning)
     + gradient threshold  -> edge/anchor mask
     (EdgeDrawing's anchor test, :1442);
  3. edge chaining -> orientation-gated connected labeling: every edge
     pixel carries the min flat-index of its component; labels converge
     by alternating masked 8-neighbor min-propagation with pointer
     jumping (L <- L[L]), log-depth instead of a pixel walk;
  4. curvature-break splitting (the dense analogue of EDLine's
     walk-and-refit in LeastSquaresLineFit_ :2484-2643): components that
     fail the straightness gate are cut at their maximum-deviation pixel
     (Douglas-Peucker step) and relabeled; `split_rounds` recursions turn
     one curved contour into up to 2^rounds straight pieces whose break
     points sit at geometric corners — rotation-stable endpoints;
  5. per-component moments by scatter-add (count, Sx, Sy, Sxx, Syy, Sxy),
     top-K components by support -> fixed-capacity segments;
  6. least-squares line fit from the moments (principal axis of the
     point covariance, LeastSquaresLineFit_ :2484), endpoints from the
     exact extent of the support projected on the fitted axis
     (scatter-min/max of the axis parameter — tighter than bbox corners);
  7. validation (LineValidation_ :2645 in spirit): minimum support,
     minimum length, straightness (minor/major eigenvalue ratio) and
     density gates.

The continuous gradient orientation makes chains rotation-equivariant —
no direction quantization anywhere — which is exactly where the dense
n_dirs run detector loses repeatability (EVAL.md §2).  Selectable via
``use_edlines`` with the edline_* VOConfig knobs (a TPU-native addition;
the reference never reaches its EDLine from StVO).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops.image import sobel
from stvo_pl_tpu.ops.lsd import LineSegments


def _shift(a, dy, dx, fill):
    """Shift a [H, W] array; out-of-range filled."""
    out = jnp.roll(a, (dy, dx), axis=(0, 1))
    H, W = a.shape
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _ang_diff_mod_pi(a, b):
    d = jnp.abs(a - b) % jnp.pi
    return jnp.minimum(d, jnp.pi - d)


def _label(edge, connect_extra, n_rounds, flat, BIG, H, W):
    """Masked neighbor min-label propagation with pointer jumping.

    connect_extra: {(dy, dx): [H, W] bool} — the neighbor offsets to
    connect through (8-neighborhood, plus distance-2 bridges when gap
    tolerance is on) with the per-direction connection gate (orientation
    similarity, same-side, ...).
    """
    L = jnp.where(edge, flat, BIG)

    def nbr_min(L):
        best = L
        for (dy, dx), gate in connect_extra.items():
            Ln = _shift(L, dy, dx, BIG)
            ok = edge & (Ln < BIG) & gate
            best = jnp.minimum(best, jnp.where(ok, Ln, BIG))
        return best

    def body(L, _):
        L = nbr_min(L)
        # pointer jump: follow the label one hop (L is a flat index)
        Lj = jnp.where(L < BIG, L, 0)
        L2 = L.reshape(-1)[Lj.reshape(-1)].reshape(H, W)
        L = jnp.where(L < BIG, jnp.minimum(L, L2), BIG)
        return L, None

    L, _ = jax.lax.scan(body, L, None, length=n_rounds)
    return L


def _moments(L, edge, xx, yy, P, BIG):
    """Per-component first/second moments by scatter-add -> [P] arrays."""
    lf = jnp.where(edge, L, BIG).reshape(-1)
    xf = jnp.broadcast_to(xx.astype(jnp.float32), L.shape).reshape(-1)
    yf = jnp.broadcast_to(yy.astype(jnp.float32), L.shape).reshape(-1)
    idx = jnp.where(lf < BIG, lf, 0)
    live = lf < BIG

    def scat(vals):
        return jnp.zeros((P,), jnp.float32).at[idx].add(
            jnp.where(live, vals, 0.0))

    return {"cnt": scat(jnp.ones_like(xf)), "sx": scat(xf), "sy": scat(yf),
            "sxx": scat(xf * xf), "syy": scat(yf * yf),
            "sxy": scat(xf * yf)}, idx, live, xf, yf


def _fit(m):
    """Principal-axis fit from moment arrays -> per-root fit arrays."""
    n = jnp.maximum(m["cnt"], 1.0)
    mx = m["sx"] / n
    my = m["sy"] / n
    cxx = m["sxx"] / n - mx * mx
    cyy = m["syy"] / n - my * my
    cxy = m["sxy"] / n - mx * my
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    lam1 = tr / 2.0 + disc                       # major
    lam2 = jnp.maximum(tr / 2.0 - disc, 0.0)     # minor
    # cxy ~ 0: the axis is one of the coordinate axes (pick the larger
    # variance; the old `1.0` fallback mis-oriented exactly-vertical lines)
    dx_dir = jnp.where(jnp.abs(cxy) > 1e-9, lam1 - cyy,
                       jnp.where(cxx >= cyy, 1.0, 0.0))
    dy_dir = jnp.where(jnp.abs(cxy) > 1e-9, cxy,
                       jnp.where(cxx >= cyy, 0.0, 1.0))
    norm = jnp.sqrt(dx_dir ** 2 + dy_dir ** 2)
    return {"mx": mx, "my": my, "ux": dx_dir / jnp.maximum(norm, 1e-9),
            "uy": dy_dir / jnp.maximum(norm, 1e-9),
            "lam1": lam1, "lam2": lam2}


# split-point packing: 11 bits quantized residual (1/8 px up to 255 px)
# above 19 bits quantized axis parameter (1/4 px, |t| < 2^16) — max word
# 2047 * 2^19 + 2^19 - 1 = 1.07e9 < 2^31, int32-safe for scatter-max.
_T_BITS = 19
_T_HALF = 1 << (_T_BITS - 1)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "n_rounds", "min_support",
                                    "split_rounds", "bridge_gaps", "thin",
                                    "smooth_sigma"))
def detect_edlines(img: jnp.ndarray, min_length: jnp.ndarray,
                   capacity: int = 300, grad_th: float = 20.0,
                   anchor_th: float = 8.0, ang_tol_deg: float = 20.0,
                   min_support: int = 10, straight_tol: float = 0.1,
                   density_th: float = 0.4,
                   n_rounds: int = 12,
                   split_rounds: int = 2,
                   hyst_ratio: float = 0.5,
                   bridge_gaps: bool = False,
                   thin: bool = True,
                   smooth_sigma: float = 1.0) -> LineSegments:
    """Detect line segments; returns fixed-capacity LineSegments.

    grad_th/anchor_th follow EDLine's gradiantThreshold/anchorThreshold
    semantics (descriptor_custom.hpp EDLineParam); n_rounds bounds the
    chaining diameter at ~2^n_rounds pixels; split_rounds recursively cuts
    non-straight components at their max-deviation pixel (0 disables).

    Repeatability hardening (under resampling/rotation, chains would
    otherwise fragment differently — measured 40% of rot-15 segments had
    no counterpart at all): `hyst_ratio` chains NMS survivors down to
    hyst_ratio*grad_th (Canny-style hysteresis; the per-chain anchor test
    still demands a pixel above grad_th+anchor_th), and `bridge_gaps`
    additionally connects over single-pixel chain gaps (distance-2
    neighbors), like EDLine's directional walk that steps over one weak
    pixel.
    """
    H, W = img.shape
    P = H * W
    BIG = jnp.int32(P)

    # Gaussian pre-smoothing, like the reference EDLine (GaussianBlur
    # before gradients, binary_descriptor_custom.cpp EDLine setup) and
    # cv2 LSD's scaled Gaussian: on hard-edged (non-antialiased) strokes
    # the raw-staircase Sobel orientation wobbles > 20 deg pixel-to-pixel
    # and the tight chaining gate would fragment perfect lines.
    if smooth_sigma > 0:
        from stvo_pl_tpu.ops.image import gaussian_blur
        img = gaussian_blur(img, smooth_sigma, radius=2)
    gx, gy = sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx) % jnp.pi          # gradient orientation

    # --- 2. directional NMS (4 sectors of the gradient direction) ------
    sector = jnp.round(theta / (jnp.pi / 4.0)).astype(jnp.int32) % 4
    # neighbor offsets ALONG the gradient (across the edge)
    nbr = [((0, 1), (0, -1)),     # sector 0: gradient ~ 0 deg (horizontal)
           ((1, 1), (-1, -1)),    # sector 1: gradient ~ 45 deg
           ((1, 0), (-1, 0)),     # sector 2: gradient ~ 90 deg (vertical)
           ((1, -1), (-1, 1))]    # sector 3: gradient ~ 135 deg
    # deterministic tie-break: synthetic strokes produce EXACTLY equal
    # magnitudes on both stroke edges; a tiny position-dependent epsilon
    # keeps one survivor per plateau instead of erasing both
    yy0 = jnp.arange(H)[:, None]
    xx0 = jnp.arange(W)[None, :]
    # scale: neighbor eps gaps must survive f32 rounding at mag ~O(100)
    # (adjacent columns differ by 1e-4, adjacent rows by W*1e-4); only
    # NEIGHBOR pairs are ever compared, so the bias stays < ~0.25 mag
    mag_e = mag + (yy0 * W + xx0).astype(jnp.float32) * 1e-4
    keep = jnp.zeros((H, W), bool)
    for s, ((dy1, dx1), (dy2, dx2)) in enumerate(nbr):
        m1 = _shift(mag_e, -dy1, -dx1, 0.0)
        m2 = _shift(mag_e, -dy2, -dx2, 0.0)
        k = (mag_e > m1) & (mag_e > m2)
        keep = jnp.where(sector == s, k, keep)
    # hysteresis: thin everywhere, keep chains down to hyst_ratio*grad_th
    # (the anchor gate below still requires a strong pixel per chain);
    # thin=False keeps the full aligned-support region (LSD-style)
    edge = keep if thin else jnp.ones_like(keep)
    edge = edge & (mag > hyst_ratio * grad_th)
    # border guard (Sobel halo)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    edge = edge & (yy > 1) & (yy < H - 2) & (xx > 1) & (xx < W - 2)

    # --- 3. orientation-gated connected labeling -----------------------
    offsets = list(_N8)
    if bridge_gaps:
        offsets += [(2 * dy, 2 * dx) for dy, dx in _N8]
    flat = (yy * W + xx).astype(jnp.int32)
    tol = jnp.deg2rad(ang_tol_deg)
    tangent = (theta + jnp.pi / 2.0) % jnp.pi
    ori_gate = {}
    for dy, dx in offsets:
        thn = _shift(theta, dy, dx, 1e3)
        g = _ang_diff_mod_pi(theta, thn) < tol
        if max(abs(dy), abs(dx)) > 1:
            # distance-2 bridge: only continue ALONG the chain (offset
            # parallel to the edge tangent on both ends) — otherwise
            # parallel chains 2 px apart merge into non-straight blobs
            off_ang = jnp.arctan2(dy, dx) % jnp.pi
            btol = jnp.deg2rad(30.0)
            tgn = _shift(tangent, dy, dx, 1e3)
            g = (g & (_ang_diff_mod_pi(tangent, off_ang) < btol)
                 & (_ang_diff_mod_pi(tgn, off_ang) < btol))
        ori_gate[(dy, dx)] = g
    L = _label(edge, ori_gate, n_rounds, flat, BIG, H, W)

    # --- 4. curvature-break splitting (Douglas-Peucker rounds) ---------
    side = jnp.zeros((H, W), jnp.int32)
    for _round in range(split_rounds):
        m, idx, live, xf, yf = _moments(L, edge, xx, yy, P, BIG)
        f = _fit(m)
        root = jnp.where(edge, L, 0).reshape(-1)
        mx = f["mx"][root]
        my = f["my"][root]
        ux = f["ux"][root]
        uy = f["uy"][root]
        t = (xf - mx) * ux + (yf - my) * uy
        res = jnp.abs(-(xf - mx) * uy + (yf - my) * ux)
        # which components split: fail straightness with enough support
        unstraight = (f["lam2"] > straight_tol * f["lam1"])
        do_split = (unstraight & (m["cnt"] >= 2 * min_support))[root] & live
        # per-component argmax-residual pixel's t, via packed scatter-max
        rq = jnp.clip((res * 8.0).astype(jnp.int32), 0, 2047)
        tq = jnp.clip((t * 4.0).astype(jnp.int32) + _T_HALF, 0,
                      (1 << _T_BITS) - 1)
        packed = jnp.where(do_split, (rq << _T_BITS) + tq, 0)
        best = jnp.zeros((P,), jnp.int32).at[idx].max(packed)
        t_split = ((best[root] & ((1 << _T_BITS) - 1)) - _T_HALF) \
            .astype(jnp.float32) * 0.25
        # side values only need to be distinct WITHIN a component (the
        # relabel gate already requires equal old roots), so +1 suffices
        side_f = side.reshape(-1)
        side = jnp.where(do_split & (t > t_split), side_f + 1,
                         side_f).reshape(H, W)
        # relabel: connect only same old component AND same side
        gate = {}
        for dy, dx in offsets:
            Ln = _shift(L, dy, dx, BIG)
            sn = _shift(side, dy, dx, -1)
            gate[(dy, dx)] = (Ln == L) & (sn == side)
        L = _label(edge, gate, n_rounds, flat, BIG, H, W)

    # --- 5. per-component moments of the final labels ------------------
    m, idx, live, xf, yf = _moments(L, edge, xx, yy, P, BIG)
    lf = jnp.where(edge, L, BIG).reshape(-1)

    def scat_reduce(vals, init, combine):
        z = jnp.full((P,), init, jnp.float32)
        v = jnp.where(live, vals, init)
        if combine == "min":
            return z.at[idx].min(v)
        return z.at[idx].max(v)

    cnt_all = m["cnt"]
    mmax = scat_reduce(mag.reshape(-1), 0.0, "max")  # anchor test: the chain
    #   must contain one prominent pixel (EDLine seeds chains at anchors only)
    smag = jnp.zeros((P,), jnp.float32).at[idx].add(
        jnp.where(live, mag.reshape(-1), 0.0))

    score = jnp.where(cnt_all >= min_support, cnt_all, 0.0)
    top, roots = jax.lax.top_k(score, capacity)

    def take(a):
        return a[roots]

    f = _fit(m)
    n = take(cnt_all)
    mx = take(f["mx"])
    my = take(f["my"])
    ux = take(f["ux"])
    uy = take(f["uy"])
    lam1 = take(f["lam1"])
    lam2 = take(f["lam2"])

    # --- 6. endpoints: exact extent of the support on the fitted axis --
    root = jnp.where(edge, L, 0).reshape(-1)
    t_pix = ((xf - f["mx"][root]) * f["ux"][root]
             + (yf - f["my"][root]) * f["uy"][root])
    t0 = take(scat_reduce(t_pix, 1e9, "min"))
    t1 = take(scat_reduce(t_pix, -1e9, "max"))
    sp = jnp.stack([mx + t0 * ux, my + t0 * uy], -1)
    ep = jnp.stack([mx + t1 * ux, my + t1 * uy], -1)
    length = t1 - t0

    # --- 7. validation -------------------------------------------------
    straight = lam2 / jnp.maximum(lam1, 1e-9)
    density = n / jnp.maximum(length, 1e-6)
    valid = ((n >= min_support)
             & (length >= min_length)
             & (straight < straight_tol)
             & (density > density_th)
             & (take(mmax) > grad_th + anchor_th)
             & (top > 0.0))

    angle = jnp.arctan2(ep[:, 1] - sp[:, 1], ep[:, 0] - sp[:, 0])
    resp = take(smag) * valid
    return LineSegments(sp=jnp.where(valid[:, None], sp, 0.0),
                        ep=jnp.where(valid[:, None], ep, 0.0),
                        angle=jnp.where(valid, angle, 0.0),
                        length=jnp.where(valid, length, 0.0),
                        resp=resp,
                        valid=valid)
