"""EDLine-style line-segment detector (Edge Drawing), TPU-shaped.

Rebuilds the capability of the reference's vendored EDLineDetector
(3rdparty/line_descriptor/src/binary_descriptor_custom.cpp:1398-2728:
anchor extraction -> edge chaining -> least-squares fit -> validation) as
dense, fixed-capacity array passes — no sequential pixel walking:

  1. Gaussian pre-smooth + Sobel gradient, magnitude + continuous
     orientation (the reference EDLine also smooths first; required by
     the tight chaining gate on hard-edged strokes);
  2. directional non-maximum suppression (Canny-style 4-sector thinning)
     + gradient threshold  -> edge/anchor mask
     (EdgeDrawing's anchor test, :1442);
  3. edge pixels are COMPACTED to a fixed-capacity node list (top-k over
     the edge mask) — every subsequent gather/scatter is node-sized
     (~32K) instead of image-sized (~450K), which cut the TPU cost of
     the whole detector ~4x (gathers ride the scalar unit at ~8
     cycles/index; the dense formulation spent ~465 ms/frame in
     image-sized label jumps and moment scatters);
  4. edge chaining -> orientation-gated connected labeling over the node
     graph: every node carries the min flat-index of its component;
     labels converge by masked 8-neighbor min-propagation plus pointer
     jumping (L <- L[L], run twice per round — node-sized jumps are
     cheap, so path compression is aggressive and fewer rounds suffice);
  5. curvature-break splitting (the dense analogue of EDLine's
     walk-and-refit in LeastSquaresLineFit_ :2484-2643): components that
     fail the straightness gate are cut at their maximum-deviation node
     (Douglas-Peucker step) and relabeled; `split_rounds` recursions turn
     one curved contour into up to 2^rounds straight pieces whose break
     points sit at geometric corners — rotation-stable endpoints;
  6. per-component moments by node-sized scatter-add, top-K components by
     support -> fixed-capacity segments; least-squares line fit from the
     moments (principal axis, LeastSquaresLineFit_ :2484), endpoints from
     the exact extent of the support projected on the fitted axis;
  7. validation (LineValidation_ :2645 in spirit): minimum support,
     minimum length, straightness (minor/major eigenvalue ratio) and
     density gates.

The continuous gradient orientation makes chains rotation-equivariant —
no direction quantization anywhere — which is exactly where the dense
n_dirs run detector loses repeatability; with the 20-deg chaining gate
and splitting, repeatability BEATS cv2 LSD on all four EVAL.md warps.
Selectable via ``use_edlines`` with the edline_* VOConfig knobs (a
TPU-native addition; the reference never reaches its EDLine from StVO).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops.image import sobel
from stvo_pl_tpu.ops.lsd import LineSegments

_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


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


def _ang_diff_mod_pi(a, b):
    d = jnp.abs(a - b) % jnp.pi
    return jnp.minimum(d, jnp.pi - d)


def _label_nodes(gate, nbr_slot, node_flat, node_valid, inv, n_rounds,
                 M, BIG):
    """Min-label propagation over the node graph with double pointer
    jumping per round.

    gate: [M, 8] bool connection gates; nbr_slot: [M, 8] int32 neighbor
    slots (M = sentinel); inv: [P] flat-pixel -> slot map; labels are
    FLAT PIXEL indices (min over the component), BIG for invalid nodes.
    """
    L = jnp.where(node_valid, node_flat, BIG)

    def body(L, _):
        Le = jnp.concatenate([L, jnp.array([BIG], L.dtype)])
        best = L
        for k in range(8):
            Ln = Le[nbr_slot[:, k]]
            best = jnp.minimum(best, jnp.where(gate[:, k], Ln, BIG))
        L = jnp.where(node_valid, best, BIG)
        # double pointer jump (path compression): node-sized jumps are
        # cheap, and compressing twice per round converges in fewer
        # rounds than the dense image-sized formulation could afford
        for _j in range(2):
            slot = inv[jnp.clip(L, 0, BIG - 1)]
            Lj = jnp.where(L < BIG, jnp.take(L, slot, mode="clip"), BIG)
            L = jnp.where(L < BIG, jnp.minimum(L, Lj), BIG)
        return L, None

    L, _ = jax.lax.scan(body, L, None, length=n_rounds)
    return L


@functools.partial(jax.jit,
                   static_argnames=("capacity", "n_rounds", "min_support",
                                    "split_rounds", "relabel_rounds",
                                    "smooth_sigma", "node_capacity"))
def detect_edlines(img: jnp.ndarray, min_length: jnp.ndarray,
                   capacity: int = 300, grad_th: float = 20.0,
                   anchor_th: float = 8.0, ang_tol_deg: float = 20.0,
                   min_support: int = 10, straight_tol: float = 0.1,
                   density_th: float = 0.4,
                   n_rounds: int = 12,
                   split_rounds: int = 2,
                   relabel_rounds: int = 8,
                   hyst_ratio: float = 1.0,
                   smooth_sigma: float = 1.0,
                   node_capacity: int = 16384) -> LineSegments:
    """Detect line segments; returns fixed-capacity LineSegments.

    grad_th/anchor_th follow EDLine's gradiantThreshold/anchorThreshold
    semantics (descriptor_custom.hpp EDLineParam); n_rounds bounds the
    chaining diameter; split_rounds recursively cuts non-straight
    components at their max-deviation node (0 disables); relabel_rounds
    re-runs shorter labelings after each cut (split pieces are shorter).
    node_capacity bounds the compacted edge-pixel set — overflow drops
    the highest-index edge pixels (a ~7% image-area budget; real images
    thin to ~3-6%).
    """
    H, W = img.shape
    P = H * W
    BIG = jnp.int32(P)
    M = min(node_capacity, P)      # small images: every pixel fits

    # --- 1. smooth + gradient ------------------------------------------
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
    # hyst_ratio < 1 enables Canny-style hysteresis (chain weak pixels of
    # strong chains); measured quality-neutral on natural texture AND it
    # doubles the edge-node count (node_capacity overflow risk on big
    # textured images), so the default is 1.0 = off
    edge = keep & (mag > hyst_ratio * grad_th)
    # border guard (Sobel halo)
    edge = edge & (yy0 > 1) & (yy0 < H - 2) & (xx0 > 1) & (xx0 < W - 2)

    # --- 3. compact edge pixels to a fixed-capacity node list ----------
    # priority = gradient magnitude: when the image has more edge pixels
    # than node_capacity, the WEAKEST edges drop (graceful), not the
    # bottom image rows (the old flat-index priority).  Under budget all
    # edge pixels are kept either way.  Labels are min-FLAT-INDEX values,
    # so slot order is free.
    flat = (yy0 * W + xx0).astype(jnp.int32)
    edge_f = edge.reshape(-1)
    mag_flat = mag.reshape(-1)
    prio = jnp.where(edge_f, mag_flat, 0.0)
    _, node_flat = jax.lax.top_k(prio, M)
    node_flat = node_flat.astype(jnp.int32)
    node_valid = edge_f[node_flat]
    inv = jnp.zeros((P,), jnp.int32).at[node_flat].set(
        jnp.arange(M, dtype=jnp.int32))

    theta_f = theta.reshape(-1)
    mag_f = mag.reshape(-1)
    nx = node_flat % W
    ny = node_flat // W
    th_node = theta_f[node_flat]
    mag_node = jnp.where(node_valid, mag_f[node_flat], 0.0)

    # neighbor slots + connection gates (orientation similarity)
    tol = jnp.deg2rad(ang_tol_deg)
    nbr_slots = []
    base_gates = []
    for dy, dx in _N8:
        qx = nx + dx
        qy = ny + dy
        inb = (qx >= 0) & (qx < W) & (qy >= 0) & (qy < H)
        q = jnp.clip(qy * W + qx, 0, P - 1)
        # membership test: an edge pixel DROPPED by the capacity budget
        # has inv[q] == 0 (the init value), which would silently alias it
        # to slot 0 — require the round-trip node_flat[inv[q]] == q
        slot_q = inv[q]
        q_edge = (edge_f[q] & inb & node_valid
                  & (node_flat[slot_q] == q))
        th_q = theta_f[q]
        g = q_edge & (_ang_diff_mod_pi(th_node, th_q) < tol)
        nbr_slots.append(jnp.where(q_edge, slot_q, M))
        base_gates.append(g)
    nbr_slot = jnp.stack(nbr_slots, axis=-1)       # [M, 8]
    gate0 = jnp.stack(base_gates, axis=-1)         # [M, 8]

    L = _label_nodes(gate0, nbr_slot, node_flat, node_valid, inv,
                     n_rounds, M, BIG)

    xf = nx.astype(jnp.float32)
    yf = ny.astype(jnp.float32)

    def moments(L):
        idx = jnp.where(node_valid, inv[jnp.clip(L, 0, P - 1)], M - 1)
        live = node_valid

        def scat(vals):
            return jnp.zeros((M,), jnp.float32).at[idx].add(
                jnp.where(live, vals, 0.0))

        return ({"cnt": scat(jnp.ones_like(xf)), "sx": scat(xf),
                 "sy": scat(yf), "sxx": scat(xf * xf),
                 "syy": scat(yf * yf), "sxy": scat(xf * yf)}, idx)

    def fit(m):
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
        # variance; a `1.0` fallback would mis-orient exactly-vertical lines)
        dx_dir = jnp.where(jnp.abs(cxy) > 1e-9, lam1 - cyy,
                           jnp.where(cxx >= cyy, 1.0, 0.0))
        dy_dir = jnp.where(jnp.abs(cxy) > 1e-9, cxy,
                           jnp.where(cxx >= cyy, 0.0, 1.0))
        norm = jnp.sqrt(dx_dir ** 2 + dy_dir ** 2)
        return {"mx": mx, "my": my,
                "ux": dx_dir / jnp.maximum(norm, 1e-9),
                "uy": dy_dir / jnp.maximum(norm, 1e-9),
                "lam1": lam1, "lam2": lam2}

    # --- 5. curvature-break splitting (Douglas-Peucker rounds) ---------
    # split-point packing: 11 bits quantized residual (1/8 px up to 255 px)
    # above 19 bits quantized axis parameter (1/4 px) — int32-safe max.
    T_BITS = 19
    T_HALF = 1 << (T_BITS - 1)
    side = jnp.zeros((M,), jnp.int32)
    for _round in range(split_rounds):
        m, idx = moments(L)
        f = fit(m)
        mx = f["mx"][idx]
        my = f["my"][idx]
        ux = f["ux"][idx]
        uy = f["uy"][idx]
        t = (xf - mx) * ux + (yf - my) * uy
        res = jnp.abs(-(xf - mx) * uy + (yf - my) * ux)
        # which components split: fail straightness with enough support
        unstraight = (f["lam2"] > straight_tol * f["lam1"])
        do_split = (unstraight[idx] & (m["cnt"][idx] >= 2 * min_support)
                    & node_valid)
        # per-component argmax-residual node's t, via packed scatter-max
        rq = jnp.clip((res * 8.0).astype(jnp.int32), 0, 2047)
        tq = jnp.clip((t * 4.0).astype(jnp.int32) + T_HALF, 0,
                      (1 << T_BITS) - 1)
        packed = jnp.where(do_split, (rq << T_BITS) + tq, 0)
        best = jnp.zeros((M,), jnp.int32).at[idx].max(packed)
        t_split = ((best[idx] & ((1 << T_BITS) - 1)) - T_HALF) \
            .astype(jnp.float32) * 0.25
        # side values only need to be distinct WITHIN a component (the
        # relabel gate requires equal old roots), so +1 suffices
        side = jnp.where(do_split & (t > t_split), side + 1, side)
        # relabel: connect only same old component AND same side
        Le = jnp.concatenate([L, jnp.array([BIG], L.dtype)])
        se = jnp.concatenate([side, jnp.array([-1], side.dtype)])
        gate = jnp.stack(
            [(Le[nbr_slot[:, k]] == L) & (se[nbr_slot[:, k]] == side)
             & gate0[:, k] for k in range(8)], axis=-1)
        L = _label_nodes(gate, nbr_slot, node_flat, node_valid, inv,
                         relabel_rounds, M, BIG)

    # --- 6. per-component stats of the final labels --------------------
    m, idx = moments(L)
    mmax = jnp.zeros((M,), jnp.float32).at[idx].max(
        jnp.where(node_valid, mag_node, 0.0))    # anchor test: the chain
    #   must contain one prominent pixel (EDLine seeds chains at anchors)
    smag = jnp.zeros((M,), jnp.float32).at[idx].add(
        jnp.where(node_valid, mag_node, 0.0))

    # a slot is a live component root iff its own label maps back to it
    is_root = node_valid & (L == node_flat)
    score = jnp.where((m["cnt"] >= min_support) & is_root, m["cnt"], 0.0)
    top, roots = jax.lax.top_k(score, capacity)

    def take(a):
        return a[roots]

    f = fit(m)
    n = take(m["cnt"])
    mx = take(f["mx"])
    my = take(f["my"])
    ux = take(f["ux"])
    uy = take(f["uy"])
    lam1 = take(f["lam1"])
    lam2 = take(f["lam2"])

    # endpoints: exact extent of the support on the fitted axis
    t_node = (xf - f["mx"][idx]) * f["ux"][idx] \
        + (yf - f["my"][idx]) * f["uy"][idx]
    t0 = take(jnp.full((M,), 1e9, jnp.float32).at[idx].min(
        jnp.where(node_valid, t_node, 1e9)))
    t1 = take(jnp.full((M,), -1e9, jnp.float32).at[idx].max(
        jnp.where(node_valid, t_node, -1e9)))
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
