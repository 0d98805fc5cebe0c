"""Per-frame stereo feature extraction: the StereoFrame pipeline
(reference src/stereoFrame.cpp) as one fused, batched XLA program.

Reference flow (src/stereoFrame.cpp:59-398): detect ORB points and LSD lines
in L and R (4 std::async tasks), stereo-match each modality over a 48x64
bucket grid with epipolar/disparity/overlap filters, back-project survivors.

TPU-first redesign:
  * L/R is a leading batch axis of size 2 — the fork-join parallelism of
    the reference becomes data parallelism inside one jit;
  * multi-level FAST detection uses static per-level budgets (geometric
    distribution like cv::ORB), fixed-capacity keypoint arrays, masks;
  * stereo correspondence = dense masked Hamming matrix + grid-window
    predicate + NNR + mutual check, then vectorized epipolar/disparity
    (points) or direction/overlap/disparity-ratio (lines) filters;
  * back-projection of survivors happens under the same mask — no
    compaction anywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import fast as fast_ops
from stvo_pl_tpu.ops import hamming, lbd, lsd, matching, orb, subpix
from stvo_pl_tpu.ops.image import (gaussian_blur, pyramid_levels,
                                   resize_bilinear, sobel)
from stvo_pl_tpu.models.features import (LineSet, PointSet, empty_lines,
                                         empty_points)


class FrameFeatures(NamedTuple):
    """Everything the VO engine needs from one stereo pair."""
    points: PointSet
    lines: LineSet


def _per_level_budgets(cfg: VOConfig) -> list[int]:
    """Geometric feature distribution over pyramid levels (cv::ORB style):
    n_i ~ (1/scale)^i, summing to orb_nfeatures."""
    L = cfg.orb_nlevels
    q = 1.0 / cfg.orb_scale_factor
    weights = [q ** i for i in range(L)]
    s = sum(weights)
    budgets = [max(8, int(round(cfg.orb_nfeatures * w / s))) for w in weights]
    # fix rounding to sum exactly
    budgets[0] += cfg.orb_nfeatures - sum(budgets)
    return budgets


class DetectedPoints(NamedTuple):
    """Fixed-capacity multi-level point detections for one image.

    uv/uvc are level-0 coordinates; patch is the central slice of the
    blurred ORB patch kept for photometric stereo refinement (empty [K,0,0]
    when cfg.subpix_disp is off).
    """
    uv: jnp.ndarray      # [K, 2] sub-pixel refined level-0 coords
    desc: jnp.ndarray    # [K, 8] uint32
    level: jnp.ndarray   # [K] int32
    score: jnp.ndarray   # [K]
    valid: jnp.ndarray   # [K] bool
    uvc: jnp.ndarray     # [K, 2] integer patch-gather centers * scale
    patch: jnp.ndarray   # [K, Q, Q] central blurred-patch slice


_PATCH_SLICE_R = subpix.SSD_R + 1    # SSD window + 1px shift margin


def detect_points_multilevel(img: jnp.ndarray, fast_th: jnp.ndarray,
                             cfg: VOConfig) -> DetectedPoints:
    """Multi-level FAST + oriented-BRIEF on one image, K = cfg.orb_nfeatures.

    Mirrors detectPointFeatures (src/stereoFrame.cpp:104-118): ORB with
    orb_nlevels / orb_scale_factor / fast threshold, features reported in
    level-0 coordinates with their octave.  Beyond the reference, corners
    are sub-pixel (parabola fit on the FAST-response neighborhood, fused
    into the detection kernel) — cv::ORB only gets fractional coords from
    the integer*scale^level product.
    """
    budgets = _per_level_budgets(cfg)
    uvs, descs, levels, scores, valids = [], [], [], [], []
    uvcs, patches = [], []
    pyr = pyramid_levels(img, cfg.orb_nlevels, cfg.orb_scale_factor,
                         blur_sigma=0.6)
    for lv in range(cfg.orb_nlevels):
        cur = pyr[lv]
        uv, sc, v = fast_ops.detect_keypoints(
            cur, fast_th, budgets[lv], edge=cfg.orb_edge_th, cell=4,
            score_type=cfg.orb_score, subpix=cfg.subpix_points)
        blur = gaussian_blur(cur, 2.0, radius=3)
        p = orb.gather_patches(blur, uv)
        if cfg.orb_wta_k == 2:
            # quantized bf16 MXU path: patches snapped to the uint8 grid
            # for deterministic BRIEF bits, then one matmul per level for
            # the 30-bin rBRIEF test bank (ops/orb.py orient_describe)
            desc, _, _ = orb.orient_describe(p, patch_size=cfg.orb_patch_size)
        else:
            # WTA_K=3/4: 2-bit argmax cells, HAMMING2 distances
            # (cv::ORB + BFMatcher(NORM_HAMMING2), src/stereoFrame.cpp:112-115);
            # same uint8-grid snap as orient_describe — near-tie argmax
            # cells flip on sub-LSB resampling noise just like sign bits
            q = jnp.clip(jnp.round(p), 0.0, 255.0)
            c, s = orb.orientation(q)
            desc = orb.describe_wta(q, c, s, cfg.orb_wta_k,
                                    patch_size=cfg.orb_patch_size)
        scale = cfg.orb_scale_factor ** lv
        # integer gather centers (gather_patches clamping semantics)
        Hl, Wl = cur.shape
        R = orb.PATCH_R
        cx = jnp.clip(jnp.round(uv[:, 0]), R, Wl - 1 - R)
        cy = jnp.clip(jnp.round(uv[:, 1]), R, Hl - 1 - R)
        uvcs.append(jnp.stack([cx, cy], axis=-1) * scale)
        if cfg.subpix_disp:
            q = _PATCH_SLICE_R
            patches.append(p[:, R - q:R + q + 1, R - q:R + q + 1])
        else:
            patches.append(p[:, :0, :0])
        uvs.append(uv * scale)
        descs.append(desc)
        levels.append(jnp.full((budgets[lv],), lv, jnp.int32))
        scores.append(sc)
        valids.append(v)
    return DetectedPoints(
        uv=jnp.concatenate(uvs), desc=jnp.concatenate(descs),
        level=jnp.concatenate(levels), score=jnp.concatenate(scores),
        valid=jnp.concatenate(valids), uvc=jnp.concatenate(uvcs),
        patch=jnp.concatenate(patches))


def match_stereo_points(det_l: DetectedPoints, det_r: DetectedPoints,
                        cam: cam_ops.StereoCamera, cfg: VOConfig,
                        tp=None) -> PointSet:
    """Grid-windowed stereo matching + epipolar/disparity filters +
    back-projection (matchStereoPoints, src/stereoFrame.cpp:120-173).

    With cfg.subpix_disp, the matched disparity is re-estimated
    photometrically (1-D SSD parabola between the stereo patches,
    ops/subpix.py) when both corners share a pyramid level — sharper than
    differencing two independently-localized corner x's."""
    uv_l, desc_l, level_l, valid_l = (det_l.uv, det_l.desc, det_l.level,
                                      det_l.valid)
    uv_r, desc_r, valid_r = det_r.uv, det_r.desc, det_r.valid
    inv_w = cfg.grid_cols / float(cam.width)
    inv_h = cfg.grid_rows / float(cam.height)

    cand = matching.stereo_point_window_mask(uv_l, uv_r, inv_w, inv_h,
                                             cfg.matching_s_ws)
    cand = cand & valid_l[:, None] & valid_r[None, :]
    res = matching.match_auto(desc_l, desc_r, cand, cfg.min_ratio_12_p,
                              cfg, tp=tp, wta_k=cfg.orb_wta_k)

    j = jnp.maximum(res.idx, 0)
    uv_rm = uv_r[j]
    # epipolar + min disparity (src/stereoFrame.cpp:157-160)
    epip_ok = jnp.abs(uv_l[:, 1] - uv_rm[:, 1]) <= cfg.max_dist_epip
    disp = uv_l[:, 0] - uv_rm[:, 0]
    if cfg.subpix_disp:
        scale_l = cfg.orb_scale_factor ** level_l.astype(uv_l.dtype)
        shift, sok = subpix.disparity_shift(det_l.patch, det_r.patch[j])
        d_photo = (det_l.uvc[:, 0] - det_r.uvc[j, 0]) - scale_l * shift
        use = (sok & (level_l == det_r.level[j])
               & (jnp.abs(d_photo - disp) <= 2.0 * scale_l))
        disp = jnp.where(use, d_photo, disp)
    disp_ok = disp >= cfg.min_disp
    ok = res.valid & epip_ok & disp_ok

    disp_safe = jnp.where(ok, disp, 1.0)
    P = cam_ops.back_project(cam, uv_l, disp_safe)
    sigma2 = cfg.orb_scale_factor ** (-2.0 * level_l.astype(uv_l.dtype))
    return PointSet(uv=uv_l, disp=jnp.where(ok, disp, 0.0), P=P,
                    desc=desc_l, level=level_l, sigma2=sigma2, valid=ok)


def _line_coeffs(sp: jnp.ndarray, ep: jnp.ndarray) -> jnp.ndarray:
    """Normalized infinite-line coefficients le = (sp x ep) / |(a, b)|
    (src/stereoFrame.cpp:356-358)."""
    sph = jnp.concatenate([sp, jnp.ones_like(sp[..., :1])], axis=-1)
    eph = jnp.concatenate([ep, jnp.ones_like(ep[..., :1])], axis=-1)
    le = jnp.cross(sph, eph)
    n = jnp.sqrt(le[..., 0] ** 2 + le[..., 1] ** 2)
    return le / jnp.maximum(n, 1e-12)[..., None]


def _overlap_stereo(sy_l, ey_l, sy_r, ey_r, horiz_th: float):
    """Vertical-interval overlap ratio (lineSegmentOverlapStereo,
    src/stereoFrame.cpp:473-508)."""
    sln = jnp.minimum(sy_l, ey_l)
    eln = jnp.maximum(sy_l, ey_l)
    spn = jnp.minimum(sy_r, ey_r)
    epn = jnp.maximum(sy_r, ey_r)
    length = eln - spn
    disjoint = (epn < sln) | (spn > eln)
    contains = (epn > eln) & (spn < sln)
    ov = jnp.where(contains, eln - sln,
                   jnp.minimum(eln, epn) - jnp.maximum(sln, spn))
    ov = jnp.where(disjoint, 0.0, ov)
    ov = jnp.where(length > 0.01, ov / length, 0.0)
    ov = jnp.minimum(ov, 1.0)
    # near-horizontal observed lines keep overlap = 1 (reference gate)
    return jnp.where(jnp.abs(ey_l - sy_l) > horiz_th, ov,
                     jnp.ones_like(ov))


def match_stereo_lines(lines_l: lsd.LineSegments, desc_l,
                       lines_r: lsd.LineSegments, desc_r,
                       cam: cam_ops.StereoCamera, cfg: VOConfig,
                       level_l=None, tp=None) -> LineSet:
    """Stereo line matching: direction + grid proximity candidates, NNR +
    mutual, endpoint-disparity by line intersection, overlap and disparity
    consistency filters, endpoint back-projection
    (matchStereoLines, src/stereoFrame.cpp:309-398)."""
    inv_w = cfg.grid_cols / float(cam.width)
    inv_h = cfg.grid_rows / float(cam.height)
    dtype = lines_l.sp.dtype

    cand = matching.stereo_line_window_mask(
        lines_l.sp, lines_l.ep, lines_r.sp, lines_r.ep, inv_w, inv_h,
        cfg.matching_s_ws)
    d_l = lines_l.ep - lines_l.sp
    d_r = lines_r.ep - lines_r.sp
    u_l = d_l / jnp.maximum(jnp.linalg.norm(d_l, axis=-1, keepdims=True), 1e-6)
    u_r = d_r / jnp.maximum(jnp.linalg.norm(d_r, axis=-1, keepdims=True), 1e-6)
    cand = cand & matching.line_direction_mask(u_l, u_r, cfg.line_sim_th)
    cand = cand & lines_l.valid[:, None] & lines_r.valid[None, :]
    res = matching.match_auto(desc_l, desc_r, cand, cfg.min_ratio_12_p,
                              cfg, tp=tp)

    j = jnp.maximum(res.idx, 0)
    sp_r = lines_r.sp[j]
    ep_r = lines_r.ep[j]
    sp_l = lines_l.sp
    ep_l = lines_l.ep

    overlap = _overlap_stereo(sp_l[:, 1], ep_l[:, 1], sp_r[:, 1], ep_r[:, 1],
                              cfg.line_horiz_th)

    # x of the matched right line at the left endpoints' rows
    # (src/stereoFrame.cpp:366-368)
    dy_r = sp_r[:, 1] - ep_r[:, 1]
    dy_safe = jnp.where(jnp.abs(dy_r) < 1e-6, 1e-6, dy_r)
    x_at = lambda y: (sp_r[:, 0] * (y - ep_r[:, 1])
                      + ep_r[:, 0] * (sp_r[:, 1] - y)) / dy_safe
    disp_s = sp_l[:, 0] - x_at(sp_l[:, 1])
    disp_e = ep_l[:, 0] - x_at(ep_l[:, 1])
    # disparity consistency (filterLineSegmentDisparity,
    # src/stereoFrame.cpp:405-415)
    ratio = (jnp.minimum(disp_s, disp_e)
             / jnp.where(jnp.maximum(disp_s, disp_e) == 0, 1e-6,
                         jnp.maximum(disp_s, disp_e)))
    disp_consistent = ratio >= cfg.ls_min_disp_ratio

    ok = (res.valid & disp_consistent
          & (disp_s >= cfg.min_disp) & (disp_e >= cfg.min_disp)
          & (jnp.abs(sp_l[:, 1] - ep_l[:, 1]) > cfg.line_horiz_th)
          & (jnp.abs(sp_r[:, 1] - ep_r[:, 1]) > cfg.line_horiz_th)
          & (overlap > cfg.stereo_overlap_th))

    ds = jnp.where(ok, disp_s, 1.0)
    de = jnp.where(ok, disp_e, 1.0)
    sP = cam_ops.back_project(cam, sp_l, ds)
    eP = cam_ops.back_project(cam, ep_l, de)
    le = _line_coeffs(sp_l, ep_l)
    # per-octave inverse variance sigma2 = lsd_scale^(-2*level)
    # (src/stereoFeatures.cpp:107-115 — a reference quirk: the formula uses
    # Config::lsdScale, NOT the pyramid ratio 2 the octaves were built
    # with; kept verbatim for parity, so the default lsd_scale = 1.0
    # weighs every octave equally).  Single-octave detection => level 0.
    if level_l is None:
        level_l = jnp.zeros(sp_l.shape[0], jnp.int32)
    sigma2 = jnp.asarray(float(cfg.lsd_scale), dtype) ** (
        -2.0 * level_l.astype(dtype))
    return LineSet(
        spl=sp_l, epl=ep_l,
        sdisp=jnp.where(ok, disp_s, 0.0), edisp=jnp.where(ok, disp_e, 0.0),
        sP=sP, eP=eP, le=le, angle=lines_l.angle,
        desc=desc_l, level=level_l,
        sigma2=sigma2, valid=ok)


def detect_lines_scaled(im: jnp.ndarray, min_line_length,
                        cfg: VOConfig, lite: bool = False) -> lsd.LineSegments:
    """Dense LSD detection honoring lsd_scale / lsd_sigma_scale.

    cv::LSD detects on a Gaussian-smoothed image resampled by `scale` and
    divides the found coordinates back (opts.scale/sigma_scale flow from
    src/stereoFrame.cpp:222-223 into cv::createLineSegmentDetector; the
    reference default scale=1.2 UPSAMPLES detection for sub-pixel segment
    geometry, sigma = sigma_scale for upsampling, sigma_scale/scale for
    downsampling).  Same semantics here, with the pre-blur composed into
    the resize matmul (ops/image.resize_bilinear) and the exact per-axis
    half-pixel-center inverse map instead of cv's plain division (rounded
    output sizes make each axis' effective scale differ slightly from
    cfg.lsd_scale).
    """
    scale = float(cfg.lsd_scale)
    det_im, mll = im, min_line_length
    if scale != 1.0:
        H0, W0 = im.shape
        sigma = (cfg.lsd_sigma_scale / scale if scale < 1.0
                 else cfg.lsd_sigma_scale)
        det_im = resize_bilinear(im, int(round(H0 * scale)),
                                 int(round(W0 * scale)), blur_sigma=sigma)
        mll = min_line_length * scale
    segs = lsd.detect_line_segments(
        det_im, mll, capacity=cfg.line_capacity,
        n_dirs=cfg.lsd_n_dirs, ang_th_deg=cfg.lsd_ang_th,
        quant=cfg.lsd_quant, density_th=cfg.lsd_density_th,
        refine=not cfg.use_fld_lines,
        # lite (right-eye) mode halves the along-line refine samples; the
        # right lines never feed the f2f residual, only stereo matching +
        # the disparity intersection (gated by a bench accuracy A/B)
        refine_samples=8 if lite else 16,
        # cv::LSD ALWAYS validates candidates a-contrario (the LSD paper's
        # epsilon = 1, i.e. -log10(NFA) > 0); the user-facing log_eps knob
        # only replaces that threshold in advanced-refinement mode
        # (lsd_refine >= 2).  Round 3 wrongly gated validation itself
        # behind lsd_refine >= 2 — rot15 repeatability 0.09 -> 0.14 from
        # this alone (spurious low-alignment candidates no longer crowd
        # the capacity).  The FLD path (refine=False) keeps no NFA, like
        # cv::ximgproc::FastLineDetector.
        log_eps=(cfg.lsd_log_eps if cfg.lsd_refine >= 2 else 0.0))
    if scale != 1.0:
        H0, W0 = im.shape
        Hs, Ws = det_im.shape
        inv = jnp.asarray([W0 / Ws, H0 / Hs], segs.sp.dtype)
        lim = jnp.asarray([W0 - 1.0, H0 - 1.0], segs.sp.dtype)
        to_src = lambda p: jnp.clip((p + 0.5) * inv - 0.5, 0.0, lim)
        segs = segs._replace(sp=to_src(segs.sp), ep=to_src(segs.ep),
                             length=segs.length / scale)
    return segs


def _length_buckets(length: jnp.ndarray, valid: jnp.ndarray, cap: int):
    """Split the capacity into a LONG half and a SHORT half by measured
    length (two-bucket length-adaptive LBD, see config.lbd_long_samples).
    Returns (long_idx [cap//2], short_idx [cap - cap//2])."""
    order = jnp.argsort(-jnp.where(valid, length, 0.0))
    half = cap // 2
    return order[:half], order[half:]


def _lbd_two_bucket(gx: jnp.ndarray, gy: jnp.ndarray,
                    segs: lsd.LineSegments, cfg: VOConfig) -> jnp.ndarray:
    """LBD with length-adaptive along-line sampling.

    The reference integrates every pixel of the rotated support region
    (binary_descriptor_custom.cpp:1142-1241); the dense 8-sample grid
    under-samples long lines.  The longer half of the capacity gets
    cfg.lbd_long_samples samples, the shorter half keeps the 8-sample
    grid; band statistics are mean/std over samples so both buckets'
    descriptors live in the same space and match freely."""
    if cfg.lbd_long_samples <= lbd.N_SAMPLES:
        _, desc = lbd.compute_lbd(gx, gy, segs.sp, segs.ep)
        return desc
    cap = segs.sp.shape[0]
    li, si = _length_buckets(segs.length, segs.valid, cap)
    _, d_long = lbd.compute_lbd(gx, gy, segs.sp[li], segs.ep[li],
                                n_samples=cfg.lbd_long_samples)
    _, d_short = lbd.compute_lbd(gx, gy, segs.sp[si], segs.ep[si])
    return (jnp.zeros((cap, 8), jnp.uint32)
            .at[li].set(d_long).at[si].set(d_short))


def _octave_images(im: jnp.ndarray, n_oct: int) -> list[jnp.ndarray]:
    """Ratio-2 Gaussian pyramid (pyrDown equivalent: AA blur composed into
    the resize matmul, LSDDetector_custom.cpp:56-73)."""
    imgs = [im]
    cur = im
    for _ in range(1, n_oct):
        H, W = cur.shape
        if min(H, W) < 64:
            break
        cur = resize_bilinear(cur, H // 2, W // 2, blur_sigma=1.0)
        imgs.append(cur)
    return imgs


def _octave_layout(shapes: list[tuple], gap: int = 16):
    """Pack octave regions into one canvas: octave 0 at the top-left, the
    coarser octaves side by side in a strip below it, every region
    separated by `gap` zero pixels (wide enough that run thickening,
    collinear merging with gap_tol <= 8 and the +-2 px refine taps can
    never bridge two regions).  Returns ((y0, x0, Ho, Wo) per octave,
    canvas (H, W))."""
    H0, W0 = shapes[0]
    regs = [(0, 0, H0, W0)]
    if len(shapes) > 1:
        y = H0 + gap
        x = 0
        strip_h = shapes[1][0]
        for (Ho, Wo) in shapes[1:]:
            regs.append((y, x, Ho, Wo))
            x += Wo + gap
        Hc = H0 + gap + strip_h
        Wc = max(W0, x - gap)
    else:
        Hc, Wc = H0, W0
    return regs, (Hc, Wc)


def detect_lines_octaves(im: jnp.ndarray, min_line_length, cfg: VOConfig,
                         pool: float | None = None):
    """One-pass multi-octave line detection + octave-correct LBD.

    Rebuilds the vendored library's full multi-octave surface
    (LSDDetectorC::detect with numOctaves > 1: Gaussian pyramid with ratio
    2 via pyrDown, LSDDetector_custom.cpp:56-73; per-octave detection with
    the min-length threshold applied IN OCTAVE COORDS and endpoints
    rescaled to octave 0, :259-308) and LBD consuming each octave's own
    Sobel gradients (binary_descriptor_custom.cpp:689-1024).  The
    reference defers cross-octave de-duplication to OctaveKeyLines inside
    the LBD stage; the dense analogue is one pairwise duplicate
    suppression over the union.

    TPU-first design (round-5 rework): instead of running the whole
    detection graph per octave (which multiplies the field/kernel/refine/
    merge cost by the octave count), ALL octave images are packed into ONE
    canvas (_octave_layout, 16-px guard gaps excluded via the detector's
    valid_mask) and the dense detector runs ONCE over it:

      * candidate ranking happens in canvas = octave coordinates, so every
        octave competes by IN-OCTAVE length — the per-octave response
        normalization that stops coarse lines (2x level-0 extent per
        detected pixel) from crowding out fine ones;
      * the LSQ refine, NFA validation and O(K^2) merges stay
        capacity-sized instead of octave-count-sized;
      * after mapping back to level-0 coords, one duplicate suppression
        (ranked by in-octave length, so the fully-detected finer copy of a
        line outranks its coarser duplicate) unions the octaves;
      * LBD runs ONCE over the survivors, gathering each line's support
        region from its own octave's Sobel plane in a same-layout gradient
        atlas (ops/lbd.compute_lbd_atlas).

    Returns (LineSegments in octave-0 coords, octave [K] int32,
    lbd descriptors [K, 8] uint32), K = line_capacity.
    """
    H0, W0 = im.shape
    cap = cfg.line_capacity
    dtype = im.dtype
    imgs = _octave_images(im, max(1, cfg.lsd_octaves))
    n_oct = len(imgs)
    regs, (Hc, Wc) = _octave_layout([i.shape for i in imgs])

    import numpy as _np
    canvas = jnp.zeros((Hc, Wc), dtype)
    interior = _np.zeros((Hc, Wc), bool)
    for (y0, x0, Ho, Wo), img_o in zip(regs, imgs):
        canvas = canvas.at[y0:y0 + Ho, x0:x0 + Wo].set(img_o)
        # shrink each region by 2 px: the zero gap means the 2x2 level-line
        # field sees a spurious strong edge along every region border
        interior[y0 + 2:y0 + Ho - 2, x0 + 2:x0 + Wo - 2] = True

    # the canvas detector's in-octave length ranking under-serves long
    # coarse lines at tight capacity; an OVERSIZED detection pool
    # (1.5x cap through refine + validation) with the final capacity
    # selected by LEVEL-0 length after dedup is what recovers them.
    # Stamps head-to-head: cap-sized pool 0.0458, cap-sized pool with
    # level-0-fair membership ranking 0.0453 (not the lever), 1.5x pool
    # 0.0384 (vs reference 0.0417).
    if pool is None:
        pool = cfg.lsd_oct_pool
    det_cap = (int(round(cap * pool)) if n_oct > 1 else cap)
    det_cap = max(det_cap, cap)
    # raw-run pool sized by CONTENT (octave pixels / level-0 pixels,
    # ~1.31x for ratio-2 pyramids) rather than 2x the (possibly
    # oversized) detection capacity: the number of detectable runs
    # scales with pixels.  Measured fps-neutral vs 2*det_cap (239.1 vs
    # 238.4, BASELINE.md round 5) and part of every shipped-default
    # measurement (stamps 0.0419, textured60 0.0158, bench 249.5 fps).
    content = sum(h * w for (h, w) in (i.shape for i in imgs))
    kt = max(int(round(2 * cap * content / float(H0 * W0))),
             det_cap + cap // 2)
    oct_dirs = cfg.lsd_oct_n_dirs if cfg.lsd_oct_n_dirs > 0 else cfg.lsd_n_dirs
    segs, ang_c, mag_c = lsd.detect_line_segments(
        canvas, min_line_length, capacity=det_cap,
        n_dirs=oct_dirs, ang_th_deg=cfg.lsd_ang_th,
        quant=cfg.lsd_quant, density_th=cfg.lsd_density_th,
        refine=not cfg.use_fld_lines,
        log_eps=(cfg.lsd_log_eps if cfg.lsd_refine >= 2 else 0.0),
        valid_mask=jnp.asarray(interior), with_field=True, k_total=kt)

    # region -> octave attribution by midpoint, then region-local coords
    y0s = jnp.asarray([r[0] for r in regs], jnp.int32)
    x0s = jnp.asarray([r[1] for r in regs], jnp.int32)
    Hos = jnp.asarray([r[2] for r in regs], jnp.int32)
    Wos = jnp.asarray([r[3] for r in regs], jnp.int32)
    mid = 0.5 * (segs.sp + segs.ep)
    octv = jnp.zeros((det_cap,), jnp.int32)
    in_any = jnp.zeros((det_cap,), bool)
    for o, (y0, x0, Ho, Wo) in enumerate(regs):
        inside = ((mid[:, 1] >= y0) & (mid[:, 1] < y0 + Ho)
                  & (mid[:, 0] >= x0) & (mid[:, 0] < x0 + Wo))
        octv = jnp.where(inside, o, octv)
        in_any = in_any | inside
    off = jnp.stack([x0s, y0s], axis=-1).astype(dtype)[octv]     # [K, 2]
    ext = jnp.stack([Wos, Hos], axis=-1).astype(dtype)[octv]
    clip_oct = lambda p: jnp.clip(p - off, 0.0, ext - 1.0)
    sp_oct = clip_oct(segs.sp)
    ep_oct = clip_oct(segs.ep)
    len_oct = jnp.linalg.norm(ep_oct - sp_oct, axis=-1)

    # exact half-pixel-center map to octave-0 coords (the reference
    # multiplies by scale^octave; integer halving makes the effective
    # per-axis factor differ slightly from 2^o)
    inv = (jnp.asarray([W0, H0], dtype)[None, :] / ext)
    lim = jnp.asarray([W0 - 1.0, H0 - 1.0], dtype)
    to0 = lambda p: jnp.clip((p + 0.5) * inv - 0.5, 0.0, lim)
    sp0, ep0 = to0(sp_oct), to0(ep_oct)
    v = segs.valid & in_any

    if n_oct > 1:
        # LEVEL-0 precision pass for the coarse-octave survivors: a coarse
        # detection carries up to +-2^o px of level-0 position noise — the
        # round-5 per-octave bench showed this as elevated ATE lanes.  The
        # coarse lines (a minority of the capacity) are compacted to
        # cap//2 slots and re-refined by the SAME weighted-LSQ fit against
        # the canvas field's octave-0 region (== the level-0 field, no
        # recompute), with a widened +-3 px search for the mapped-back
        # position error.
        import math as _math
        tol = _math.radians(cfg.lsd_ang_th)

        coarse_score = jnp.where(v & (octv > 0), len_oct, -1.0)
        ncoarse = max(cap // 2, 1)
        csel, ci = jax.lax.top_k(coarse_score, ncoarse)
        do_ref = csel > 0
        sp_c, ep_c = sp0[ci], ep0[ci]
        ang0 = ang_c[:H0, :W0]
        mag0 = mag_c[:H0, :W0]
        sp_r, ep_r, _, _, _ = lsd._refine_segments(
            ang0, mag0, sp_c[:, 0], sp_c[:, 1], ep_c[:, 0], ep_c[:, 1],
            do_ref, tol, n_samples=cfg.lsd_oct_l0_samples, search=3)
        upd = do_ref[:, None]
        sp0 = sp0.at[ci].set(jnp.where(upd, jnp.clip(sp_r, 0.0, lim), sp_c))
        ep0 = ep0.at[ci].set(jnp.where(upd, jnp.clip(ep_r, 0.0, lim), ep_c))
        # refined coarse endpoints feed the LBD in octave coords too
        from_0 = lambda p: jnp.clip((p + 0.5) / inv - 0.5, 0.0, ext - 1.0)
        sp_oct = from_0(sp0)
        ep_oct = from_0(ep0)

        # the same physical line detected at 2+ octaves: keep the copy
        # with the longer LEVEL-0 extent (coverage wins — the coarse
        # octave sees long off-bin lines whole where the fine octave only
        # fragments them; with the level-0 precision refine above, the
        # coarse copy no longer pays a position penalty).  Membership in
        # the capacity was already decided by IN-OCTAVE ranking inside
        # the canvas detector, so this preference cannot crowd fine lines
        # out — it only picks which duplicate of one physical line lives.
        len0_d = jnp.linalg.norm(ep0 - sp0, axis=-1)
        v = lsd._suppress_duplicates(sp0, ep0,
                                     jnp.where(v, len0_d, 0.0), v,
                                     perp_tol=3.0, overlap_tol=0.5)

    if det_cap != cap:
        # final capacity: best cap lines by LEVEL-0 length after dedup
        resp_sel = jnp.where(v, jnp.linalg.norm(ep0 - sp0, axis=-1), 0.0)
        _, psel = jax.lax.top_k(resp_sel, cap)
        takes = lambda a: jnp.take(a, psel, axis=0)
        sp0, ep0, sp_oct, ep_oct = (takes(sp0), takes(ep0), takes(sp_oct),
                                    takes(ep_oct))
        octv, len_oct = takes(octv), takes(len_oct)
        v = resp_sel[psel] > 0

    # LBD once over the survivors: same-layout Sobel atlas, each line
    # sampling its OWN octave plane in octave coords (taps clip to the
    # region BEFORE the offset, so support regions never cross the gaps)
    g2 = jnp.zeros((Hc, Wc, 2), dtype)
    for (y0, x0, Ho, Wo), img_o in zip(regs, imgs):
        gx, gy = sobel(img_o)
        g2 = g2.at[y0:y0 + Ho, x0:x0 + Wo].set(jnp.stack([gx, gy], -1))
    x_off = x0s[octv]
    y_off = y0s[octv]
    x_hi = (Wos - 1)[octv]
    y_hi = (Hos - 1)[octv]
    if cfg.lbd_long_samples > lbd.N_SAMPLES:
        li, si = _length_buckets(len_oct, v, cap)
        _, d_long = lbd.compute_lbd_atlas(
            g2, sp_oct[li], ep_oct[li], x_off[li], y_off[li], x_hi[li],
            y_hi[li], n_samples=cfg.lbd_long_samples)
        _, d_short = lbd.compute_lbd_atlas(
            g2, sp_oct[si], ep_oct[si], x_off[si], y_off[si], x_hi[si],
            y_hi[si])
        desc = (jnp.zeros((cap, 8), jnp.uint32)
                .at[li].set(d_long).at[si].set(d_short))
    else:
        _, desc = lbd.compute_lbd_atlas(g2, sp_oct, ep_oct, x_off, y_off,
                                        x_hi, y_hi)

    dvec = ep0 - sp0
    len0 = jnp.linalg.norm(dvec, axis=-1)
    segs_out = lsd.LineSegments(
        sp=sp0, ep=ep0,
        angle=jnp.arctan2(dvec[:, 1], dvec[:, 0]),
        length=jnp.where(v, len0, 0.0),
        resp=jnp.where(v, len_oct, 0.0), valid=v)
    return segs_out, octv, desc


@functools.partial(jax.jit, static_argnames=("cfg", "cam", "tp"))
def extract_stereo_features(img_l: jnp.ndarray, img_r: jnp.ndarray,
                            fast_th: jnp.ndarray, min_line_length: jnp.ndarray,
                            cam: cam_ops.StereoCamera,
                            cfg: VOConfig, tp=None) -> FrameFeatures:
    """Full per-frame front end (extractStereoFeatures,
    src/stereoFrame.cpp:59-75): points and lines, L and R, one XLA program."""
    if cfg.has_points:
        det_l = detect_points_multilevel(img_l, fast_th, cfg)
        det_r = detect_points_multilevel(img_r, fast_th, cfg)
        points = match_stereo_points(det_l, det_r, cam, cfg, tp=tp)
    else:
        points = empty_points(cfg.point_capacity)

    if cfg.has_lines:
        def detect_one(im, lite=False, right=False):
            if cfg.use_edlines:
                from stvo_pl_tpu.ops.edline import detect_edlines
                f = max(1, int(cfg.edline_scale))
                H0, W0 = im.shape
                det_im = im
                if f > 1:
                    # AA half-res detection: the resize low-passes, so the
                    # in-kernel sigma-1 pre-smooth is skipped; support and
                    # length thresholds move to detection coords; the node
                    # budget shrinks with the pixel count (~7% edge area)
                    det_im = resize_bilinear(im, H0 // f, W0 // f,
                                             blur_sigma=1.0)
                Hd, Wd = det_im.shape
                node_cap = min(16384, max(2048, (Hd * Wd) // 14))
                segs = detect_edlines(
                    det_im, min_line_length / f,
                    capacity=cfg.line_capacity,
                    grad_th=cfg.edline_grad_th,
                    anchor_th=cfg.edline_anchor_th,
                    ang_tol_deg=cfg.edline_ang_tol,
                    min_support=max(4, cfg.edline_min_support // f),
                    straight_tol=cfg.edline_straight_tol,
                    density_th=cfg.edline_density_th,
                    split_rounds=cfg.edline_split_rounds,
                    smooth_sigma=0.0 if f > 1 else 1.0,
                    node_capacity=node_cap)
                if f > 1:
                    inv = jnp.asarray([W0 / Wd, H0 / Hd], segs.sp.dtype)
                    lim = jnp.asarray([W0 - 1.0, H0 - 1.0], segs.sp.dtype)
                    to0 = lambda p: jnp.clip((p + 0.5) * inv - 0.5, 0.0, lim)
                    sp0, ep0 = to0(segs.sp), to0(segs.ep)
                    d0 = ep0 - sp0
                    segs = segs._replace(
                        sp=sp0, ep=ep0,
                        angle=jnp.arctan2(d0[:, 1], d0[:, 0]),
                        length=jnp.linalg.norm(d0, axis=-1))
            elif cfg.lsd_octaves > 1:
                pool = (cfg.lsd_oct_pool_right
                        if right and cfg.lsd_oct_pool_right > 0 else None)
                segs, octv, desc_b = detect_lines_octaves(
                    im, min_line_length, cfg, pool=pool)
                return segs, desc_b, octv
            else:
                segs = detect_lines_scaled(im, min_line_length, cfg,
                                           lite=lite)
            gx, gy = sobel(im)
            desc_b = _lbd_two_bucket(gx, gy, segs, cfg)
            return segs, desc_b, jnp.zeros((segs.sp.shape[0],), jnp.int32)
        # L and R stay separate subgraphs (NOT a vmapped eye axis): XLA
        # overlaps the two independent chains; folding them into batch-8
        # launches measured 253 -> 203 fps
        segs_l, ldesc_l, octv_l = detect_one(img_l)
        segs_r, ldesc_r, _ = detect_one(img_r, lite=cfg.lsd_right_lite,
                                        right=True)
        lines = match_stereo_lines(segs_l, ldesc_l, segs_r, ldesc_r, cam,
                                   cfg, level_l=octv_l, tp=tp)
    else:
        lines = empty_lines(cfg.line_capacity)

    return FrameFeatures(points=points, lines=lines)


def _sample_depth(depth: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-pixel depth lookup (reference reads img_r.at<float>(y, x),
    src/stereoFrame.cpp:710)."""
    H, W = depth.shape
    x = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    return depth[y, x]


@functools.partial(jax.jit, static_argnames=("cfg", "cam"))
def extract_rgbd_features(img: jnp.ndarray, depth: jnp.ndarray,
                          fast_th: jnp.ndarray, min_line_length: jnp.ndarray,
                          cam: cam_ops.StereoCamera,
                          cfg: VOConfig) -> FrameFeatures:
    """RGB-D front end (extractRGBDFeatures, src/stereoFrame.cpp:667-818):
    detect on the intensity image only; disparity comes from the registered
    depth map (disp = fx b / depth) gated by rgbd_min/max_depth and
    min_disp.  depth is metric float32 [H, W]; invalid pixels <= 0.
    """
    if cfg.has_points:
        det = detect_points_multilevel(img, fast_th, cfg)
        uv, desc, level, valid = det.uv, det.desc, det.level, det.valid
        d = _sample_depth(depth, uv)
        depth_ok = (d > cfg.rgbd_min_depth) & (d < cfg.rgbd_max_depth)
        disp = cam.fx * cam.b / jnp.where(depth_ok, d, 1.0)
        ok = valid & depth_ok & (disp >= cfg.min_disp)
        P = cam_ops.back_project(cam, uv, jnp.where(ok, disp, 1.0))
        sigma2 = cfg.orb_scale_factor ** (-2.0 * level.astype(uv.dtype))
        points = PointSet(uv=uv, disp=jnp.where(ok, disp, 0.0), P=P,
                          desc=desc, level=level, sigma2=sigma2, valid=ok)
    else:
        points = empty_points(cfg.point_capacity)

    if cfg.has_lines:
        if cfg.use_edlines:
            from stvo_pl_tpu.ops.edline import detect_edlines
            segs = detect_edlines(
                img, min_line_length, capacity=cfg.line_capacity,
                grad_th=cfg.edline_grad_th, anchor_th=cfg.edline_anchor_th,
                ang_tol_deg=cfg.edline_ang_tol,
                min_support=cfg.edline_min_support,
                straight_tol=cfg.edline_straight_tol,
                density_th=cfg.edline_density_th,
                split_rounds=cfg.edline_split_rounds)
        else:
            segs = lsd.detect_line_segments(
                img, min_line_length, capacity=cfg.line_capacity,
                n_dirs=cfg.lsd_n_dirs, ang_th_deg=cfg.lsd_ang_th,
                quant=cfg.lsd_quant, density_th=cfg.lsd_density_th,
                log_eps=(cfg.lsd_log_eps if cfg.lsd_refine >= 2 else -1.0))
        gx, gy = sobel(img)
        ldesc = _lbd_two_bucket(gx, gy, segs, cfg)
        ds = _sample_depth(depth, segs.sp)
        de = _sample_depth(depth, segs.ep)
        ok_d = ((ds > cfg.rgbd_min_depth) & (ds < cfg.rgbd_max_depth)
                & (de > cfg.rgbd_min_depth) & (de < cfg.rgbd_max_depth))
        disp_s = cam.fx * cam.b / jnp.where(ok_d, ds, 1.0)
        disp_e = cam.fx * cam.b / jnp.where(ok_d, de, 1.0)
        ok = (segs.valid & ok_d & (disp_s >= cfg.min_disp)
              & (disp_e >= cfg.min_disp))
        sP = cam_ops.back_project(cam, segs.sp, jnp.where(ok, disp_s, 1.0))
        eP = cam_ops.back_project(cam, segs.ep, jnp.where(ok, disp_e, 1.0))
        le = _line_coeffs(segs.sp, segs.ep)
        dtype = segs.sp.dtype
        lines = LineSet(
            spl=segs.sp, epl=segs.ep,
            sdisp=jnp.where(ok, disp_s, 0.0),
            edisp=jnp.where(ok, disp_e, 0.0),
            sP=sP, eP=eP, le=le, angle=segs.angle, desc=ldesc,
            level=jnp.zeros(segs.sp.shape[0], jnp.int32),
            sigma2=jnp.ones(segs.sp.shape[0], dtype), valid=ok)
    else:
        lines = empty_lines(cfg.line_capacity)
    return FrameFeatures(points=points, lines=lines)
