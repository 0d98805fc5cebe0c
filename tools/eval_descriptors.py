"""Descriptor quality on NATURAL texture: our FAST+rBRIEF and LSD+LBD vs
the cv2 implementations the reference consumes (cv::ORB at
src/stereoFrame.cpp:112-115, LSD at LSDDetector_custom.cpp:246-253).

Protocol (Oxford-style): real photographs on disk are warped by known
homographies (rotation / scale / perspective / photometric); a point match
is CORRECT when it lands within `tol` px of the homography-mapped
location.  Reports per-warp precision (correct/matched) and matches-per-
image for ours and cv2 under the SAME NNR+mutual matching rule
(min_ratio_12_p = 0.9, reference src/config.cpp:60).  Line detection is
scored by repeatability: fraction of detected segments in A whose warped
counterpart has a segment in B within endpoint distance + angle tolerance.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/eval_descriptors.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL_PX = 3.0
NNR = 0.9
N_FEATURES = 600


def warps(H_img, W_img):
    """Named homographies mapping image A -> image B coords."""
    cx, cy = W_img / 2.0, H_img / 2.0

    def around_center(M33):
        T = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float64)
        Ti = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], np.float64)
        return Ti @ M33 @ T

    rot15 = np.deg2rad(15.0)
    out = {
        "rot15": around_center(np.array(
            [[np.cos(rot15), -np.sin(rot15), 0],
             [np.sin(rot15), np.cos(rot15), 0], [0, 0, 1]])),
        "scale0.8": around_center(np.diag([0.8, 0.8, 1.0])),
        "persp": around_center(np.array(
            [[1.0, 0.05, 0], [0.02, 1.0, 0], [1.2e-4, 5e-5, 1.0]])),
        "bright": np.eye(3),   # photometric only (gain/bias below)
    }
    return out


PHOTOMETRIC = {"bright": (1.35, 18.0)}   # gain, bias for the "bright" warp


def apply_h(H, uv):
    p = np.concatenate([uv, np.ones((len(uv), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def detect_ours(img):
    import jax.numpy as jnp
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models import frame as frame_mod
    cfg = VOConfig(orb_nfeatures=N_FEATURES, orb_nlevels=2)
    det = frame_mod.detect_points_multilevel(
        jnp.asarray(img, jnp.float32), jnp.float32(20.0), cfg)
    v = np.asarray(det.valid)
    return np.asarray(det.uv)[v], np.asarray(det.desc)[v]


def match_ours(d1, d2):
    import jax.numpy as jnp
    from stvo_pl_tpu.ops import hamming, matching
    dist = hamming.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2), False)
    cand = jnp.ones(dist.shape, bool)
    res = matching.nnr_mutual_match(dist, cand, NNR, mutual=True)
    idx = np.asarray(res.idx)
    val = np.asarray(res.valid)
    return [(i, int(idx[i])) for i in range(len(idx)) if val[i]]


def detect_cv2(cv2, img):
    orb = cv2.ORB_create(N_FEATURES, 1.2, 2)
    kps, desc = orb.detectAndCompute(img.astype(np.uint8), None)
    if desc is None:
        return np.zeros((0, 2)), np.zeros((0, 32), np.uint8)
    return np.array([k.pt for k in kps]), desc


def match_cv2(cv2, d1, d2):
    """Same NNR + mutual rule as ours, on cv2 descriptors."""
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    def nnr_dict(da, db):
        out = {}
        for m in bf.knnMatch(da, db, k=2):
            if len(m) == 2 and m[0].distance < NNR * m[1].distance:
                out[m[0].queryIdx] = m[0].trainIdx
        return out
    f = nnr_dict(d1, d2)
    b = nnr_dict(d2, d1)
    return [(q, t) for q, t in f.items() if b.get(t, -1) == q]


def eval_points(cv2, img_a, img_b, H):
    rows = {}
    for name, (det, mat) in {
            "ours": (detect_ours, match_ours),
            "cv2": (lambda im: detect_cv2(cv2, im),
                    lambda a, b: match_cv2(cv2, a, b))}.items():
        uv1, d1 = det(img_a)
        uv2, d2 = det(img_b)
        if len(uv1) == 0 or len(uv2) == 0:
            rows[name] = (0, 0, 0.0)
            continue
        pairs = mat(d1, d2)
        gt2 = apply_h(H, uv1)
        correct = sum(1 for i, j in pairs
                      if np.linalg.norm(gt2[i] - uv2[j]) <= TOL_PX)
        prec = correct / max(1, len(pairs))
        rows[name] = (len(pairs), correct, prec)
    return rows


def detect_lines_ours(img):
    import jax.numpy as jnp
    from stvo_pl_tpu.ops import lsd
    segs = lsd.detect_line_segments(jnp.asarray(img, jnp.float32),
                                    jnp.float32(0.04 * min(img.shape)),
                                    capacity=128,
                                    log_eps=0.0)  # production default:
    # NFA always validates, like cv::LSD (models/frame.py round 4)
    v = np.asarray(segs.valid)
    return np.asarray(segs.sp)[v], np.asarray(segs.ep)[v]


def detect_lines_octaves3(img):
    """The lsd_octaves=3 one-pass atlas mode (models/frame.py
    detect_lines_octaves, round-5 rework)."""
    import jax.numpy as jnp
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models.frame import detect_lines_octaves
    import os
    cfg = VOConfig(lsd_nfeatures=128, lsd_octaves=3,
                   lsd_oct_n_dirs=int(os.environ.get("STVO_EVAL_NDIRS", "8")),
                   lsd_oct_pool=float(os.environ.get("STVO_EVAL_POOL",
                                                     "1.5")))
    segs, _, _ = detect_lines_octaves(jnp.asarray(img, jnp.float32),
                                      jnp.float32(0.04 * min(img.shape)),
                                      cfg)
    v = np.asarray(segs.valid)
    return np.asarray(segs.sp)[v], np.asarray(segs.ep)[v]


def detect_lines_edline(img):
    import jax.numpy as jnp
    from stvo_pl_tpu.ops import edline
    segs = edline.detect_edlines(jnp.asarray(img, jnp.float32),
                                 jnp.float32(0.04 * min(img.shape)),
                                 capacity=128)
    v = np.asarray(segs.valid)
    return np.asarray(segs.sp)[v], np.asarray(segs.ep)[v]


def detect_lines_edline2(img):
    """The edline_scale=2 quality mode (models/frame.py detect_one):
    AA half-res detection, no in-kernel pre-smooth, thresholds rescaled,
    endpoints mapped back by the half-pixel-center map."""
    import jax.numpy as jnp
    from stvo_pl_tpu.ops import edline
    from stvo_pl_tpu.ops.image import resize_bilinear
    im = jnp.asarray(img, jnp.float32)
    H0, W0 = im.shape
    det_im = resize_bilinear(im, H0 // 2, W0 // 2, blur_sigma=1.0)
    Hd, Wd = det_im.shape
    segs = edline.detect_edlines(
        det_im, jnp.float32(0.04 * min(img.shape) / 2), capacity=128,
        min_support=5, smooth_sigma=0.0,
        node_capacity=min(16384, max(2048, (Hd * Wd) // 14)))
    inv = jnp.asarray([W0 / Wd, H0 / Hd])
    to0 = lambda p: jnp.clip((p + 0.5) * inv - 0.5, jnp.zeros(2),
                             jnp.asarray([W0 - 1.0, H0 - 1.0]))
    sp, ep = to0(segs.sp), to0(segs.ep)
    v = np.asarray(segs.valid)
    return np.asarray(sp)[v], np.asarray(ep)[v]


def detect_lines_cv2(cv2, img):
    det = cv2.createLineSegmentDetector()
    out = det.detect(img.astype(np.uint8))[0]
    if out is None:
        return np.zeros((0, 2)), np.zeros((0, 2))
    out = out.reshape(-1, 4)
    ln = np.linalg.norm(out[:, 2:] - out[:, :2], axis=1)
    out = out[ln >= 0.04 * min(img.shape)]
    return out[:, :2], out[:, 2:]


def line_repeatability(sp1, ep1, sp2, ep2, H, tol=4.0, ang_tol=np.pi / 18):
    """Fraction of A-segments with a B-segment whose endpoints are within
    tol px of the warped endpoints (either orientation) and angle within
    ang_tol."""
    if len(sp1) == 0 or len(sp2) == 0:
        return 0.0, 0
    wsp = apply_h(H, sp1)
    wep = apply_h(H, ep1)
    ang2 = np.arctan2((ep2 - sp2)[:, 1], (ep2 - sp2)[:, 0]) % np.pi
    hits = 0
    for a, b in zip(wsp, wep):
        ang = np.arctan2(b[1] - a[1], b[0] - a[0]) % np.pi
        da = np.abs(ang2 - ang)
        da = np.minimum(da, np.pi - da)
        d_fwd = np.maximum(np.linalg.norm(sp2 - a, axis=1),
                           np.linalg.norm(ep2 - b, axis=1))
        d_bwd = np.maximum(np.linalg.norm(sp2 - b, axis=1),
                           np.linalg.norm(ep2 - a, axis=1))
        d = np.minimum(d_fwd, d_bwd)
        if np.any((d <= tol) & (da <= ang_tol)):
            hits += 1
    return hits / len(sp1), len(sp1)


def main():
    import cv2
    import jax
    # force CPU even under the axon site hook (JAX_PLATFORMS env is
    # silently ignored once the hook pre-imports jax — this eval must
    # never contend for the TPU chip; see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    from stvo_pl_tpu.utils.world import load_photos
    photos = [p for p in load_photos() if min(p.shape) >= 128]
    print(f"{len(photos)} real photos")
    results = {"points": {}, "lines": {}}
    for wname in ["rot15", "scale0.8", "persp", "bright"]:
        agg = {"ours": [0, 0], "cv2": [0, 0]}
        lrep = {"ours": [], "octaves3": [], "edline": [], "edline2": [],
                "cv2": []}
        for ph in photos:
            Hh = warps(*ph.shape)[wname]
            if wname in PHOTOMETRIC:
                g, b = PHOTOMETRIC[wname]
                img_b = np.clip(ph * g + b, 0, 255)
            else:
                img_b = cv2.warpPerspective(ph, Hh, ph.shape[::-1])
            rows = eval_points(cv2, ph, img_b, Hh)
            for k, (nm, nc, _) in rows.items():
                agg[k][0] += nm
                agg[k][1] += nc
            for k, det in {"ours": detect_lines_ours,
                           "octaves3": detect_lines_octaves3,
                           "edline": detect_lines_edline,
                           "edline2": detect_lines_edline2,
                           "cv2": lambda im: detect_lines_cv2(cv2, im)}.items():
                sp1, ep1 = det(ph)
                sp2, ep2 = det(img_b)
                rep, n = line_repeatability(sp1, ep1, sp2, ep2, Hh)
                if n:
                    lrep[k].append(rep)
        results["points"][wname] = {
            k: {"matches": v[0], "correct": v[1],
                "precision": round(v[1] / max(1, v[0]), 3)}
            for k, v in agg.items()}
        results["lines"][wname] = {
            k: round(float(np.mean(v)), 3) if v else None
            for k, v in lrep.items()}
        print(wname, json.dumps(results["points"][wname]),
              "line_rep", json.dumps(results["lines"][wname]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
