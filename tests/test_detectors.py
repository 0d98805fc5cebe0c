"""Detectors: FAST corners and dense line segments on synthetic images,
with cv2 as oracle where available (oracle ONLY — never in the compute path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.ops import fast as fast_ops
from stvo_pl_tpu.ops import lsd as lsd_ops
from stvo_pl_tpu.ops import orb as orb_ops


def corner_image(rng, n=25, size=160):
    """Random bright blobs on a dark background -> strong FAST corners."""
    img = np.full((size, size), 30.0, np.float32)
    pts = rng.uniform(20, size - 20, (n, 2))
    for x, y in pts:
        xi, yi = int(x), int(y)
        img[yi - 2:yi + 3, xi - 2:xi + 3] = 200.0
    return img, pts


def test_fast_detects_blob_corners(rng):
    img, pts = corner_image(rng)
    score = fast_ops.fast_score(jnp.asarray(img), jnp.float32(20.0))
    uv, sc, valid = fast_ops.select_keypoints(score, capacity=100, edge=8)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= len(pts) * 0.8
    # every detection is near a planted blob (corners sit at blob corners,
    # within ~4 px of the center)
    d = np.linalg.norm(uv[:, None] - pts[None, :, :], axis=-1).min(1)
    assert (d < 5.0).mean() > 0.9


def test_fast_threshold_monotone(rng):
    img, _ = corner_image(rng)
    s_lo = fast_ops.fast_score(jnp.asarray(img), jnp.float32(10.0))
    s_hi = fast_ops.fast_score(jnp.asarray(img), jnp.float32(60.0))
    assert int((np.asarray(s_hi) > 0).sum()) <= int((np.asarray(s_lo) > 0).sum())


def test_fast_vs_cv2_oracle(rng):
    cv2 = pytest.importorskip("cv2")
    img, _ = corner_image(rng, n=40)
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img.astype(np.uint8))
    ref = np.array([k.pt for k in kps]) if kps else np.zeros((0, 2))
    score = fast_ops.fast_score(jnp.asarray(img), jnp.float32(20.0))
    uv, _, valid = fast_ops.select_keypoints(score, capacity=200, edge=3,
                                             cell=1)
    ours = np.asarray(uv)[np.asarray(valid)]
    # recall: most cv2 corners have one of ours within 2 px
    if len(ref):
        d = np.linalg.norm(ref[:, None] - ours[None], axis=-1).min(1)
        assert (d <= 2.0).mean() > 0.8, (len(ref), len(ours))


def test_orb_descriptor_stability():
    """The descriptor of the same patch under a small shift stays close;
    different landmarks stay far.  Landmarks carry distinct random texture
    (identical blobs would — correctly — produce identical descriptors).
    Deterministic rng: the shared fixture is session-ordered."""
    rng = np.random.default_rng(42)
    size = 200
    img = np.full((size, size), 30.0, np.float32)
    pts = rng.uniform(30, size - 30, (12, 2))
    for x, y in pts:
        xi, yi = int(x), int(y)
        img[yi - 8:yi + 9, xi - 8:xi + 9] = rng.uniform(0, 255, (17, 17))
    from stvo_pl_tpu.ops.image import gaussian_blur
    imj = jnp.asarray(img)
    # descriptor samples the blurred image, like the real pipeline
    blur = gaussian_blur(imj, 2.0, radius=3)
    uv = jnp.asarray(pts.astype(np.float32))
    d1, _, _ = orb_ops.orient_and_describe(imj, blur, uv)
    d2, _, _ = orb_ops.orient_and_describe(imj, blur, uv + 0.4)
    from stvo_pl_tpu.ops import hamming
    D_same = np.diagonal(np.asarray(hamming.hamming_matrix_xla(d1, d2)))
    D_cross = np.asarray(hamming.hamming_matrix_xla(d1, d2))
    off_diag = D_cross[~np.eye(len(pts), dtype=bool)]
    # what matters for NNR matching is separation: the true match must be
    # far closer than any impostor
    assert D_same.mean() < 45, D_same
    assert off_diag.mean() > 2.5 * max(D_same.mean(), 8.0), (
        D_same.mean(), off_diag.mean())


def line_image(segs, size=(120, 160)):
    """Render bright anti-aliased segments."""
    H, W = size
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 25.0)
    for (x1, y1, x2, y2) in segs:
        d = np.array([x2 - x1, y2 - y1])
        L2 = (d ** 2).sum()
        t = np.clip(((xx - x1) * d[0] + (yy - y1) * d[1]) / L2, 0, 1)
        px = x1 + t * d[0]
        py = y1 + t * d[1]
        dist2 = (xx - px) ** 2 + (yy - py) ** 2
        img += 170.0 * np.exp(-dist2 / (2 * 0.8 ** 2))
    return np.clip(img, 0, 255).astype(np.float32)


def seg_endpoint_error(found_sp, found_ep, true_seg):
    x1, y1, x2, y2 = true_seg
    a = np.array([x1, y1])
    b = np.array([x2, y2])
    d1 = np.linalg.norm(found_sp - a) + np.linalg.norm(found_ep - b)
    d2 = np.linalg.norm(found_sp - b) + np.linalg.norm(found_ep - a)
    return min(d1, d2) / 2.0


def test_lsd_finds_planted_segments():
    segs = [(20, 20, 120, 30),     # shallow
            (30, 100, 140, 60),    # oblique
            (80, 10, 85, 110),     # near vertical
            (10, 60, 60, 110)]     # diagonal
    img = line_image(segs)
    out = lsd_ops.detect_line_segments(jnp.asarray(img), min_length=25.0,
                                       capacity=16, n_dirs=12, k_per_dir=16)
    sp = np.asarray(out.sp)[np.asarray(out.valid)]
    ep = np.asarray(out.ep)[np.asarray(out.valid)]
    assert len(sp) >= len(segs), f"found {len(sp)} segments"
    for seg in segs:
        errs = [seg_endpoint_error(s, e, seg) for s, e in zip(sp, ep)]
        assert min(errs) < 6.0, (seg, min(errs))


def test_lsd_angle_accuracy():
    # angle accuracy drives the VO line residual; off-bin angles must be
    # recovered by the refinement far better than the 15-deg bin spacing
    segs = [(20, 30, 130, 62)]   # ~16.2 deg
    img = line_image(segs)
    out = lsd_ops.detect_line_segments(jnp.asarray(img), min_length=40.0,
                                       capacity=8, n_dirs=12, k_per_dir=16)
    v = np.asarray(out.valid)
    assert v.any()
    best = np.argmax(np.asarray(out.length) * v)
    ang = np.degrees(float(out.angle[best])) % 180.0
    true_ang = np.degrees(np.arctan2(32, 110)) % 180.0
    diff = min(abs(ang - true_ang), 180 - abs(ang - true_ang))
    assert diff < 2.0, (ang, true_ang)


def test_lsd_empty_image():
    img = jnp.full((100, 120), 50.0, jnp.float32)
    out = lsd_ops.detect_line_segments(img, min_length=20.0, capacity=8,
                                       n_dirs=8, k_per_dir=8)
    assert not bool(np.asarray(out.valid).any())


def test_lsd_nfa_validation():
    """log_eps >= 0 turns on the a-contrario NFA gate (the reference's
    advanced-refinement validation): planted structure must survive it,
    while pure-noise detections are suppressed."""
    segs = [(20, 20, 120, 30), (80, 10, 85, 110)]
    img = line_image(segs)
    out = lsd_ops.detect_line_segments(jnp.asarray(img), min_length=25.0,
                                       capacity=16, n_dirs=12, k_per_dir=16,
                                       log_eps=1.0)
    sp = np.asarray(out.sp)[np.asarray(out.valid)]
    ep = np.asarray(out.ep)[np.asarray(out.valid)]
    assert len(sp) >= len(segs)
    for seg in segs:
        errs = [seg_endpoint_error(s, e, seg) for s, e in zip(sp, ep)]
        assert min(errs) < 6.0, (seg, min(errs))

    rng = np.random.default_rng(3)
    noise = rng.uniform(0, 255, (128, 160)).astype(np.float32)
    base = lsd_ops.detect_line_segments(jnp.asarray(noise), min_length=20.0,
                                        capacity=16, n_dirs=12, k_per_dir=16)
    gated = lsd_ops.detect_line_segments(jnp.asarray(noise), min_length=20.0,
                                         capacity=16, n_dirs=12, k_per_dir=16,
                                         log_eps=1.0)
    n_base = int(np.asarray(base.valid).sum())
    n_gated = int(np.asarray(gated.valid).sum())
    assert n_gated <= n_base
    assert n_gated <= 2, f"NFA gate kept {n_gated} noise detections"


def test_lsd_scale_maps_back_to_source_frame():
    """lsd_scale != 1 must detect on the resampled image and report
    endpoints/lengths in SOURCE pixel coordinates (cv::LSD rescales its
    output; opts.scale flows from reference src/stereoFrame.cpp:222).
    Covers up- and down-sampling plus the non-integer 1.2 default."""
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models.frame import detect_lines_scaled

    segs = [(20, 20, 120, 30), (30, 100, 140, 60), (80, 10, 85, 110)]
    img = jnp.asarray(line_image(segs))
    H, W = img.shape
    for scale in (0.8, 1.2, 2.0):
        cfg = VOConfig(lsd_nfeatures=16, lsd_n_dirs=12, lsd_scale=scale)
        out = detect_lines_scaled(img, 25.0, cfg)
        v = np.asarray(out.valid)
        sp = np.asarray(out.sp)[v]
        ep = np.asarray(out.ep)[v]
        ln = np.asarray(out.length)[v]
        assert v.sum() >= len(segs), (scale, v.sum())
        assert (sp >= -0.5).all() and (ep >= -0.5).all()
        assert (sp[:, 0] <= W - 1).all() and (sp[:, 1] <= H - 1).all()
        # Each planted segment must have a detection lying ON it in the
        # SOURCE frame: angle within 8 deg, midpoint within 4 px of the
        # infinite line, length 0.4-1.3x the planted length.  (Detections
        # at higher scales may fragment; unrescaled coordinates/lengths
        # would blow every one of these gates.)
        for (x1, y1, x2, y2) in segs:
            d = np.array([x2 - x1, y2 - y1], np.float64)
            L = np.hypot(*d)
            n = np.array([-d[1], d[0]]) / L
            found = False
            for s, e, l in zip(sp, ep, ln):
                mid = 0.5 * (s + e)
                ang_det = np.degrees(np.arctan2(*(e - s)[::-1])) % 180.0
                ang_true = np.degrees(np.arctan2(d[1], d[0])) % 180.0
                dang = min(abs(ang_det - ang_true),
                           180.0 - abs(ang_det - ang_true))
                off = abs(np.dot(mid - np.array([x1, y1]), n))
                if dang < 8.0 and off < 4.0 and 0.4 * L < l < 1.3 * L:
                    found = True
                    break
            assert found, (scale, (x1, y1, x2, y2))


def test_harris_scoring_path(rng):
    """orb_score=0 (HARRIS_SCORE, src/config.cpp:100): detection stays
    FAST, ranking swaps to the Harris response."""
    img, pts = corner_image(rng, n=30)
    uv, sc, valid = fast_ops.detect_keypoints(
        jnp.asarray(img), jnp.float32(20.0), capacity=100, edge=8,
        score_type=0)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= len(pts) * 0.8
    d = np.linalg.norm(uv[:, None] - pts[None, :, :], axis=-1).min(1)
    assert (d < 5.0).mean() > 0.9
    # Harris ranking must actually differ from FAST ranking on real texture
    uvf, scf, vf = fast_ops.detect_keypoints(
        jnp.asarray(img), jnp.float32(20.0), capacity=100, edge=8,
        score_type=1)
    assert not np.allclose(np.asarray(sc)[np.asarray(valid)],
                           np.asarray(scf)[np.asarray(vf)][:valid.sum()])


def test_harris_score_vs_cv2_oracle(rng):
    """Harris response map ranks corners consistently with cv2."""
    cv2 = pytest.importorskip("cv2")
    img, _ = corner_image(rng, n=40)
    ours = np.asarray(fast_ops.harris_score(jnp.asarray(img)))
    ref = cv2.cornerHarris(img.astype(np.float32), blockSize=7, ksize=3,
                           k=0.04)
    # compare rankings at strong-corner pixels (different Sobel/window
    # normalizations -> compare order, not magnitude)
    mask = ref > 0.01 * ref.max()
    a = ours[mask]
    b = ref[mask]
    rank_a = np.argsort(np.argsort(a))
    rank_b = np.argsort(np.argsort(b))
    n = len(a)
    corr = np.corrcoef(rank_a, rank_b)[0, 1]
    assert n > 50 and corr > 0.8


def test_patch_size_changes_descriptor(rng):
    img, _ = corner_image(rng, n=30)
    from stvo_pl_tpu.ops.image import gaussian_blur
    im = jnp.asarray(img)
    blur = gaussian_blur(im, 2.0, radius=3)
    score = fast_ops.fast_score(im, jnp.float32(20.0))
    uv, _, valid = fast_ops.select_keypoints(score, capacity=60, edge=18)
    d31, _, _ = orb_ops.orient_and_describe(im, blur, uv, patch_size=31)
    d15, _, _ = orb_ops.orient_and_describe(im, blur, uv, patch_size=15)
    v = np.asarray(valid)
    assert not np.array_equal(np.asarray(d31)[v], np.asarray(d15)[v])


def test_inert_key_warnings():
    import warnings
    from stvo_pl_tpu.config import config_from_mapping
    # orb_wta_k 3/4 are real modes since round 3; out-of-range rejects
    with pytest.raises(ValueError):
        config_from_mapping({"orb_wta_k": 5})
    assert config_from_mapping({"orb_wta_k": 4}).orb_wta_k == 4
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        config_from_mapping({"orb_patch_size": 63})
        assert any("orb_patch_size" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        config_from_mapping({"lsd_right_lite": True, "lsd_octaves": 2})
        assert any("lsd_right_lite" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        # single-octave dense mode: right_lite is a real knob, no warning
        # (under the octave DEFAULT it is inert and must warn — above)
        config_from_mapping({"lsd_right_lite": True, "lsd_octaves": 1})
        assert not any("lsd_right_lite" in str(x.message) for x in w)


def _wta_naive(patch, pattern, wta_k):
    """Scalar-gather oracle for one unrotated patch: 2-bit argmax cells."""
    vals = np.zeros((pattern.shape[0], wta_k))
    for c in range(pattern.shape[0]):
        for t in range(wta_k):
            x = int(np.clip(round(pattern[c, t, 0] + orb_ops.PATCH_R),
                            0, orb_ops.PATCH - 1))
            y = int(np.clip(round(pattern[c, t, 1] + orb_ops.PATCH_R),
                            0, orb_ops.PATCH - 1))
            vals[c, t] = patch[y, x]
    return np.argmax(vals, axis=1)


def test_wta_descriptor_matches_naive_oracle(rng):
    """describe_wta's matmul sampling + packing equals per-cell scalar
    gathers at orientation 0 (bin 0)."""
    for wta_k in (3, 4):
        patch = rng.uniform(0, 255, (1, orb_ops.PATCH, orb_ops.PATCH)
                            ).astype(np.float32)
        desc = np.asarray(orb_ops.describe_wta(
            jnp.asarray(patch), jnp.ones((1,)), jnp.zeros((1,)), wta_k))
        # unpack 2-bit cells
        cells = []
        for w in range(8):
            for s in range(16):
                cells.append((int(desc[0, w]) >> (2 * s)) & 3)
        cells = np.array(cells)
        expect = _wta_naive(patch[0], orb_ops._make_wta_pattern(31, wta_k),
                            wta_k)
        agree = (cells == expect).mean()
        # bf16 sampling can flip near-tie cells; require near-exact
        assert agree > 0.95, (wta_k, agree)


def test_hamming2_mxu_equals_xla(rng):
    from stvo_pl_tpu.ops import hamming
    d1 = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2 ** 32, (48, 8), dtype=np.uint32))
    a = np.asarray(hamming.hamming2_matrix_mxu(d1, d2))
    b = np.asarray(hamming.hamming2_matrix_xla(d1, d2))
    assert np.array_equal(a, b)
    # identical descriptors -> distance 0; all-cells-differ -> 128
    assert np.asarray(hamming.hamming2_matrix_xla(d1, d1)).diagonal().max() == 0
    x = jnp.zeros((1, 8), jnp.uint32)
    y = jnp.full((1, 8), 0x55555555, jnp.uint32)
    assert int(hamming.hamming2_matrix_xla(x, y)[0, 0]) == 128


def test_wta_descriptor_rotation_stability():
    """WTA_K=3 descriptors must match across an in-plane rotation (the
    binned rotated sampling matrix does its job like the WTA_K=2 path)."""
    rng = np.random.default_rng(5)
    img, _ = corner_image(rng, n=35)
    from stvo_pl_tpu.ops import hamming
    from stvo_pl_tpu.ops.image import gaussian_blur
    import scipy.ndimage as ndi
    deg = 20.0
    rot = ndi.rotate(img, deg, reshape=False, order=1, mode="nearest")
    im0, im1 = jnp.asarray(img), jnp.asarray(rot.astype(np.float32))
    H, W = img.shape
    c = np.array([(W - 1) / 2.0, (H - 1) / 2.0])
    th = np.radians(deg)
    R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])

    score = fast_ops.fast_score(im0, jnp.float32(20.0))
    uv0, _, v0 = fast_ops.select_keypoints(score, capacity=80, edge=20)
    uv0n = np.asarray(uv0)
    # ndi.rotate maps output coords by R^-1 about the center; keypoint in
    # the rotated image sits at R @ (p - c) + c
    uv1n = (uv0n - c) @ R.T + c
    keep = (np.asarray(v0) & (uv1n[:, 0] > 20) & (uv1n[:, 0] < W - 20)
            & (uv1n[:, 1] > 20) & (uv1n[:, 1] < H - 20))
    b0 = gaussian_blur(im0, 2.0, radius=3)
    b1 = gaussian_blur(im1, 2.0, radius=3)
    p0 = orb_ops.gather_patches(b0, jnp.asarray(uv0n))
    p1 = orb_ops.gather_patches(b1, jnp.asarray(uv1n.astype(np.float32)))
    c0, s0 = orb_ops.orientation(p0)
    c1, s1 = orb_ops.orientation(p1)
    d0 = orb_ops.describe_wta(p0, c0, s0, 3)
    d1 = orb_ops.describe_wta(p1, c1, s1, 3)
    dist = np.asarray(hamming.hamming2_matrix_xla(d0, d1))
    self_d = dist.diagonal()[keep]
    rand_d = dist[keep][:, ~keep].mean() if (~keep).any() else 64.0
    # same physical corner must be far closer than random pairs
    assert self_d.mean() < 0.6 * rand_d, (self_d.mean(), rand_d)


def test_lbd_atlas_matches_plain_lbd(rng):
    """compute_lbd_atlas with a single-plane atlas (x_off=0, full clip
    bounds) must reproduce compute_lbd bit-for-bit — the octave path's
    descriptor source is the same math, only the gather is atlas-indexed."""
    from stvo_pl_tpu.ops import lbd
    from stvo_pl_tpu.ops.image import sobel

    img = rng.normal(80, 30, (120, 160)).astype(np.float32)
    gx, gy = sobel(jnp.asarray(img))
    sp = jnp.asarray(rng.uniform(10, 100, (24, 2)).astype(np.float32))
    ep = sp + jnp.asarray(rng.uniform(-40, 40, (24, 2)).astype(np.float32))
    _, d_plain = lbd.compute_lbd(gx, gy, sp, ep)
    g2 = jnp.stack([gx, gy], axis=-1)
    K = sp.shape[0]
    zeros = jnp.zeros((K,), jnp.int32)
    _, d_atlas = lbd.compute_lbd_atlas(
        g2, sp, ep, zeros, zeros, jnp.full((K,), 160 - 1, jnp.int32),
        jnp.full((K,), 120 - 1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(d_plain), np.asarray(d_atlas))


def test_multi_octave_atlas_detection():
    """One-pass atlas detect_lines_octaves: (a) solid strokes survive from
    the FINE octave (dedup kills their coarser duplicates — in-octave
    length ranking), (b) a dashed line only the AA half-res octave sees as
    continuous is recovered as one long coarse-octave segment, (c) level-0
    endpoints stay inside the source image, and (d) every valid line gets
    a non-zero descriptor from its own octave's Sobel plane."""
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models import frame as frame_mod

    img = np.full((180, 240), 40.0, np.float32)
    for y in (30, 60, 150):
        img[y:y + 2, 20:220] = 220.0          # solid strokes: octave 0
    for x in (40, 200):
        img[20:160, x:x + 2] = 220.0
    for x0 in range(20, 216, 11):
        img[100:102, x0:x0 + 8] = 220.0       # dashed: continuous at oct 1
    cfg = VOConfig(lsd_nfeatures=32, lsd_n_dirs=8, lsd_octaves=2)
    segs, octv, desc = frame_mod.detect_lines_octaves(
        jnp.asarray(img), 0.025 * 180, cfg)
    v = np.asarray(segs.valid)
    o = np.asarray(octv)
    sp = np.asarray(segs.sp)
    ep = np.asarray(segs.ep)
    assert v.sum() > 4, v.sum()
    assert (v & (o == 0)).sum() > 0, "no fine-octave lines"
    # the dashed row must be recovered as a LONG segment near y=100, and
    # only the coarse octave can see it whole
    near_dash = v & (np.abs(sp[:, 1] - 100.5) < 4) \
        & (np.abs(ep[:, 1] - 100.5) < 4)
    dash_len = np.linalg.norm((ep - sp)[near_dash], axis=-1)
    assert near_dash.any() and dash_len.max() > 100, dash_len
    assert (o[near_dash][dash_len > 100] >= 1).all(), o[near_dash]
    for p in (sp[v], ep[v]):
        assert (p[:, 0] >= 0).all() and (p[:, 0] <= 239).all()
        assert (p[:, 1] >= 0).all() and (p[:, 1] <= 179).all()
    d = np.asarray(desc)[v]
    assert (d.sum(axis=1) != 0).all(), "zero descriptor for a valid line"
