"""Sub-pixel localization: the FAST-response parabola tracks known
sub-pixel image translations; photometric disparity refinement recovers a
known fractional stereo shift; the full stereo front end's disparities
sharpen with the refinements on (vs off)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from stvo_pl_tpu.ops import fast as fast_ops
from stvo_pl_tpu.ops import subpix


def _texture_image(seed=3, H=200, W=200):
    rng = np.random.default_rng(seed)
    return gaussian_filter(rng.normal(128.0, 45.0, (H, W)), 1.5)


def test_fast_parabola_tracks_subpixel_translation():
    """At detected FAST corners, (refined - refined_base) must track the
    true sub-pixel translation much better than integer positions do."""
    img0 = _texture_image()
    th = jnp.float32(10.0)
    sc0 = fast_ops.fast_score(jnp.asarray(img0, jnp.float32), th)
    uv0, _, v0 = fast_ops.select_keypoints(sc0, 200, edge=20, cell=4,
                                           offset_src=sc0)
    uv0 = np.asarray(uv0)[np.asarray(v0)]
    anchors = np.round(uv0).astype(int)

    errs = []
    for s in (-0.4, -0.2, 0.2, 0.4):
        ims = ndshift(img0, (0.0, s), order=3)
        scs = np.asarray(fast_ops.fast_score(jnp.asarray(ims, jnp.float32),
                                             th))
        ox, oy = fast_ops.subpix_offset_maps(jnp.asarray(scs))
        ox = np.asarray(ox)
        # evaluate the refined x at the same integer anchors
        d = (anchors[:, 0] + ox[anchors[:, 1], anchors[:, 0]]) - uv0[:, 0]
        errs.append(np.sqrt(np.mean((d - s) ** 2)))
    rms = float(np.mean(errs))
    assert rms < 0.22, rms        # unrefined RMS would be 0.30


@pytest.mark.parametrize("s", [-0.4, -0.15, 0.0, 0.25, 0.45])
def test_disparity_shift_recovers_fractional_shift(s):
    Q = 13
    c = (Q - 1) // 2
    w = np.arange(Q, dtype=np.float64) - c
    wx, wy = np.meshgrid(w, w, indexing="xy")

    def texture(xs, ys):
        return (128.0 + 40.0 * np.sin(0.83 * xs + 0.31 * ys)
                + 30.0 * np.cos(0.47 * xs - 0.59 * ys))

    patch_l = texture(wx, wy).astype(np.float32)[None]
    # right patch content displaced by s: R[w] = L[w + s]
    patch_r = texture(wx + s, wy).astype(np.float32)[None]
    shift, ok = subpix.disparity_shift(jnp.asarray(patch_l),
                                       jnp.asarray(patch_r))
    assert bool(ok[0])
    # SSD minimized at dx = -s (see docstring derivation)
    assert abs(float(shift[0]) - (-s)) < 0.08, (float(shift[0]), s)


def test_disparity_shift_flat_patch_not_ok():
    flat = jnp.full((2, 13, 13), 99.0, jnp.float32)
    shift, ok = subpix.disparity_shift(flat, flat)
    assert not bool(ok[0])
    assert float(shift[0]) == 0.0


def test_front_end_disparity_sharpens_with_subpix():
    """Stereo pair = one textured image and a pure sub-pixel-translated
    copy (constant true disparity): the refined front end's matched
    disparities must cluster tighter around the truth than integer
    differencing."""
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models.frame import extract_stereo_features
    from stvo_pl_tpu.ops.camera import StereoCamera

    H, W = 160, 224
    img_l = _texture_image(seed=7, H=H, W=W)
    true_disp = 7.3
    img_r = ndshift(img_l, (0.0, -true_disp), order=3, mode="nearest")
    img_l = jnp.asarray(img_l, jnp.float32)
    img_r = jnp.asarray(img_r, jnp.float32)
    cam = StereoCamera(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, b=0.5,
                      width=W, height=H)

    errs = {}
    for flag in (False, True):
        cfg = VOConfig(orb_nfeatures=200, orb_nlevels=1, has_lines=False,
                       subpix_points=flag, subpix_disp=flag,
                       max_dist_epip=1.5)
        feats = extract_stereo_features(img_l, img_r, jnp.float32(7.0),
                                        jnp.float32(0.05), cam, cfg)
        v = np.asarray(feats.points.valid)
        d = np.asarray(feats.points.disp)[v]
        assert v.sum() >= 20, f"too few matches ({v.sum()}) subpix={flag}"
        errs[flag] = np.sqrt(np.mean((d - true_disp) ** 2))
    # refined disparities must be at least 25% tighter
    assert errs[True] < 0.75 * errs[False], errs
    assert errs[True] < 0.25, errs
