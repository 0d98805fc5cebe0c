"""Sub-pixel localization for point features.

The reference gets sub-pixel point geometry indirectly: cv::ORB reports
keypoints at `integer * scale^level` coordinates and LSD contributes
region-centroid line endpoints (reference src/stereoFrame.cpp:112-115,
3rdparty/line_descriptor/src/LSDDetector_custom.cpp:266-308).  Our FAST
corners would otherwise land on integer pixels and coarse levels multiply
that rounding by scale^level, which disparity (hence depth) inherits.
Two refinements close that gap and go past the reference:

  * corner refinement — a parabola fit on the 3x3 FAST-response
    neighborhood, fused INTO the detection (ops/fast_kernel.py packs
    quantized offsets into the corner word; ops/fast.py subpix_offset_maps
    is the XLA-path equivalent).  Measured on natural texture: RMS
    sub-pixel tracking error 0.30 -> 0.12-0.18 px.  (A Foerstner /
    cv::cornerSubPix gradient solve was tried first and measured WORSE
    than no refinement at FAST corners — blob-like neighborhoods violate
    its two-edge corner model; see BASELINE.md tried-and-rejected.)

  * `disparity_shift` (here) — photometric stereo alignment: SSD between
    the left patch and the right patch shifted by dx in {-1, 0, +1} along
    the (rectified) epipolar row, then a 1-D parabola gives the fractional
    alignment.  Applied per matched pair when both corners live on the
    same pyramid level (patch scales must agree); reuses the blurred ORB
    patches already gathered for description, so it costs no new gathers.

Both are gated by VOConfig.subpix_points / subpix_disp (TPU-native
additions; the reference has no equivalent for points).
"""

from __future__ import annotations

import jax.numpy as jnp

SSD_R = 5           # photometric alignment window radius -> 11x11


def disparity_shift(patch_l: jnp.ndarray, patch_r: jnp.ndarray,
                    radius: int = SSD_R) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fractional epipolar alignment between matched stereo patches.

    patch_l, patch_r: [K, Q, Q] patches centered on the *integer* gather
    centers of the matched left/right corners, with Q >= 2*(radius+1)+1.
    Returns (shift [K], ok [K]): content of the right patch at x + shift
    aligns with the left patch center, i.e.

        disparity = (x_center_l - x_center_r) - shift        (level coords)

    Derivation: with L(x) = R(x - d) (rectified stereo), patch_l[w] =
    L(xc_l + w) and patch_r[w] = R(xc_r + w) = L(xc_r + w + d), so
    SSD(dx) = sum_w (patch_l[w] - patch_r[w + dx])^2 is minimized at
    dx* = (xc_l - xc_r) - d.

    shift = integer 0 (the match already aligned to +-1 px) plus a
    parabola fraction in (-0.5, 0.5) over dx in {-1, 0, +1}; ok=False when
    the SSD surface has no interior minimum (flat/ambiguous patch).
    """
    K, Q, _ = patch_l.shape
    c = (Q - 1) // 2
    r = radius
    lo, hi = c - r, c + r + 1
    l_win = patch_l[:, lo:hi, lo:hi].astype(jnp.float32)
    ssd = []
    for dx in (-1, 0, 1):
        r_win = patch_r[:, lo:hi, lo + dx:hi + dx].astype(jnp.float32)
        diff = l_win - r_win
        ssd.append(jnp.sum(diff * diff, axis=(-2, -1)))
    s_m, s_0, s_p = ssd
    # 1-D parabola through the three costs; minimum at
    # dx* = 0.5 (s_m - s_p) / (s_m - 2 s_0 + s_p)
    denom = s_m - 2.0 * s_0 + s_p
    ok = (denom > 1e-6) & (s_0 <= s_m) & (s_0 <= s_p)
    frac = 0.5 * (s_m - s_p) / jnp.where(ok, denom, 1.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    return jnp.where(ok, frac, 0.0), ok
