"""Oriented binary point descriptors (ORB-equivalent).

Replaces cv::ORB's orientation + rBRIEF stages (reference consumes them at
src/stereoFrame.cpp:112-115).  Design:

  * patches are gathered once per keypoint ([K, P, P] from the level image),
    then orientation (intensity centroid, circular mask) and the rotated
    256-pair binary test pattern are pure register-level vector math;
  * the sampling pattern is NOT OpenCV's learned pattern — it is generated
    deterministically (seeded Gaussian pairs, sigma = patch/5, clipped to the
    rotation-safe radius).  Descriptors only need to be *internally*
    consistent (stereo L<->R and f2f matching both use this descriptor);
    parity with the reference is at trajectory level (SURVEY.md §7).
  * bilinear sampling of rotated test points makes descriptors stable under
    the continuous orientation estimate.

Output format: [K, 8] uint32 = 256 bits, the reference's descriptor width
(32 bytes, src/matching.cpp:97-101).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

PATCH_R = 16          # gathered patch radius -> 33x33 patches
PATCH = 2 * PATCH_R + 1
ORI_R = 15            # intensity-centroid radius (OpenCV HARRIS_BLOCK-ish)
PATTERN_R = 13.0      # max test-point radius (rotation-safe inside PATCH_R-2)
N_BITS = 256


def _make_pattern(seed: int = 8861) -> np.ndarray:
    """[256, 2, 2] float32 (pair, point, (dx, dy)) Gaussian BRIEF pattern."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_R / np.maximum(r, 1e-9))
    return (pts * scale).astype(np.float32)


PATTERN = _make_pattern()


def _circular_mask(radius: int, size: int) -> np.ndarray:
    c = (size - 1) / 2.0
    y, x = np.mgrid[0:size, 0:size]
    return (((x - c) ** 2 + (y - c) ** 2) <= radius ** 2).astype(np.float32)


_ORI_MASK = _circular_mask(ORI_R, PATCH)
_ORI_X = ((np.mgrid[0:PATCH, 0:PATCH][1] - PATCH_R) * _ORI_MASK).astype(np.float32)
_ORI_Y = ((np.mgrid[0:PATCH, 0:PATCH][0] - PATCH_R) * _ORI_MASK).astype(np.float32)


def gather_patches(img: jnp.ndarray, uv: jnp.ndarray,
                   radius: int = PATCH_R) -> jnp.ndarray:
    """[H, W] x [K, 2] -> [K, 2r+1, 2r+1] integer-centered patches."""
    H, W = img.shape
    x0 = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), radius, W - 1 - radius)
    y0 = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), radius, H - 1 - radius)
    dy = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    yy = y0[:, None, None] + dy[None, :, None]
    xx = x0[:, None, None] + dx[None, None, :]
    return img[yy, xx]


def orientation(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intensity-centroid orientation per patch -> (cos, sin) [K]."""
    mx = jnp.asarray(_ORI_X, patches.dtype)
    my = jnp.asarray(_ORI_Y, patches.dtype)
    m10 = jnp.sum(patches * mx, axis=(-2, -1))
    m01 = jnp.sum(patches * my, axis=(-2, -1))
    norm = jnp.sqrt(m10 * m10 + m01 * m01)
    safe = norm > 1e-6
    c = jnp.where(safe, m10 / jnp.maximum(norm, 1e-6), 1.0)
    s = jnp.where(safe, m01 / jnp.maximum(norm, 1e-6), 0.0)
    return c, s


def _nearest_patch_sample(patches: jnp.ndarray, x: jnp.ndarray,
                          y: jnp.ndarray) -> jnp.ndarray:
    """Sample [K, P, P] patches at continuous coords x, y [K, S] (nearest).

    OpenCV's rBRIEF also rounds the rotated test points to integer pixels
    (cvRound in the pattern sampler); 1-tap sampling keeps the gather count
    4x lower than bilinear, which matters — TPU gathers are ~1 elem/cycle.
    """
    xi = jnp.clip(jnp.round(x), 0.0, PATCH - 1.0).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0.0, PATCH - 1.0).astype(jnp.int32)
    k = jnp.arange(patches.shape[0])[:, None]
    return patches[k, yi, xi]


def describe(patches: jnp.ndarray, cos_t: jnp.ndarray,
             sin_t: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF descriptors: [K, P, P] patches -> [K, 8] uint32."""
    pat = jnp.asarray(PATTERN, patches.dtype)        # [256, 2, 2]
    px = pat[..., 0].reshape(-1)                     # [512]
    py = pat[..., 1].reshape(-1)
    # rotate pattern by keypoint orientation
    rx = cos_t[:, None] * px[None] - sin_t[:, None] * py[None] + PATCH_R
    ry = sin_t[:, None] * px[None] + cos_t[:, None] * py[None] + PATCH_R
    samples = _nearest_patch_sample(patches, rx, ry)  # [K, 512]
    s = samples.reshape(samples.shape[0], N_BITS, 2)
    bits = (s[..., 0] < s[..., 1]).astype(jnp.uint32)  # [K, 256]
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=())
def orient_and_describe(img: jnp.ndarray, img_blur: jnp.ndarray,
                        uv: jnp.ndarray):
    """Full per-level descriptor pass.

    uv: [K, 2] level coords.  Returns (desc [K, 8] uint32, cos, sin).

    One patch gather per keypoint: both the intensity-centroid orientation
    and the binary tests read the blurred patch (OpenCV blurs only for the
    tests, but the centroid of a sigma=2-blurred patch is the blurred
    centroid — identical angle up to boundary effects — and skipping the
    second gather halves the dominant memory cost).
    """
    del img  # orientation shares the blurred patch
    p = gather_patches(img_blur, uv)
    c, s = orientation(p)
    desc = describe(p, c, s)
    return desc, c, s
