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
  * the rotated binary tests execute as ONE bf16 matmul against a static
    orientation-binned +/-1 test matrix (see describe()) — the whole
    descriptor stage rides the MXU.

Output format: [K, 8] uint32 = 256 bits, the reference's descriptor width
(32 bytes, src/matching.cpp:97-101).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

PATCH_R = 16          # gathered patch radius -> 33x33 patches.  NOTE: 15
                      # (31x31, the exact ORI_R support) looked free but
                      # regressed border keypoints: patch clipping shifts
                      # differently, and on small frames the border ring is
                      # ~30% of the area — it broke the stuck-overlay
                      # robustness e2e (tests/test_adversarial.py) while
                      # buying ~1% throughput.  Keep the 1-px margin.
PATCH = 2 * PATCH_R + 1
ORI_R = 15            # intensity-centroid radius (OpenCV HARRIS_BLOCK-ish)
PATTERN_R = 13.0      # max test-point radius (rotation-safe inside PATCH_R-2)
# NOTE: contracting only the center 27x27 slice (pattern reach is 13 px)
# would cut the describe matmul a further 25%, but slicing the gathered
# patches breaks the contiguous [K, P, P] -> [K, P*P] reshape and XLA's
# relayout copy costs far more than the saved FLOPs (measured 311 -> 262
# fps/chip).  The full PATCH grid keeps the reshape free.
N_BITS = 256


@functools.lru_cache(maxsize=8)
def _make_pattern(patch_size: int = 31, seed: int = 8861) -> np.ndarray:
    """[256, 2, 2] float32 (pair, point, (dx, dy)) Gaussian BRIEF pattern.

    orb_patch_size (src/config.cpp:101) sets the test-point spread exactly
    as in cv::ORB (pattern sigma = patch/5); points are clipped to the
    rotation-safe radius of the gathered 33x33 patch, which caps the
    effective patch at 2*PATTERN_R_MAX+1 = 27 px of reach per test point.
    """
    rng = np.random.default_rng(seed)
    sigma = patch_size / 5.0
    pattern_r = min(PATTERN_R, patch_size / 2.0 - 2.0)
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, pattern_r / np.maximum(r, 1e-9))
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
    """[H, W] x [K, 2] -> [K, 2r+1, 2r+1] integer-centered patches.

    On TPU this is a Pallas kernel (ops/patches.py) that stages the image
    in VMEM once and slices every patch on-chip: the vmapped-dynamic_slice
    alternative lowers to a sequential while-loop of per-patch HBM DMAs
    (~2.7 us/patch in the composed front end — was the single largest cost
    of the whole pipeline; the kernel does ~0.13 us/patch)."""
    H, W = img.shape
    P = 2 * radius + 1
    x0 = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32) - radius, 0,
                  W - P)
    y0 = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32) - radius, 0,
                  H - P)
    if jax.default_backend() == "tpu":
        from stvo_pl_tpu.ops.patches import extract_patches
        return extract_patches(img, y0, x0, patch=P)
    return jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(img, (y, x), (P, P)))(y0, x0)


def orientation(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intensity-centroid orientation per patch -> (cos, sin) [K]."""
    p = patches.astype(jnp.float32)  # f32 accumulation (patches may be bf16;
    mx = jnp.asarray(_ORI_X, p.dtype)  # the convert fuses into the reduce)
    my = jnp.asarray(_ORI_Y, p.dtype)
    m10 = jnp.sum(p * mx, axis=(-2, -1))
    m01 = jnp.sum(p * my, axis=(-2, -1))
    norm = jnp.sqrt(m10 * m10 + m01 * m01)
    safe = norm > 1e-6
    c = jnp.where(safe, m10 / jnp.maximum(norm, 1e-6), 1.0)
    s = jnp.where(safe, m01 / jnp.maximum(norm, 1e-6), 0.0)
    return c, s


N_ORI_BINS = 30  # OpenCV ORB also quantizes orientation (2*pi/30 steps)


@functools.lru_cache(maxsize=8)
def _binned_test_matrix(patch_size: int = 31) -> np.ndarray:
    """[P*P, N_ORI_BINS * 256] +/-1 difference matrix: column (b, c) has +1
    at the rotated position of test point 1 and -1 at test point 0 of bit c
    under orientation bin b.  A binary test s0 < s1 then becomes the sign of
    one matmul output — the whole rBRIEF sampling rides the MXU instead of
    ~K*512 scalar gathers."""
    D = np.zeros((PATCH * PATCH, N_ORI_BINS * N_BITS), np.float32)
    pattern = _make_pattern(patch_size)
    px = pattern[..., 0]   # [256, 2]
    py = pattern[..., 1]
    for b in range(N_ORI_BINS):
        th = 2.0 * np.pi * b / N_ORI_BINS
        c, s = np.cos(th), np.sin(th)
        rx = np.clip(np.round(c * px - s * py + PATCH_R), 0, PATCH - 1)
        ry = np.clip(np.round(s * px + c * py + PATCH_R), 0, PATCH - 1)
        idx = (ry * PATCH + rx).astype(np.int32)      # [256, 2]
        cols = b * N_BITS + np.arange(N_BITS)
        # bit = (sample0 < sample1) = (dot > 0) with +1 on point 1, -1 on 0
        np.add.at(D, (idx[:, 1], cols), 1.0)
        np.add.at(D, (idx[:, 0], cols), -1.0)
    return D


_TEST_MAT = _binned_test_matrix()


def orient_describe(patches: jnp.ndarray,
                    patch_size: int = 31) -> tuple[jnp.ndarray, jnp.ndarray,
                                                   jnp.ndarray]:
    """Quantized orientation + rotated-BRIEF: [K, P, P] -> (desc [K, 8]
    uint32, cos [K], sin [K]).

    The production descriptor path: patches are QUANTIZED to the uint8 grid
    before orientation and the binary tests.  This is an accuracy feature,
    not a compromise: blurred-patch values carry sub-LSB resampling noise
    that flips near-tie BRIEF tests between frames; snapping to the 0..255
    grid makes those bits deterministic.  Measured (bench.py, paired 8-lane
    means): ATE 0.0371 -> 0.0275 with 7 of 8 lanes improved, at unchanged
    throughput.  The matmul stays exact: rounded values (<= 255) and the
    +/-1 matrix entries have <= 8 significand bits, so bf16 MXU products
    accumulate exactly in f32.

    Two rejected formulations of the same bits (BASELINE.md): full int8
    operands (2x MAC rate but 8-bit relayouts cost 6% end-to-end) and
    fusing the orientation moments as two extra matmul columns (breaking
    the clean [K, 30*256] output layout forced a relayout, -12%)."""
    q = jnp.clip(jnp.round(patches.astype(jnp.float32)), 0.0, 255.0)
    cos_t, sin_t = orientation(q)
    desc = describe(q, cos_t, sin_t, patch_size=patch_size)
    return desc, cos_t, sin_t


def describe(patches: jnp.ndarray, cos_t: jnp.ndarray,
             sin_t: jnp.ndarray, patch_size: int = 31) -> jnp.ndarray:
    """Rotated-BRIEF descriptors: [K, P, P] patches -> [K, 8] uint32.

    Orientation is quantized to N_ORI_BINS (OpenCV ORB does the same,
    2*pi/30 steps), which turns the rotated test pattern into a static
    +/-1 matrix: diffs = patches_flat @ D -> [K, 30*256]; each keypoint
    slices its bin's 256 contiguous outputs and takes signs.  One bf16
    matmul replaces half a million scalar gathers per level.
    """
    angle = jnp.arctan2(sin_t, cos_t)
    bin_idx = jnp.mod(jnp.round(angle * (N_ORI_BINS / (2.0 * jnp.pi))),
                      N_ORI_BINS).astype(jnp.int32)
    flat = patches.reshape(patches.shape[0], -1)      # [K, P*P]
    D = jnp.asarray(_binned_test_matrix(patch_size), jnp.bfloat16)
    diffs = jax.lax.dot_general(
        flat.astype(jnp.bfloat16), D, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [K, 30*256]
    # select each keypoint's bin block with a one-hot contraction (a
    # per-row dynamic_slice lowers to a sequential while loop)
    onehot = (jnp.arange(N_ORI_BINS, dtype=jnp.int32)[None, :]
              == bin_idx[:, None]).astype(diffs.dtype)   # [K, 30]
    mine = jnp.einsum("kb,kbc->kc",
                      onehot, diffs.reshape(-1, N_ORI_BINS, N_BITS))
    bits = (mine > 0).astype(jnp.uint32)
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# WTA_K = 3/4 descriptors (cv::ORB semantics, src/stereoFrame.cpp:112-115):
# each of 128 cells takes wta_k sample points and stores the 2-bit argmax;
# distances use NORM_HAMMING2 (ops/hamming.py).  Packed into the same
# [K, 8] uint32 container (32 bytes) as the WTA_K=2 descriptor.
# ---------------------------------------------------------------------------

N_CELLS = 128


@functools.lru_cache(maxsize=8)
def _make_wta_pattern(patch_size: int, wta_k: int,
                      seed: int = 8861) -> np.ndarray:
    """[128, wta_k, 2] float32 sample tuples (same seeded-Gaussian family
    and rotation-safe clipping as the 2-point pattern)."""
    rng = np.random.default_rng(seed + wta_k)
    sigma = patch_size / 5.0
    pattern_r = min(PATTERN_R, patch_size / 2.0 - 2.0)
    pts = rng.normal(0.0, sigma, size=(N_CELLS, wta_k, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, pattern_r / np.maximum(r, 1e-9))
    return (pts * scale).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _binned_sample_matrix(patch_size: int, wta_k: int) -> np.ndarray:
    """[P*P, N_ORI_BINS * 128 * wta_k] one-hot sampling matrix: column
    (b, c, t) selects the rotated position of tuple point t of cell c under
    orientation bin b, so one bf16 matmul gathers every sample of every
    cell (the WTA analogue of the +/-1 difference matrix above)."""
    S = np.zeros((PATCH * PATCH, N_ORI_BINS * N_CELLS * wta_k), np.float32)
    pattern = _make_wta_pattern(patch_size, wta_k)     # [128, wta_k, 2]
    px = pattern[..., 0]
    py = pattern[..., 1]
    for b in range(N_ORI_BINS):
        th = 2.0 * np.pi * b / N_ORI_BINS
        c, s = np.cos(th), np.sin(th)
        rx = np.clip(np.round(c * px - s * py + PATCH_R), 0, PATCH - 1)
        ry = np.clip(np.round(s * px + c * py + PATCH_R), 0, PATCH - 1)
        idx = (ry * PATCH + rx).astype(np.int32)       # [128, wta_k]
        cols = (b * N_CELLS * wta_k
                + np.arange(N_CELLS)[:, None] * wta_k
                + np.arange(wta_k)[None, :])
        np.add.at(S, (idx, cols), 1.0)
    return S


def describe_wta(patches: jnp.ndarray, cos_t: jnp.ndarray,
                 sin_t: jnp.ndarray, wta_k: int,
                 patch_size: int = 31) -> jnp.ndarray:
    """WTA_K=3/4 descriptors: [K, P, P] patches -> [K, 8] uint32 of 128
    2-bit argmax cells.  Ties resolve to the lowest tuple index (cv::ORB's
    comparison cascade also prefers earlier points on exact ties)."""
    assert wta_k in (3, 4), wta_k
    angle = jnp.arctan2(sin_t, cos_t)
    bin_idx = jnp.mod(jnp.round(angle * (N_ORI_BINS / (2.0 * jnp.pi))),
                      N_ORI_BINS).astype(jnp.int32)
    flat = patches.reshape(patches.shape[0], -1)
    S = jnp.asarray(_binned_sample_matrix(patch_size, wta_k), jnp.bfloat16)
    samples = jax.lax.dot_general(
        flat.astype(jnp.bfloat16), S, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [K, 30*128*wta_k]
    onehot = (jnp.arange(N_ORI_BINS, dtype=jnp.int32)[None, :]
              == bin_idx[:, None]).astype(samples.dtype)
    mine = jnp.einsum("kb,kbc->kc", onehot,
                      samples.reshape(-1, N_ORI_BINS, N_CELLS * wta_k))
    vals = mine.reshape(-1, N_CELLS, wta_k)
    cell = jnp.argmax(vals, axis=-1).astype(jnp.uint32)   # [K, 128] in 0..3
    words = cell.reshape(-1, 8, 16)
    shifts = (jnp.arange(16, dtype=jnp.uint32) * 2)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("patch_size",))
def orient_and_describe(img: jnp.ndarray, img_blur: jnp.ndarray,
                        uv: jnp.ndarray, patch_size: int = 31):
    """Full per-level descriptor pass.

    uv: [K, 2] level coords.  Returns (desc [K, 8] uint32, cos, sin).

    One patch gather per keypoint: both the intensity-centroid orientation
    and the binary tests read the blurred patch (OpenCV blurs only for the
    tests, but the centroid of a sigma=2-blurred patch is the blurred
    centroid — identical angle up to boundary effects — and skipping the
    second gather halves the dominant memory cost).
    """
    del img  # orientation shares the blurred patch
    # NOTE: gathering bf16 patches (to halve the kernel's per-site VMEM
    # block reads) is blocked by the toolchain: Mosaic's lane roll only
    # supports 32-bit data ("Rotate with non-32-bit data").
    p = gather_patches(img_blur, uv)
    return orient_describe(p, patch_size=patch_size)
