"""Line Band Descriptor (LBD-equivalent) as batched gather + reductions.

The reference vendors the LBD of Zhang & Koch
(3rdparty/line_descriptor/src/binary_descriptor_custom.cpp:1026-1330):
9 bands x width-7 line-support region rotated to the line direction, per-band
mean/std of 4 rectified gradient sums with local+global Gaussian weighting,
L2-normalized 72-float vector, then a 32-byte binarization via pairwise band
comparisons (:74, :401-412, :662-666).

TPU-native redesign: gradients are computed once per image (Sobel); each
line gathers an [S, B*Wb] rotated sampling grid of (gx, gy) bilinearly; band
accumulation and mean/std become einsum-style reductions over static shapes;
binarization uses a deterministic band-pair table (NOT the reference's
learned table — descriptors only need internal consistency; parity is at
trajectory level).

Outputs both the 72-float descriptor and the packed 256-bit binary form
([K, 8] uint32) so lines share the Hamming matching path with points.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

N_BANDS = 9
BAND_W = 7           # widthOfBand_ = 7 (descriptor_custom.hpp:189-213)
N_SAMPLES = 8        # samples along the line direction
REGION_PX = N_BANDS * BAND_W   # 63-pixel-wide support region
N_TAPS = 7           # perpendicular taps (stride ~10 px): the band statistics
                     # are Gaussian-weighted sums, so subsampling the region
                     # trades nothing measurable — and the TPU gather cost
                     # (scalar-unit bound, ~8 cycles/index), the dominant
                     # front-end cost, scales with S*R.  A Pallas row-chunk
                     # alternative (VMEM slices + MXU tap select) measured
                     # ~0.3 us/chunk — slower than XLA's gather at these
                     # budgets — and was removed; see BASELINE.md log.
                     # 5 taps (+15 fps, bench ATE unchanged) was REJECTED:
                     # the less distinctive descriptor flips the stuck-
                     # overlay adversarial e2e from tracking to lost.
PRE_SIGMA = 0.0      # optional gradient pre-blur (0 = off: blurring cancels
                     # thin-line gradient pairs and measurably hurts matching)
DESC_F = N_BANDS * 8  # 72 floats


# perpendicular tap positions in pixels, spanning the 63-px region
_TAP_OFF = np.linspace(-(REGION_PX - 1) / 2.0, (REGION_PX - 1) / 2.0,
                       N_TAPS).astype(np.float64)


def _band_row_assignment():
    """[B, N_TAPS] weight matrix folding perpendicular taps into bands: each
    band k aggregates taps within its own +/- neighbor bands (reference
    computeLBD row loop, binary_descriptor_custom.cpp:1142-1241), weighted
    by the global (whole-region) and local (band-distance) Gaussians
    (gaussCoefG_/gaussCoefL_, :217-259), evaluated at the true pixel offset
    of each tap."""
    sg = 0.5 * (REGION_PX - 1)
    wg = np.exp(-0.5 * (_TAP_OFF / sg) ** 2) / (np.sqrt(2 * np.pi) * sg)
    sl = float(BAND_W)
    centers = (np.arange(N_BANDS) - (N_BANDS - 1) / 2.0) * BAND_W
    A = np.zeros((N_BANDS, N_TAPS), np.float32)
    tap_band = np.clip(np.round(_TAP_OFF / BAND_W + (N_BANDS - 1) / 2.0),
                       0, N_BANDS - 1).astype(int)
    for k in range(N_BANDS):
        m = np.abs(tap_band - k) <= 1
        wl = np.exp(-0.5 * ((_TAP_OFF - centers[k]) / sl) ** 2) \
            / (np.sqrt(2 * np.pi) * sl)
        A[k, m] = (wg * wl)[m]
    return A


_BAND_A = jnp.asarray(_band_row_assignment())  # [B, N_TAPS]


def _binarization_pairs():
    """Deterministic 32 band-pair table (i, j), i<j: all pairs with
    j - i in {1..6} (8+7+6+5+4+3 = 33), trimmed to 32.  8 dims per pair ->
    exactly 256 bits."""
    pairs = []
    for gap in (1, 2, 3, 4, 5, 6):
        for i in range(N_BANDS - gap):
            pairs.append((i, i + gap))
    pairs = pairs[:32]
    assert len(pairs) == 32
    return np.asarray(pairs, np.int32)


_PAIRS = jnp.asarray(_binarization_pairs())  # [32, 2]


def _tap_grid(sp: jnp.ndarray, ep: jnp.ndarray, n_samples: int = N_SAMPLES):
    """Rotated line-support sampling grid.

    Returns (px, py [K, S, R] float tap coordinates, dl, do [K, 2] the
    line/orthogonal unit frame)."""
    d = ep - sp
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
    dl = d / length[:, None]                        # line direction [K, 2]
    do = jnp.stack([-dl[:, 1], dl[:, 0]], axis=-1)  # orthogonal

    t = jnp.linspace(0.0, 1.0, n_samples)
    along = sp[:, None, :] + d[:, None, :] * t[None, :, None]   # [K, S, 2]
    off = jnp.asarray(_TAP_OFF, jnp.float32)                    # [R]
    pts = (along[:, :, None, :]
           + do[:, None, None, :] * off[None, None, :, None])
    return pts[..., 0], pts[..., 1], dl, do


@functools.partial(jax.jit, static_argnames=("n_samples",))
def compute_lbd(gx: jnp.ndarray, gy: jnp.ndarray, sp: jnp.ndarray,
                ep: jnp.ndarray, n_samples: int = N_SAMPLES):
    """LBD descriptors for K lines.

    gx, gy: [H, W] image gradients (Sobel).  sp, ep: [K, 2] endpoints.
    n_samples: along-line sample count (the band statistics are mean/std
    OVER samples, so descriptors with different sample counts live in the
    same space — the two-bucket length-adaptive mode relies on this).
    Returns (desc_f [K, 72] float32 L2-ish normalized, desc_b [K, 8] uint32).
    """
    if PRE_SIGMA > 0:
        from stvo_pl_tpu.ops.image import gaussian_blur
        gx = gaussian_blur(gx, PRE_SIGMA)
        gy = gaussian_blur(gy, PRE_SIGMA)

    px, py, dl, do = _tap_grid(sp, ep, n_samples)
    # nearest-neighbor channel-paired gather: (gx, gy) stacked channel-last
    # hits XLA's vectorized gather path (one index per 2-vector).  Packing
    # the pair as bf16 in one u32 to halve the bytes measured SLOWER — the
    # vectorized path keys on the trailing 2-channel layout.
    H, W = gx.shape
    g2 = jnp.stack([gx, gy], axis=-1)               # [H, W, 2]
    xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
    sg = g2[yi, xi]                                 # [K, S, R, 2]
    return _lbd_from_taps(sg, dl, do)


@functools.partial(jax.jit, static_argnames=("n_samples",))
def compute_lbd_atlas(g2: jnp.ndarray, sp: jnp.ndarray, ep: jnp.ndarray,
                      x_off: jnp.ndarray, y_off: jnp.ndarray,
                      x_hi: jnp.ndarray, y_hi: jnp.ndarray,
                      n_samples: int = N_SAMPLES):
    """LBD from a packed multi-octave gradient atlas.

    The reference computes LBD from each octave's OWN Sobel gradients
    (binary_descriptor_custom.cpp:689-1024): a line detected at octave o
    samples its 63-px support region in octave-o coordinates.  Here all
    octave gradient planes live in ONE [H, W, 2] atlas (each octave's
    region placed at (y_off[o], x_off[o])) so a single channel-paired
    gather serves every selected line regardless of its octave — the
    per-octave full-capacity LBD of the naive formulation is replaced by
    one capacity-sized pass after cross-octave selection.

    g2: [H, W, 2] atlas of (gx, gy).  sp, ep: [K, 2] endpoints in EACH
    LINE'S OWN octave coordinates.  x_off, y_off, x_hi, y_hi: [K] int32
    per-line region offset and inclusive region-local clip bounds (taps
    are clipped to the line's own octave plane BEFORE the offset, so the
    support region never reads a neighboring region through the atlas).
    Returns (desc_f [K, 72], desc_b [K, 8] uint32).
    """
    px, py, dl, do = _tap_grid(sp, ep, n_samples)
    xi = (jnp.clip(jnp.round(px).astype(jnp.int32), 0, x_hi[:, None, None])
          + x_off[:, None, None])
    yi = (jnp.clip(jnp.round(py).astype(jnp.int32), 0, y_hi[:, None, None])
          + y_off[:, None, None])
    sg = g2[yi, xi]                                 # [K, S, R, 2]
    return _lbd_from_taps(sg, dl, do)


def _lbd_from_taps(sg: jnp.ndarray, dl: jnp.ndarray, do: jnp.ndarray):
    """Band statistics + normalization + binarization from gathered taps
    (sg [K, S, R, 2] sampled (gx, gy); dl/do [K, 2] the line frame)."""
    sgx = sg[..., 0]
    sgy = sg[..., 1]

    # gradient projections onto line frame
    g_dl = sgx * dl[:, None, None, 0] + sgy * dl[:, None, None, 1]
    g_do = sgx * do[:, None, None, 0] + sgy * do[:, None, None, 1]

    # 4 rectified channels [K, S, R]
    ch = jnp.stack([
        jnp.maximum(g_do, 0.0), jnp.maximum(-g_do, 0.0),
        jnp.maximum(g_dl, 0.0), jnp.maximum(-g_dl, 0.0),
    ], axis=-1)                                     # [K, S, R, 4]

    # fold rows into bands with Gaussian weights: [K, S, B, 4]
    band_vals = jnp.einsum("ksrc,br->ksbc", ch, _BAND_A)

    mean = jnp.mean(band_vals, axis=1)              # [K, B, 4]
    std = jnp.std(band_vals, axis=1)                # [K, B, 4]
    desc = jnp.concatenate([mean, std], axis=-1)    # [K, B, 8]
    desc = desc.reshape(-1, DESC_F)

    # normalize mean and std halves separately, clamp outliers at 0.4 and
    # renormalize (reference normalization, binary_descriptor_custom.cpp:
    # 1282-1311 and computeImpl clamp loop)
    m = desc.reshape(-1, N_BANDS, 8)
    mean_part = m[..., :4].reshape(-1, N_BANDS * 4)
    std_part = m[..., 4:].reshape(-1, N_BANDS * 4)

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)
    mean_part = _norm(mean_part)
    std_part = _norm(std_part)
    mean_part = _norm(jnp.minimum(mean_part, 0.4))
    std_part = _norm(jnp.minimum(std_part, 0.4))
    desc_f = jnp.concatenate(
        [mean_part.reshape(-1, N_BANDS, 4), std_part.reshape(-1, N_BANDS, 4)],
        axis=-1).reshape(-1, DESC_F)

    # binarize: 32 band pairs x 8 dims (reference binaryConversion,
    # binary_descriptor_custom.cpp:401-412 with combinations table :74)
    per_band = desc_f.reshape(-1, N_BANDS, 8)
    a = per_band[:, _PAIRS[:, 0], :]                # [K, 32, 8]
    b = per_band[:, _PAIRS[:, 1], :]
    bits = (a > b).astype(jnp.uint32).reshape(-1, 256)
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc_b = jnp.sum(words << shifts[None, None, :], axis=-1,
                     dtype=jnp.uint32)
    return desc_f, desc_b
