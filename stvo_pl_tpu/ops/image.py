"""Image-processing primitives: separable Gaussian blur, Sobel gradients,
pyramid resampling.

Replaces the OpenCV calls consumed by the reference
(cv::GaussianBlur/pyrDown/Sobel/resize — e.g. reference
3rdparty/line_descriptor/src/binary_descriptor_custom.cpp:358-396 and
LSDDetector_custom.cpp:56-73) with XLA convolutions and strided gathers.
All ops are batched over a leading batch axis ([..., H, W] float32) — the
reference's "left ∥ right in parallel" std::async sites become a batch
dimension of 2.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _axis_shift(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Static shift with edge replication along one of the last two axes."""
    H = x.shape[axis]
    d = max(-H + 1, min(H - 1, d))
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(max(d, 0), H + min(d, 0))
    core = x[tuple(sl)]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(-d, 0), max(d, 0))
    return jnp.pad(core, pad, mode="edge")


def _sep_conv(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable 2-D convolution as shift-multiply-accumulate.

    1-channel NCHW convs on TPU go through pathological T(1,128) layouts
    with bf16 round-trips (~10 ms per blur at KITTI size); a tap-unrolled
    shift+FMA stays in the native f32 layout on the VPU and fuses with
    neighbors."""
    r = (len(k) - 1) // 2
    out = jnp.zeros_like(img)
    for i, kv in enumerate(k):
        out = out + float(kv) * _axis_shift(img, i - r, img.ndim - 2)
    img2 = out
    out = jnp.zeros_like(img)
    for i, kv in enumerate(k):
        out = out + float(kv) * _axis_shift(img2, i - r, img.ndim - 1)
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float,
                  radius: int | None = None) -> jnp.ndarray:
    return _sep_conv(img, gaussian_kernel1d(sigma, radius))


def sobel(img: jnp.ndarray):
    """(gx, gy) Sobel gradients, reflect-padded, batched.

    Same stencil family as the reference's computeSobel
    (binary_descriptor_custom.cpp:373-398).
    """
    def conv2(x, kr, kc):
        y = jnp.zeros_like(x)
        for i, kv in enumerate(kr):
            if kv:
                y = y + float(kv) * _axis_shift(x, i - 1, x.ndim - 2)
        out = jnp.zeros_like(x)
        for i, kv in enumerate(kc):
            if kv:
                out = out + float(kv) * _axis_shift(y, i - 1, x.ndim - 1)
        return out

    smooth = (1.0, 2.0, 1.0)
    diff = (-1.0, 0.0, 1.0)
    gx = conv2(img, smooth, diff)
    gy = conv2(img, diff, smooth)
    return gx, gy


@functools.lru_cache(maxsize=64)
def _resample_matrix(n_in: int, n_out: int, blur_sigma: float) -> np.ndarray:
    """[n_in, n_out] 1-D resampling operator: optional edge-replicated
    Gaussian blur composed with ANTIALIASED bilinear interpolation
    (half-pixel centers, triangle kernel scaled by the downsample ratio —
    jax.image.resize semantics).  All steps are linear, so composing them
    into one matrix is exact and the separate blur pass disappears.

    Antialiasing is LOAD-BEARING for robustness, not a nicety: a plain
    2-tap downsample of noise-like texture keeps aliased high-frequency
    energy that spawns spurious pyramid-level FAST corners — measured to
    flip the stuck-overlay adversarial e2e (tests/test_adversarial.py)
    from tracking to lost.  As a dense matmul the wider kernel costs
    nothing extra."""
    scale = n_in / n_out
    M = np.zeros((n_in, n_out), np.float64)
    if scale <= 1.0:
        # upsample: plain 2-tap bilinear (no AA needed)
        pos = (np.arange(n_out) + 0.5) * scale - 0.5
        i0 = np.floor(pos)
        f = (pos - i0).astype(np.float64)
        a = np.clip(i0, 0, n_in - 1).astype(int)
        b = np.clip(i0 + 1, 0, n_in - 1).astype(int)
        M[a, np.arange(n_out)] += 1.0 - f
        M[b, np.arange(n_out)] += f
    else:
        for j in range(n_out):
            c = (j + 0.5) * scale - 0.5
            idx = np.arange(int(np.floor(c - scale)),
                            int(np.ceil(c + scale)) + 1)
            w = np.maximum(0.0, 1.0 - np.abs(idx - c) / scale)
            keep = (idx >= 0) & (idx < n_in) & (w > 0)
            idx, w = idx[keep], w[keep]
            M[idx, j] = w / w.sum()      # edge renormalization, like jax
    if blur_sigma > 0:
        k = gaussian_kernel1d(blur_sigma).astype(np.float64)
        r = (len(k) - 1) // 2
        B = np.zeros((n_in, n_in), np.float64)
        for i, kv in enumerate(k):
            src = np.clip(np.arange(n_in) + (i - r), 0, n_in - 1)
            B[src, np.arange(n_in)] += kv    # edge replication (_axis_shift)
        M = B @ M
    return M.astype(np.float32)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    blur_sigma: float = 0.0) -> jnp.ndarray:
    """Bilinear resize, batched [..., H, W].  The downsample path IS
    antialiased (jax.image.resize semantics: the triangle kernel width
    scales with the in/out ratio, see _resample_matrix) — deliberately
    unlike cv::resize INTER_LINEAR; BASELINE.md records AA as load-bearing
    for the stuck-overlay adversarial e2e (non-AA 2-tap was tried and
    reverted).  Runs as two dense matmuls against the interpolation
    matrices: jax.image.resize lowers to transposed-layout row/column
    fusions that measured ~0.3 ms per level-eye at bench shapes, while the
    MXU eats the (mostly-zero) dense operators in tens of microseconds.

    blur_sigma > 0 composes an edge-replicated Gaussian pre-blur into the
    same matrices (exact: both operators are linear)."""
    H, W = img.shape[-2:]
    My = jnp.asarray(_resample_matrix(H, out_h, blur_sigma))   # [H, H']
    Mx = jnp.asarray(_resample_matrix(W, out_w, blur_sigma))   # [W, W']
    return _apply_separable(img, My, Mx)


# Resampling matmul precision.  DEFAULT (bf16 operands, f32 accumulation)
# rounds intensities by +-0.5 — the same quantization as cv::resize on
# uint8 — and with the COMPOSED per-level operators each level sees that
# rounding exactly once (no cascade compounding; compounded bf16 through a
# serial cascade measurably drifted the VO: bench lane ATE 0.027 -> 0.26).
RESIZE_PRECISION = None


def _apply_separable(img: jnp.ndarray, My: jnp.ndarray, Mx: jnp.ndarray):
    r = jnp.einsum("...hw,ho->...ow", img, My, precision=RESIZE_PRECISION)
    return jnp.einsum("...ow,wv->...ov", r, Mx, precision=RESIZE_PRECISION)


@functools.lru_cache(maxsize=16)
def _pyramid_matrices(H: int, W: int, n_levels: int, scale: float,
                      blur_sigma: float):
    """Per-level composed resampling operators from the BASE image.

    Level l of the ORB pyramid is blur(0.6) + bilinear-resize applied l
    times in cascade.  Every step is linear, so the whole cascade folds
    into one (My_l, Mx_l) pair per level — bit-equivalent semantics (in
    f64) with no serial level chain and no per-step rounding."""
    mats = []
    My = Mx = None
    for lv in range(1, n_levels):
        s = scale ** lv
        nh, nw = max(16, int(round(H / s))), max(16, int(round(W / s)))
        step_y = _resample_matrix(My.shape[1] if My is not None else H,
                                  nh, blur_sigma).astype(np.float64)
        step_x = _resample_matrix(Mx.shape[1] if Mx is not None else W,
                                  nw, blur_sigma).astype(np.float64)
        My = step_y if My is None else My @ step_y
        Mx = step_x if Mx is None else Mx @ step_x
        mats.append((My.astype(np.float32), Mx.astype(np.float32)))
    return mats


def pyramid_levels(img: jnp.ndarray, n_levels: int, scale: float,
                   blur_sigma: float = 0.6) -> list[jnp.ndarray]:
    """[img, level1, ..., level_{n-1}]: each level computed directly from
    the base image through the composed cascade operator (see
    _pyramid_matrices)."""
    H, W = img.shape[-2:]
    out = [img]
    for My, Mx in _pyramid_matrices(H, W, n_levels, scale, blur_sigma):
        out.append(_apply_separable(img, jnp.asarray(My), jnp.asarray(Mx)))
    return out


@functools.partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def build_pyramid(img: jnp.ndarray, n_levels: int,
                  scale_factor: float) -> list[jnp.ndarray]:
    """Image pyramid with per-level smoothing, levels returned at full
    precision.  Level i has size round(H / scale^i).

    Mirrors the pyramid used by ORB (scale 1.2, orb_nlevels) and by the line
    stack (LSDDetector computeGaussianPyramid,
    3rdparty/.../LSDDetector_custom.cpp:56-73).
    """
    H, W = img.shape[-2:]
    levels = [img]
    cur = img
    for i in range(1, n_levels):
        s = scale_factor ** i
        nh, nw = max(8, int(round(H / s))), max(8, int(round(W / s)))
        # blur with sigma matched to the decimation ratio, then resample
        cur = gaussian_blur(cur, sigma=0.5 * scale_factor)
        cur = resize_bilinear(cur, nh, nw)
        levels.append(cur)
    return levels


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 box mean via separable conv, reflect padded."""
    k = np.ones(2 * radius + 1, np.float32) / (2 * radius + 1)
    return _sep_conv(img, k)


def maxpool3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 max filter (for NMS), batched, same-size."""
    b = img.shape[:-2]
    x = img.reshape((-1,) + img.shape[-2:] + (1,))
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return y.reshape(b + img.shape[-2:])

