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


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize, batched [..., H, W] (cv::resize equivalent)."""
    return jax.image.resize(img, img.shape[:-2] + (out_h, out_w),
                            method="bilinear")


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

