"""Procedural stereo-sequence generator with known ground-truth trajectory.

The reference has no test data or fixtures (SURVEY.md §4); this module is the
framework's golden-scene factory: a random 3-D world of textured point
landmarks and bright 3-D line segments rendered into rectified stereo pairs
along a smooth trajectory.  It drives both correctness tests (ATE against
ground truth) and the standalone benchmark (bench.py) without any dataset on
disk.  Rendering is pure JAX (jit + vmap over frames), so benchmark sequences
are synthesized directly on the TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import se3

STAMP = 9        # rendered landmark stamp size (pixels)
BASE = 6         # per-landmark random texture resolution


class Scene(NamedTuple):
    P: jnp.ndarray         # [Np, 3] world points
    tex: jnp.ndarray       # [Np, BASE, BASE] per-point texture
    brightness: jnp.ndarray  # [Np]
    sA: jnp.ndarray        # [Nl, 3] line segment endpoints (world)
    sB: jnp.ndarray        # [Nl, 3]
    line_w: jnp.ndarray    # [Nl] line brightness


def make_scene(key, n_points=600, n_lines=48, extent=(30.0, 12.0, 60.0),
               z_near=4.0) -> Scene:
    kp, kt, kb, kl, kw = jax.random.split(key, 5)
    ex, ey, ez = extent
    P = jax.random.uniform(kp, (n_points, 3),
                           minval=jnp.asarray([-ex, -ey, z_near]),
                           maxval=jnp.asarray([ex, ey, z_near + ez]))
    tex = jax.random.uniform(kt, (n_points, BASE, BASE))
    brightness = jax.random.uniform(kb, (n_points,), minval=90.0,
                                    maxval=200.0)
    # lines: mix of mostly-vertical and oblique structural segments
    kl1, kl2, kl3 = jax.random.split(kl, 3)
    A = jax.random.uniform(kl1, (n_lines, 3),
                           minval=jnp.asarray([-ex, -ey, z_near + 2.0]),
                           maxval=jnp.asarray([ex, ey, z_near + ez]))
    d = jax.random.normal(kl2, (n_lines, 3))
    # bias toward vertical structure (line-rich indoor analogue)
    d = d.at[:, 1].mul(3.0)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    length = jax.random.uniform(kl3, (n_lines, 1), minval=3.0, maxval=10.0)
    B = A + d * length
    line_w = jax.random.uniform(kw, (n_lines,), minval=60.0, maxval=140.0)
    return Scene(P=P, tex=tex, brightness=brightness, sA=A, sB=B,
                 line_w=line_w)


def smooth_trajectory(n_frames: int, speed=0.6, yaw_rate=0.004,
                      dtype=jnp.float32) -> jnp.ndarray:
    """[T, 4, 4] camera-to-world poses: forward motion with gentle yaw +
    a small sinusoidal sway (KITTI-like)."""
    poses = []
    T = np.eye(4, dtype=np.float64)
    for i in range(n_frames):
        poses.append(T.copy())
        xi = np.array([
            0.02 * np.sin(0.05 * i),        # x sway
            0.005 * np.sin(0.03 * i),       # y bob
            speed,                           # forward
            0.001 * np.sin(0.02 * i),
            yaw_rate * np.sin(0.01 * i + 0.5),
            0.0005 * np.cos(0.04 * i),
        ])
        # T <- T * exp(xi)  (body-frame increment)
        W = np.zeros((4, 4))
        W[:3, 3] = xi[:3]
        wx, wy, wz = xi[3:]
        W[:3, :3] = np.array([[0, -wz, wy], [wz, 0, -wx], [-wy, wx, 0]])
        from scipy.linalg import expm
        T = T @ expm(W)
    return jnp.asarray(np.stack(poses), dtype)


def _splat_points(img, uv, z, tex, brightness, H, W):
    """Scatter textured stamps at projected positions (subpixel via the
    texture-space shift)."""
    n = uv.shape[0]
    u0 = jnp.floor(uv[:, 0]).astype(jnp.int32) - STAMP // 2
    v0 = jnp.floor(uv[:, 1]).astype(jnp.int32) - STAMP // 2
    fu = uv[:, 0] - jnp.floor(uv[:, 0])
    fv = uv[:, 1] - jnp.floor(uv[:, 1])

    # sample the BASE x BASE texture at stamp grid offset by the subpixel
    # fraction -> appearance slides smoothly with the projection
    gy = jnp.arange(STAMP, dtype=jnp.float32)
    gx = jnp.arange(STAMP, dtype=jnp.float32)
    sy = (gy[None, :, None] - fv[:, None, None]) * (BASE - 1) / (STAMP - 1)
    sx = (gx[None, None, :] - fu[:, None, None]) * (BASE - 1) / (STAMP - 1)
    sy = jnp.clip(sy, 0.0, BASE - 1.001)
    sx = jnp.clip(sx, 0.0, BASE - 1.001)
    ty0 = jnp.floor(sy).astype(jnp.int32)
    tx0 = jnp.floor(sx).astype(jnp.int32)
    wy = sy - ty0
    wx = sx - tx0
    kidx = jnp.arange(n)[:, None, None]
    t00 = tex[kidx, ty0, tx0]
    t01 = tex[kidx, ty0, tx0 + 1]
    t10 = tex[kidx, ty0 + 1, tx0]
    t11 = tex[kidx, ty0 + 1, tx0 + 1]
    stamp = (t00 * (1 - wy) * (1 - wx) + t01 * (1 - wy) * wx
             + t10 * wy * (1 - wx) + t11 * wy * wx)
    # circular falloff keeps stamps blob-like but textured
    cy = (STAMP - 1) / 2.0
    r2 = ((gy[:, None] - cy) ** 2 + (gx[None, :] - cy) ** 2) / (cy * cy)
    fall = jnp.maximum(0.0, 1.0 - r2)[None]
    visible = (z > 0.5) & (uv[:, 0] > -STAMP) & (uv[:, 0] < W + STAMP) \
        & (uv[:, 1] > -STAMP) & (uv[:, 1] < H + STAMP)
    stamp = stamp * fall * brightness[:, None, None] \
        * visible[:, None, None]

    yy = v0[:, None, None] + gy.astype(jnp.int32)[None, :, None]
    xx = u0[:, None, None] + gx.astype(jnp.int32)[None, None, :]
    yy = jnp.clip(yy, 0, H - 1)
    xx = jnp.clip(xx, 0, W - 1)
    flat_idx = (yy * W + xx).reshape(-1)
    img_flat = img.reshape(-1)
    img_flat = img_flat.at[flat_idx].add(stamp.reshape(-1))
    return img_flat.reshape(H, W)


def _draw_lines(img, sa_uv, sb_uv, vis, w, H, W):
    """Additive anti-aliased segments via a distance field per line."""
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(im, args):
        a, b, v, wl = args
        d = b - a
        L2 = jnp.maximum(jnp.sum(d * d), 1e-6)
        t = ((xx - a[0]) * d[0] + (yy - a[1]) * d[1]) / L2
        t = jnp.clip(t, 0.0, 1.0)
        px = a[0] + t * d[0]
        py = a[1] + t * d[1]
        dist2 = (xx - px) ** 2 + (yy - py) ** 2
        add = wl * jnp.exp(-dist2 / (2.0 * 0.8 ** 2)) * v
        return im + add, None

    img, _ = jax.lax.scan(one, img, (sa_uv, sb_uv,
                                     vis.astype(img.dtype), w))
    return img


@functools.partial(jax.jit, static_argnames=("cam",))
def render_stereo(scene: Scene, T_wc: jnp.ndarray,
                  cam: cam_ops.StereoCamera):
    """Render the (left, right) grayscale pair seen from camera pose T_wc."""
    H, W = cam.height, cam.width
    T_cw = se3.inverse_se3(T_wc)
    Pc = se3.transform_points(T_cw, scene.P)
    sAc = se3.transform_points(T_cw, scene.sA)
    sBc = se3.transform_points(T_cw, scene.sB)

    def eye(shift):
        # right camera: world shifted by baseline along camera x
        Pe = Pc - jnp.asarray([shift, 0.0, 0.0])
        sAe = sAc - jnp.asarray([shift, 0.0, 0.0])
        sBe = sBc - jnp.asarray([shift, 0.0, 0.0])
        z = Pe[:, 2]
        uv = cam_ops.project(cam, jnp.where(z[:, None] > 0.5, Pe,
                                            jnp.asarray([0.0, 0.0, 1e3])))
        # smooth background gradient (gives LSD a quiet floor)
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        img = 40.0 + 10.0 * (xx / W) + 6.0 * (yy / H)
        img = _splat_points(img, uv, z, scene.tex, scene.brightness, H, W)
        za = sAe[:, 2]
        zb = sBe[:, 2]
        vis = (za > 0.5) & (zb > 0.5)
        sa_uv = cam_ops.project(cam, jnp.where(vis[:, None], sAe,
                                               jnp.asarray([0.0, 0.0, 1e3])))
        sb_uv = cam_ops.project(cam, jnp.where(vis[:, None], sBe,
                                               jnp.asarray([0.0, 0.0, 1e3])))
        img = _draw_lines(img, sa_uv, sb_uv, vis, scene.line_w, H, W)
        return jnp.clip(img, 0.0, 255.0)

    return eye(0.0), eye(cam.b)


def render_sequence(scene: Scene, poses: jnp.ndarray,
                    cam: cam_ops.StereoCamera):
    """[T,4,4] -> ([T,H,W], [T,H,W]) stereo sequence (lax.map over frames)."""
    def f(T):
        return render_stereo(scene, T, cam)
    return jax.lax.map(f, poses)


def street_trajectory(n_frames: int, speed=0.8, sway=0.3, bob=0.06,
                      yaw_amp=0.008, pitch_amp=0.004,
                      dtype=jnp.float32) -> jnp.ndarray:
    """[T, 4, 4] camera-to-world poses for a street-canyon world: straight
    forward motion with BOUNDED sinusoidal sway/bob/yaw/pitch.

    smooth_trajectory integrates body-frame velocity increments, so its
    lateral/vertical excursions random-walk without bound — on a 1000-frame
    run the camera climbed 38 m above the canyon and left the world
    (round-4 drift-eval debugging).  Here lateral offsets and look angles
    are direct bounded functions of time, so the camera stays inside the
    canyon for any horizon.
    """
    poses = []
    for i in range(n_frames):
        x = sway * np.sin(2 * np.pi * i / 140.0)
        y = -bob * np.sin(2 * np.pi * i / 90.0)
        z = speed * i
        yaw = yaw_amp * np.sin(2 * np.pi * i / 200.0)
        pitch = pitch_amp * np.sin(2 * np.pi * i / 170.0)
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        T = np.eye(4)
        T[:3, :3] = Ry @ Rx
        T[:3, 3] = (x, y, z)
        poses.append(T)
    return jnp.asarray(np.stack(poses), dtype)
