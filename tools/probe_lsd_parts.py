"""Time the pieces of the TPU LSD path (dev)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import math
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops, lsd
from stvo_pl_tpu.ops.lsd_kernel import run_pack_multi
from stvo_pl_tpu.ops.image import gaussian_blur
from stvo_pl_tpu.utils import synthetic

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(2, speed=0.8)
seq_l, _ = synthetic.render_sequence(scene, poses, cam)
img = seq_l[0]
imgs8 = jnp.broadcast_to(img, (8,) + img.shape)
mll = jnp.float32(0.02 * min(cam.width, cam.height))

tol = math.radians(cfg.lsd_ang_th)
rho = cfg.lsd_quant / math.sin(tol)
idx = np.round(np.linspace(0, len(lsd.DIR_STEPS), cfg.lsd_n_dirs,
                           endpoint=False)).astype(int)
steps = tuple(lsd.DIR_STEPS[i] for i in idx)


def bits_of(im):
    sm = gaussian_blur(im, 0.8)
    ang, mag = lsd.level_line_field(sm)
    bits = jnp.zeros(ang.shape, jnp.int32)
    for i, (dx, dy) in enumerate(steps):
        theta = math.atan2(dy, dx) % math.pi
        aligned = (lsd._angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
        bits = bits | (aligned.astype(jnp.int32) << i)
    return bits


def timeit(name, f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")
    return r


fb = jax.jit(jax.vmap(bits_of))
bits = timeit("bits x8", fb, imgs8)

frp = jax.jit(jax.vmap(lambda b: run_pack_multi(b, steps)))
packed = timeit("run_pack_multi x8", frp, bits)

fc = jax.jit(jax.vmap(lambda p: lsd._candidates_from_packed_multi(
    p, steps, 600, mll)))
timeit("candidates(top600) x8", fc, packed)

# pooled-only and top_k-only
def pool_only(p):
    return jax.lax.reduce_window(p, 0, jax.lax.max, (1, 8, 8), (1, 8, 8),
                                 "VALID")
fp = jax.jit(jax.vmap(pool_only))
pooled = timeit("pool x8", fp, packed)
ft = jax.jit(jax.vmap(lambda p: jax.lax.top_k(p.reshape(-1), 600)))
timeit("top_k 600 x8", ft, pooled)
ft64 = jax.jit(jax.vmap(lambda p: jax.lax.top_k(
    p.reshape(p.shape[0], -1), 64)))
timeit("top_k 64/dir x8", ft64, pooled)
