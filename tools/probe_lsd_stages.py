"""Time LSD downstream stages with fresh random-ish inputs (dev)."""
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
from stvo_pl_tpu.ops.image import gaussian_blur
from stvo_pl_tpu.utils import synthetic

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(10, speed=0.8)
seq_l, _ = synthetic.render_sequence(scene, poses, cam)
imgs8 = seq_l[:8]
mll = jnp.float32(0.02 * min(cam.width, cam.height))
tol = math.radians(cfg.lsd_ang_th)


def timeit(name, f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")
    return r


K = 600
kk = jax.random.split(key, 4)
sp = jax.random.uniform(kk[0], (8, K, 2)) * 300
d = jax.random.normal(kk[1], (8, K, 2)) * 40
ep = sp + d
length = jnp.linalg.norm(d, axis=-1)
v = jax.random.uniform(kk[2], (8, K)) > 0.3

fm = jax.jit(jax.vmap(lambda s, e, l, vv: lsd._merge_collinear(
    s, e, l, vv, ang_tol=tol * 0.5, perp_tol=2.5, gap_tol=6.0)))
timeit("merge_collinear K=600 x8", fm, sp, ep, length, v)

fs = jax.jit(jax.vmap(lambda s, e, l, vv: lsd._suppress_duplicates(
    s, e, l, vv, perp_tol=2.0, overlap_tol=0.8)))
timeit("suppress_dup K=600 x8", fs, sp, ep, length, v)

C = cfg.line_capacity
ang8 = jax.random.uniform(kk[3], (8, 370, 1226))
mag8 = jnp.abs(jax.random.normal(key, (8, 370, 1226)))
fr = jax.jit(jax.vmap(lambda a, m, s, e, vv: lsd._refine_segments(
    a, m, s[:C, 0], s[:C, 1], e[:C, 0], e[:C, 1], vv[:C], tol)))
timeit("refine C=300 x8", fr, ang8, mag8, sp, ep, v)

fm2 = jax.jit(jax.vmap(lambda s, e, l, vv: lsd._merge_collinear(
    s[:C], e[:C], l[:C], vv[:C], ang_tol=tol * 0.25, perp_tol=2.5,
    gap_tol=8.0)))
timeit("merge_collinear K=300 x8", fm2, sp, ep, length, v)

# level-line field + bits
def bits_of(im):
    sm = gaussian_blur(im, 0.8)
    ang, mag = lsd.level_line_field(sm)
    rho = cfg.lsd_quant / math.sin(tol)
    idx = np.round(np.linspace(0, len(lsd.DIR_STEPS), cfg.lsd_n_dirs,
                               endpoint=False)).astype(int)
    steps = [lsd.DIR_STEPS[i] for i in idx]
    bits = jnp.zeros(ang.shape, jnp.int32)
    for i, (dx, dy) in enumerate(steps):
        theta = math.atan2(dy, dx) % math.pi
        aligned = (lsd._angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
        bits = bits | (aligned.astype(jnp.int32) << i)
    return bits
timeit("blur+field+bits x8", jax.jit(jax.vmap(bits_of)), imgs8)
