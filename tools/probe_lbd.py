"""Is compute_lbd gather-bound?  Time full vs gather-stubbed variants (dev)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops, lbd, lsd
from stvo_pl_tpu.ops.image import sobel
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
mll = jnp.float32(0.02 * min(cam.width, cam.height))
segs = jax.jit(lambda im: lsd.detect_line_segments(
    im, mll, capacity=cfg.line_capacity, n_dirs=cfg.lsd_n_dirs))(img)

imgs8 = jnp.broadcast_to(img, (8,) + img.shape)
sp8 = jnp.broadcast_to(segs.sp, (8,) + segs.sp.shape)
ep8 = jnp.broadcast_to(segs.ep, (8,) + segs.ep.shape)


def timeit(name, f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")


def lbd_full(im, sp, ep):
    gx, gy = sobel(im)
    return lbd.compute_lbd(gx, gy, sp, ep)


timeit("sobel+lbd x8", jax.jit(jax.vmap(lbd_full)), imgs8, sp8, ep8)

# gather stubbed: same arithmetic, constant samples
_orig = lbd._sample_nearest2
lbd._sample_nearest2 = lambda img2, x, y: jnp.broadcast_to(
    img2[0, 0], x.shape + (2,))
timeit("sobel+lbd x8 (no gather)",
       jax.jit(jax.vmap(lbd_full)), imgs8, sp8, ep8)
lbd._sample_nearest2 = _orig
