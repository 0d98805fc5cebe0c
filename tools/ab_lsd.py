"""A/B old per-direction LSD path vs multi-direction kernel path (dev)."""
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


def make_det():
    return jax.jit(jax.vmap(lambda im: lsd.detect_line_segments(
        im, mll, capacity=cfg.line_capacity, n_dirs=cfg.lsd_n_dirs,
        ang_th_deg=cfg.lsd_ang_th, quant=cfg.lsd_quant,
        density_th=cfg.lsd_density_th, refine=not cfg.use_fld_lines)))


def timeit(name, f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")
    return r


mode = sys.argv[1] if len(sys.argv) > 1 else "multi"
if mode == "single":
    # force the per-direction path by pretending not-TPU in the branch
    real = jax.default_backend
    lsd.jax.default_backend = lambda: "cpu-force"
    segs = timeit("lsd OLD per-dir x8", make_det(), imgs8)
    lsd.jax.default_backend = real
else:
    segs = timeit("lsd MULTI x8", make_det(), imgs8)
nv = np.asarray(segs.valid).sum(axis=1)
print("valid per img:", nv)
