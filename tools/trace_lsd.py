"""Device-op trace of the composed LSD detect (dev)."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops, lsd
from stvo_pl_tpu.utils import synthetic, profiling

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

det = jax.jit(jax.vmap(lambda im: lsd.detect_line_segments(
    im, mll, capacity=cfg.line_capacity, n_dirs=cfg.lsd_n_dirs,
    ang_th_deg=cfg.lsd_ang_th, quant=cfg.lsd_quant,
    density_th=cfg.lsd_density_th, refine=not cfg.use_fld_lines)))
jax.block_until_ready(det(imgs8))

logdir = "/tmp/lsd_trace"
with profiling.device_trace(logdir):
    for _ in range(5):
        r = det(imgs8)
    jax.block_until_ready(r)

for name, ms, c in profiling.summarize_trace(logdir, top=30):
    print(f"{ms:9.3f} ms  x{c:4d}  {name[:110]}")
