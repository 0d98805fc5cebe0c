"""Device-op ranking of the composed VO step at bench config (dev tool)."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import batched
from stvo_pl_tpu.utils import profiling, synthetic

B = 8
cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(6, speed=0.8)
seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)

state = batched.init_batched_state(cfg, B)
frames = [(jnp.broadcast_to(seq_l[i], (B,) + seq_l[i].shape) + 0.0,
           jnp.broadcast_to(seq_r[i], (B,) + seq_r[i].shape) + 0.0)
          for i in range(6)]
jax.block_until_ready(frames)

for i in range(2):  # warmup/compile
    state, _ = batched.vo_step_batched(state, frames[i][0], frames[i][1],
                                       cam, cfg)
jax.block_until_ready(state.Tfw)

logdir = "/tmp/vo_trace"
with jax.profiler.trace(logdir):
    for i in range(2, 6):
        state, _ = batched.vo_step_batched(state, frames[i][0], frames[i][1],
                                           cam, cfg)
    jax.block_until_ready(state.Tfw)

for name, ms, cnt in profiling.summarize_trace(logdir, top=40):
    print(f"{ms:9.3f} ms  x{cnt:4d}  {name}")
