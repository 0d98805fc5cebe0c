"""Throughput vs per-chip sequence batch: find the fps-optimal BATCH (dev tool)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import batched
from stvo_pl_tpu.utils import synthetic

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(8, speed=0.8)
seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)
jax.block_until_ready(seq_l)

for B in [int(x) for x in (sys.argv[1:] or ["2", "4", "8", "16"])]:
    state = batched.init_batched_state(cfg, B)
    il = jnp.broadcast_to(seq_l[0], (B,) + seq_l[0].shape)
    ir = jnp.broadcast_to(seq_r[0], (B,) + seq_r[0].shape)
    # warmup / compile
    for i in range(2):
        state, _ = batched.vo_step_batched(state, il, ir, cam, cfg)
    jax.block_until_ready(state.Tfw)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, _ = batched.vo_step_batched(state, il, ir, cam, cfg)
    jax.block_until_ready(state.Tfw)
    dt = (time.perf_counter() - t0) / n
    print(f"B={B:3d}  step={dt*1e3:7.2f} ms  fps={B/dt:8.2f}")
