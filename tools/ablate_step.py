"""Marginal composed-step cost: full vs points-only vs lines-only (dev tool).

Isolated per-stage timings overstate (XLA overlaps independent chains); the
ablation differences show what each chain costs in context.
"""
import os
import sys
import time

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

B = 8
cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (B, 2, 370, 1226)).astype(np.float32))


def timeit(step, state, n=20, warmup=3):
    # state is donated: always flow it forward
    for _ in range(warmup):
        state, _ = step(state, img[:, 0], img[:, 1])
    jax.block_until_ready(state.Tfw)
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = step(state, img[:, 0], img[:, 1])
    jax.block_until_ready(state.Tfw)
    return (time.perf_counter() - t0) / n * 1e3


for name, cfg in [
    ("full", VOConfig()),
    ("points-only", VOConfig(has_lines=False)),
    ("lines-only", VOConfig(has_points=False)),
]:
    state = batched.init_batched_state(cfg, B)
    step = lambda s, il, ir, c=cfg: batched.vo_step_batched(s, il, ir, cam, c)
    ms = timeit(step, state)
    print(f"{name:12s} step={ms:7.2f} ms  fps={B / ms * 1e3:8.1f}")
