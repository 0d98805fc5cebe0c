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
from stvo_pl_tpu.utils import profiling

B = 8
cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
# random-noise frames: identical shapes/graph to bench.py (which is the
# compile-cache-warm program); rendering a synthetic scene here would cost
# its own multi-minute cold compile for no attribution benefit
rng = np.random.default_rng(0)
state = batched.init_batched_state(cfg, B)
frames = [tuple(jnp.asarray(
    rng.uniform(0, 255, (B, 370, 1226)).astype(np.float32))
    for _ in range(2)) for _ in range(6)]
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
