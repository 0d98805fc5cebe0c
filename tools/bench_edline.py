"""Batched TPU cost of the EDLine quality mode vs the dense default
(dev tool; ablate_step.py methodology — donated state chained through
every dispatch so the tunnel cannot elide repeats).

The CLI (unbatched, pipelined) measured 216 ms/frame edline vs 145 dense
after the node-compaction rework; this quantifies what the QUALITY mode
costs on the bench's batched path (BASELINE.md round-3 log).
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

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
rng = np.random.default_rng(0)


def timeit(step, state, img, n=15, warmup=3):
    for _ in range(warmup):
        state, _ = step(state, img[:, 0], img[:, 1])
    jax.block_until_ready(state.Tfw)
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = step(state, img[:, 0], img[:, 1])
    jax.block_until_ready(state.Tfw)
    return (time.perf_counter() - t0) / n * 1e3


for B in (8, 1):
    img = jnp.asarray(rng.uniform(0, 255, (B, 2, 370, 1226)
                                  ).astype(np.float32))
    for name, cfg in [
        ("dense", VOConfig()),
        ("edline", VOConfig(use_edlines=True)),
    ]:
        state = batched.init_batched_state(cfg, B)
        step = lambda s, il, ir, c=cfg: batched.vo_step_batched(
            s, il, ir, cam, c)
        ms = timeit(step, state, img)
        print(f"B={B} {name:8s} step={ms:8.2f} ms  fps={B / ms * 1e3:8.1f}",
              flush=True)
