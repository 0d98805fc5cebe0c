"""Probe: dense front-end stencils in bf16 vs f32 (dev tool).

MEASUREMENT RULE (see probe_sync.py): the axon backend elides repeated
identical executions — time ops either by chaining each call on the
previous output, or by cycling through a pool of distinct inputs, and only
block at the end.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.ops import fast as fast_ops
from stvo_pl_tpu.ops.image import gaussian_blur, sobel


def t_chain(fn, x0, n=20):
    """fn: shape/dtype-preserving; chain calls."""
    y = fn(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1e3


def t_pool(fn, pool, n_rounds=3):
    """fn over a pool of distinct inputs; block at end."""
    out = fn(pool[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    k = 0
    for _ in range(n_rounds):
        for x in pool:
            out = fn(x)
            k += 1
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / k * 1e3


rng = np.random.default_rng(0)
B = 8
img = rng.integers(0, 256, (B, 2, 370, 1226)).astype(np.float32)
x32 = jnp.asarray(img)
x16 = x32.astype(jnp.bfloat16)

blur = jax.jit(lambda x: gaussian_blur(x, 2.0, radius=3))
print("blur  f32 chain :", t_chain(blur, x32))
print("blur  bf16 chain:", t_chain(blur, x16))

sob32 = jax.jit(lambda x: sum(jnp.abs(g) for g in sobel(x)) / 8.0)
print("sobel f32 chain :", t_chain(sob32, x32))
print("sobel bf16 chain:", t_chain(sob32, x16))

fs32 = jax.jit(lambda im: fast_ops.fast_score(
    im, jnp.full((B,), 20.0, im.dtype)[:, None, None, None]) + im * 0.001)
print("fast  f32 chain :", t_chain(fs32, x32))
print("fast  bf16 chain:", t_chain(fs32, x16))

# select_keypoints: not shape-preserving -> distinct-input pool
score32 = [jnp.asarray((rng.uniform(0, 100, (16, 370, 1226)) *
                        (rng.uniform(0, 1, (16, 370, 1226)) < 0.02))
                       .astype(np.float32)) for _ in range(8)]
sel = jax.jit(jax.vmap(lambda s: fast_ops.select_keypoints(s, 600, edge=19,
                                                           cell=4)))
print("select pool f32 :", t_pool(sel, score32))
