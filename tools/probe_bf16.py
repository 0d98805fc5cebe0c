"""Probe: dense front-end stencils in bf16 vs f32 (dev tool)."""
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


def timeit(fn, args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
B = 8
img = rng.integers(0, 256, (B, 2, 370, 1226)).astype(np.float32)
x32 = jnp.asarray(img)
x16 = jnp.asarray(img.astype(np.dtype("bfloat16")))
th32 = jnp.full((B,), 20.0, jnp.float32)
th16 = th32.astype(jnp.bfloat16)

blur = jax.jit(lambda x: gaussian_blur(x, 2.0, radius=3))
sob = jax.jit(sobel)
fs = jax.jit(lambda im, t: fast_ops.fast_score(im, t[:, None, None, None]))

print("blur  f32 :", timeit(blur, (x32,)))
print("blur  bf16:", timeit(blur, (x16,)))
print("sobel f32 :", timeit(sob, (x32,)))
print("sobel bf16:", timeit(sob, (x16,)))
print("fast  f32 :", timeit(fs, (x32, th32)))
try:
    print("fast  bf16:", timeit(fs, (x16, th16)))
except Exception as e:
    print("fast bf16 failed:", type(e).__name__, str(e)[:200])
