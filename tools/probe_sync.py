"""Probe: is block_until_ready actually syncing on this backend?  Time the
same op with (a) block_until_ready and (b) a forced scalar readback."""
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

from stvo_pl_tpu.ops.image import gaussian_blur

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 255, (8, 2, 370, 1226)).astype(np.float32))
blur = jax.jit(lambda v: gaussian_blur(v, 2.0, radius=3))


def t_block(n=20):
    out = blur(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = blur(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def t_read(n=20):
    float(blur(x).ravel()[-1])
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(n):
        s += float(blur(x).ravel()[-1])
    return (time.perf_counter() - t0) / n * 1e3


def t_chain(n=20):
    # dependency chain: each call consumes the previous output
    y = blur(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = blur(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1e3


print("block_until_ready :", t_block())
print("scalar readback   :", t_read())
print("dependency chain  :", t_chain())
print("block again       :", t_block())
