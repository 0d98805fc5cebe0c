"""Probe: lax.top_k vs approx_max_k at select_keypoints shapes (dev tool)."""
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
B = 16  # batch x eyes
N = 93 * 307  # cell maxima at 370x1226, cell=4
K = 600
x = jnp.asarray(rng.uniform(0, 100, (B, N)).astype(np.float32))

exact = jax.jit(jax.vmap(lambda v: jax.lax.top_k(v, K)))
approx = jax.jit(jax.vmap(
    lambda v: jax.lax.approx_max_k(v, K, recall_target=0.95)))
approx99 = jax.jit(jax.vmap(
    lambda v: jax.lax.approx_max_k(v, K, recall_target=0.99)))

print("exact top_k :", timeit(exact, (x,)), "ms")
print("approx 0.95 :", timeit(approx, (x,)), "ms")
print("approx 0.99 :", timeit(approx99, (x,)), "ms")

# recall check
te = np.asarray(exact(x)[0])
ta = np.asarray(approx(x)[0])
print("recall@0.95 vs exact:", np.mean([
    len(np.intersect1d(te[i], ta[i])) / K for i in range(B)]))
