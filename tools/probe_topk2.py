"""Narrow down the pooled-top_k slowness (dev)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)


def timeit(name, f, *a, n=20):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")
    return r


p = jax.random.randint(key, (8, 12, 47, 160), 0, 1 << 20, jnp.int32)
timeit("reshape+top_k600 vmapped",
       jax.jit(jax.vmap(lambda q: jax.lax.top_k(q.reshape(-1), 600))), p)
timeit("reshape only",
       jax.jit(jax.vmap(lambda q: q.reshape(-1) + 1)), p)

big = jax.random.randint(key, (8, 12, 376, 1280), 0, 1 << 20, jnp.int32)
timeit("reduce_window 8x8 (fresh rand)",
       jax.jit(jax.vmap(lambda q: jax.lax.reduce_window(
           q, 0, jax.lax.max, (1, 8, 8), (1, 8, 8), "VALID"))), big)
# row-pool then lane-pool as separate windows
timeit("reduce_window (1,8,1)+(1,1,8)",
       jax.jit(jax.vmap(lambda q: jax.lax.reduce_window(
           jax.lax.reduce_window(q, 0, jax.lax.max, (1, 8, 1), (1, 8, 1),
                                 "VALID"),
           0, jax.lax.max, (1, 1, 8), (1, 1, 8), "VALID"))), big)
# reshape-pool: [12,376,1280]->[12,47,8,160,8] max
timeit("reshape-pool",
       jax.jit(jax.vmap(lambda q: q.reshape(12, 47, 8, 160, 8).max(
           axis=(2, 4)))), big)
