"""Micro-probe: approx_max_k vs top_k; strided slice in Mosaic (dev)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.PRNGKey(0)
x = jax.random.randint(key, (8, 90240), 0, 1 << 20, jnp.int32)


def timeit(name, f, *a, n=20):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{(time.perf_counter() - t0) / n * 1e3:8.2f} ms  {name}")
    return r


t1 = timeit("top_k 600 x8 (i32)", jax.jit(lambda v: jax.lax.top_k(v, 600)), x)
xf = x.astype(jnp.float32)
t2 = timeit("approx_max_k 600 x8 (f32)",
            jax.jit(lambda v: jax.lax.approx_max_k(v, 600)), xf)
t3 = timeit("approx_max_k 600 rt.99 x8",
            jax.jit(lambda v: jax.lax.approx_max_k(
                v, 600, recall_target=0.99)), xf)
import numpy as np
v1 = np.asarray(t1[0][0])
v2 = np.asarray(t2[0][0]).astype(np.int64)
print("recall@600 of approx:", len(set(v2) & set(v1)) / 600)

# strided row extraction inside pallas
def kernel(in_ref, out_ref):
    m = in_ref[0]
    out_ref[0] = m[::8, :]

try:
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 47, 1280), jnp.int32),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 376, 1280), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 47, 1280), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM))
    f = jax.jit(call)
    a = jnp.arange(376 * 1280, dtype=jnp.int32).reshape(1, 376, 1280)
    out = f(a)
    ok = bool((out[0, :, 0] == a[0, ::8, 0]).all())
    print("strided sublane slice in pallas: OK" if ok else "WRONG VALUES")
except Exception as e:
    print("strided slice failed:", str(e)[:200])
