"""Where detect_edlines' TPU time goes: knob ablation at bench shape
(dev tool).  State is chained (the detected endpoints perturb the next
input at f32-surviving magnitude) so the tunnel cannot elide repeats.
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

from stvo_pl_tpu.ops.edline import detect_edlines

H, W = 370, 1226
rng = np.random.default_rng(0)
base = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))


def timeit(fn, n=10, warmup=2):
    # perturbation must be GUARANTEED nonzero and survive f32 rounding at
    # img magnitude ~255 (sp[0,0] alone can legitimately be 0.0 -> full
    # backend elision, 0.3 ms readings for a 226 ms graph)
    img = base
    for _ in range(warmup):
        segs = fn(img)
        img = img + (jnp.abs(segs.sp).sum() * 1e-6 + 0.01)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(n):
        segs = fn(img)
        img = img + (jnp.abs(segs.sp).sum() * 1e-6 + 0.01)
    jax.block_until_ready(img)
    return (time.perf_counter() - t0) / n * 1e3


VARIANTS = [
    ("baseline (12r/2s/8rr/32K)", {}),
    ("n_rounds=8", {"n_rounds": 8}),
    ("relabel_rounds=4", {"relabel_rounds": 4}),
    ("split_rounds=1", {"split_rounds": 1}),
    ("split_rounds=0", {"split_rounds": 0}),
    ("node_capacity=16384", {"node_capacity": 16384}),
]

for name, kw in VARIANTS:
    fn = jax.jit(lambda im, kw=kw: detect_edlines(
        im, jnp.float32(12.0), capacity=300, **kw))
    ms = timeit(fn)
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
