"""Decompose select_keypoints cost at bench shapes (dev tool)."""
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
from stvo_pl_tpu.ops.fast import maxpool3, _border_mask


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
B = 16
H, W = 370, 1226
cell = 4
score = jnp.asarray((rng.uniform(0, 100, (B, H, W)) *
                     (rng.uniform(0, 1, (B, H, W)) < 0.02)).astype(np.float32))

full = jax.jit(jax.vmap(lambda s: fast_ops.select_keypoints(s, 600, edge=19,
                                                            cell=cell)))
print("full select      :", timeit(full, (score,)))


def nms_part(s):
    s = s * _border_mask((H, W), 19, s.dtype)
    eps = (jnp.arange(H * W, dtype=s.dtype).reshape(H, W)
           * jnp.asarray(1e-7, s.dtype))
    z = jnp.where(s > 0, s - eps, 0.0)
    keep = (z >= maxpool3(z)) & (s > 0)
    return jnp.where(keep, z, 0.0)


nms = jax.jit(jax.vmap(nms_part))
print("nms+mask         :", timeit(nms, (score,)))

s1 = nms(score)


def cell_part(s):
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    sp = jnp.pad(s, ((0, Hp - H), (0, Wp - W)))
    tiles = sp.reshape(Hp // cell, cell, Wp // cell, cell)
    tiles = tiles.transpose(0, 2, 1, 3).reshape(Hp // cell, Wp // cell, -1)
    best = jnp.max(tiles, axis=-1)
    arg = jnp.argmax(tiles, axis=-1).astype(jnp.int32)
    return best, arg


cellf = jax.jit(jax.vmap(cell_part))
print("cell reduce      :", timeit(cellf, (s1,)))

best, arg = cellf(s1)


def topk_part(best, arg):
    Wp = -(-W // cell) * cell
    cy = arg // cell
    cx = arg % cell
    gy = (jnp.arange(best.shape[0], dtype=jnp.int32)[:, None] * cell + cy)
    gx = (jnp.arange(best.shape[1], dtype=jnp.int32)[None, :] * cell + cx)
    flat_scores = best.reshape(-1)
    flat_idx = (gy * Wp + gx).reshape(-1)
    top, pos = jax.lax.top_k(flat_scores, 600)
    idx = flat_idx[pos]
    return top, idx


topkf = jax.jit(jax.vmap(topk_part))
print("topk+gather      :", timeit(topkf, (best, arg)))
