"""Micro-profile the internal stages of ops/lsd.py on the current backend."""

import os
import sys
import time
import math

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stvo_pl_tpu.ops import lsd
    from stvo_pl_tpu.ops.image import gaussian_blur

    B = 8  # batch 4 x LR
    H, W = 370, 1226
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    min_len = 0.025 * min(H, W)

    full = jax.jit(jax.vmap(lambda im: lsd.detect_line_segments(
        im, min_len, capacity=300)))
    print(f"full lsd (B={B}): {timeit(full, (imgs,)):8.2f} ms")

    # stage: blur + level line field
    def field(im):
        sm = gaussian_blur(im, 0.8)
        return lsd.level_line_field(sm)
    f_field = jax.jit(jax.vmap(field))
    print(f"blur+field:       {timeit(f_field, (imgs,)):8.2f} ms")

    ang, mag = f_field(imgs)

    tol = math.radians(22.5)
    rho = 2.0 / math.sin(tol)

    # stage: all 16 directions detection only
    def detect_dirs(ang, mag):
        outs = []
        for (dx, dy) in lsd.DIR_STEPS:
            theta = math.atan2(dy, dx) % math.pi
            aligned = (lsd._angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
            outs.append(lsd._detect_one_direction(
                aligned, mag, (dx, dy), 64, min_len))
        return tuple(jnp.concatenate(t) for t in zip(*outs))
    f_dirs = jax.jit(jax.vmap(detect_dirs))
    print(f"16-dir detect:    {timeit(f_dirs, (ang, mag)):8.2f} ms")

    xs, ys, xe, ye, ln, sup, v = f_dirs(ang, mag)

    # stage: refine
    f_ref = jax.jit(jax.vmap(lambda ang, mag, xs, ys, xe, ye, v:
                             lsd._refine_segments(ang, mag, xs, ys, xe, ye, v,
                                                  tol)))
    print(f"refine:           {timeit(f_ref, (ang, mag, xs, ys, xe, ye, v)):8.2f} ms")

    sp, ep, density, ok = f_ref(ang, mag, xs, ys, xe, ye, v)
    length = jnp.linalg.norm(ep - sp, axis=-1)

    # stage: merge + suppress + topk
    def post(sp, ep, length, v):
        sp, ep, length, v = lsd._merge_collinear(
            sp, ep, length, v, ang_tol=tol * 0.5, perp_tol=2.5, gap_tol=6.0)
        resp = jnp.where(v, length, 0.0)
        v = lsd._suppress_duplicates(sp, ep, resp, v, perp_tol=4.0,
                                     overlap_tol=0.4)
        resp = jnp.where(v, length, 0.0)
        top, pos = jax.lax.top_k(resp, 300)
        return top, pos
    f_post = jax.jit(jax.vmap(post))
    print(f"merge+dup+topk:   {timeit(f_post, (sp, ep, length, ok)):8.2f} ms")

    # single-direction breakdown: mask vs doubling vs tile-reduce/topk
    (dx, dy) = (1, 0)
    theta = 0.0
    def mk_aligned(ang, mag):
        return (lsd._angle_dist_mod_pi(ang, theta) < tol) & (mag > rho)
    f_al = jax.jit(jax.vmap(mk_aligned))
    print(f"1-dir aligned:    {timeit(f_al, (ang, mag)):8.2f} ms")
    aligned = f_al(ang, mag)
    f_one = jax.jit(jax.vmap(lambda a, m: lsd._detect_one_direction(
        a, m, (dx, dy), 64, min_len)))
    print(f"1-dir detect:     {timeit(f_one, (aligned, mag)):8.2f} ms")


if __name__ == "__main__":
    main()
