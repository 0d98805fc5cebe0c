"""Compare fused Pallas FAST kernel with the XLA path on TPU (dev tool)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.ops import camera as cam_ops, fast as fast_ops
from stvo_pl_tpu.utils import synthetic

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(2, speed=0.8)
seq_l, _ = synthetic.render_sequence(scene, poses, cam)
img = seq_l[0]
th = jnp.float32(20.0)
CAP, EDGE = 527, 19

# XLA reference (subpix offsets from the same thresholded score surface)
score = fast_ops.fast_score(img, th)
uv0, sc0, v0 = fast_ops.select_keypoints(score, CAP, edge=EDGE, cell=4,
                                         offset_src=score)
uv0, sc0, v0 = np.asarray(uv0), np.asarray(sc0), np.asarray(v0)

# fused kernel
uv1, sc1, v1 = jax.jit(
    lambda im, t: fast_ops.detect_keypoints(im, t, CAP, edge=EDGE, cell=4)
)(img, th)
uv1, sc1, v1 = np.asarray(uv1), np.asarray(sc1), np.asarray(v1)

n0, n1 = v0.sum(), v1.sum()
# compare integer anchors (round undoes the +-0.5 sub-pixel refinement)
set0 = {tuple(p) for p in np.round(uv0[v0]).astype(int)}
set1 = {tuple(p) for p in np.round(uv1[v1]).astype(int)}
inter = len(set0 & set1)
print(f"XLA: {n0} kp, Pallas: {n1} kp, common: {inter} "
      f"({inter / max(n0, 1):.3f} of XLA)")
miss = sorted(set0 - set1)[:5]
extra = sorted(set1 - set0)[:5]
print("only XLA:", miss)
print("only Pallas:", extra)
sd = np.abs(np.sort(sc0[v0])[::-1][:n1] - np.sort(sc1[v1])[::-1][:n1])
print("score diff (sorted, max):", sd.max() if sd.size else 0)
# fractional agreement at common anchors (kernel quantizes to 1/31 and
# fits the un-thresholded surface; expect < ~0.1 px typical difference)
m0 = {tuple(p): uv0[v0][i] for i, p in
      enumerate(np.round(uv0[v0]).astype(int))}
m1 = {tuple(p): uv1[v1][i] for i, p in
      enumerate(np.round(uv1[v1]).astype(int))}
common = set0 & set1
if common:
    fd = np.array([np.abs(m0[c] - m1[c]).max() for c in common])
    print(f"subpix frac diff at common anchors: mean {fd.mean():.4f} "
          f"max {fd.max():.4f}")

# timing x8
imgs8 = jnp.broadcast_to(img, (8,) + img.shape)
th8 = jnp.full((8,), 20.0, jnp.float32)
f = jax.jit(jax.vmap(lambda im, t: fast_ops.detect_keypoints(
    im, t, CAP, edge=EDGE, cell=4)))
r = jax.block_until_ready(f(imgs8, th8))
t0 = time.perf_counter()
for _ in range(20):
    r = f(imgs8, th8)
jax.block_until_ready(r)
print(f"fused detect x8: {(time.perf_counter() - t0) / 20 * 1e3:.2f} ms")
