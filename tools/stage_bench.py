"""Per-stage device timing of the VO front end at bench config (dev tool)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frame as frame_mod
from stvo_pl_tpu.ops import camera as cam_ops, fast as fast_ops, orb, lsd, lbd, hamming, matching
from stvo_pl_tpu.ops.image import gaussian_blur, resize_bilinear, sobel
from stvo_pl_tpu.utils import synthetic

BATCH = 4
cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(2, speed=0.8)
seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)
img = seq_l[0]
imgs8 = jnp.broadcast_to(img, (BATCH*2,) + img.shape)  # batch*L/R fold
fast_th = jnp.full((), float(cfg.orb_fast_th), jnp.float32)
fast_th8 = jnp.full((BATCH*2,), float(cfg.orb_fast_th), jnp.float32)
mll = jnp.full((), 0.02 * min(cam.width, cam.height), jnp.float32)

def timeit(name, f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{dt:8.2f} ms  {name}")
    return r

# full detect points multilevel on 8 images
dp = jax.jit(jax.vmap(lambda im, th: frame_mod.detect_points_multilevel(im, th, cfg)))
timeit("detect_points_multilevel x8", dp, imgs8, fast_th8)

# FAST score only, level 0, x8
fs = jax.jit(jax.vmap(lambda im: fast_ops.fast_score(im, fast_th)))
timeit("fast_score L0 x8", fs, imgs8)

sk = jax.jit(lambda sm: jax.vmap(lambda s: fast_ops.select_keypoints(s, 527, edge=cfg.orb_edge_th, cell=4))(sm))
smaps = fs(imgs8)
timeit("select_keypoints L0 x8", sk, smaps)

gb = jax.jit(jax.vmap(lambda im: gaussian_blur(im, 2.0, radius=3)))
timeit("gaussian_blur r3 x8", gb, imgs8)

uv0 = sk(smaps)[0]
ob = jax.jit(jax.vmap(lambda im, bl, uv: orb.orient_and_describe(im, bl, uv)))
blurs = gb(imgs8)
timeit("orient_and_describe L0 x8", ob, imgs8, blurs, uv0)

ls = jax.jit(jax.vmap(lambda im: lsd.detect_line_segments(
    im, mll, capacity=cfg.line_capacity, n_dirs=cfg.lsd_n_dirs,
    ang_th_deg=cfg.lsd_ang_th, quant=cfg.lsd_quant,
    density_th=cfg.lsd_density_th, refine=not cfg.use_fld_lines)))
segs = timeit("lsd.detect x8", ls, imgs8)

sb = jax.jit(jax.vmap(sobel))
gxy = timeit("sobel x8", sb, imgs8)

lb = jax.jit(jax.vmap(lambda gx, gy, sp, ep: lbd.compute_lbd(gx, gy, sp, ep)))
timeit("lbd x8", lb, gxy[0], gxy[1], segs.sp, segs.ep)

# matching: stereo points (per batch elem: 1200x1200)
desc = ob(imgs8, blurs, uv0)[0]
hm = jax.jit(jax.vmap(lambda a, b: hamming.hamming_matrix(a, b, cfg.hamming_use_mxu)))
d4a = jnp.broadcast_to(desc[0], (BATCH,) + desc[0].shape)
timeit("hamming 527x527 x4", hm, d4a, d4a)

# full front end batched
ext = jax.jit(jax.vmap(lambda il, ir: frame_mod.extract_stereo_features(
    il, ir, fast_th, mll, cam, cfg)))
il4 = jnp.broadcast_to(img, (BATCH,) + img.shape)
timeit("extract_stereo_features x4(batch)", ext, il4, il4, n=5)
