"""Fine-grained in-context ablation of the composed VO step (dev tool).

Monkeypatches ONE hot stage at a time with a shape-identical cheap stand-in
and re-times the FULL composed step (bench shapes, B=8, donated state).
The delta (full - variant) is that stage's true marginal cost in context —
isolated stage timings overstate or understate (XLA fusion/overlap), and
the axon backend makes sub-ms isolated numbers unusable (see BASELINE.md).

Each variant is a separate full-pipeline compile: expect minutes per
variant on a cold remote-compile cache.

Usage: python tools/ablate_fine.py [--variants full,lbd_zero,...] [-n 20]
"""
import argparse
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
if "--cpu" in sys.argv:  # smoke-test mode (env vars are too late: the axon
    sys.argv.remove("--cpu")  # site hook imports jax at interpreter startup)
    jax.config.update("jax_platforms", "cpu")

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import optimizer as opt_mod
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import lbd as lbd_mod
from stvo_pl_tpu.ops import lsd as lsd_mod
from stvo_pl_tpu.ops import orb as orb_mod
from stvo_pl_tpu.ops import hamming as ham_mod
from stvo_pl_tpu.parallel import batched

SMALL = "--small" in sys.argv
if SMALL:
    sys.argv.remove("--small")
B = 2 if SMALL else 8
H, W = (180, 240) if SMALL else (370, 1226)
cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=W / 2, cy=H / 2,
                           b=0.5372, width=W, height=H)
cfg = VOConfig()
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (B, 2, H, W)).astype(np.float32))

_ORIG = {
    "compute_lbd": lbd_mod.compute_lbd,
    "_refine_segments": lsd_mod._refine_segments,
    "gather_patches": orb_mod.gather_patches,
    "describe": orb_mod.describe,
    "optimize_pose": opt_mod.optimize_pose,
    "hamming_matrix": ham_mod.hamming_matrix,
}


def restore():
    lbd_mod.compute_lbd = _ORIG["compute_lbd"]
    lsd_mod._refine_segments = _ORIG["_refine_segments"]
    orb_mod.gather_patches = _ORIG["gather_patches"]
    orb_mod.describe = _ORIG["describe"]
    opt_mod.optimize_pose = _ORIG["optimize_pose"]
    ham_mod.hamming_matrix = _ORIG["hamming_matrix"]


def lbd_zero():
    def fake(gx, gy, sp, ep):
        K = sp.shape[0]
        # consume inputs so the Sobel feed is not dead-code-eliminated;
        # fold z into BOTH outputs — call sites discard the float one
        # (frame.py: "_, desc_b = lbd.compute_lbd(...)")
        z = (gx[0, 0] + gy[0, 0]) * 0.0
        return (jnp.zeros((K, lbd_mod.DESC_F)) + z,
                jnp.zeros((K, 8), jnp.uint32) + z.astype(jnp.uint32))
    lbd_mod.compute_lbd = fake


def refine_skip():
    def fake(ang, mag, xs, ys, xe, ye, valid, tol, n_samples=16, search=2,
             stride=1):
        z = (ang[0, 0] + mag[0, 0]) * 0.0
        sp = jnp.stack([xs + z, ys], axis=-1)
        ep = jnp.stack([xe, ye], axis=-1)
        ones = jnp.ones(xs.shape[0], xs.dtype)
        return sp, ep, ones, valid, ones
    lsd_mod._refine_segments = fake


def patches_zero():
    def fake(img2d, uv, radius=orb_mod.PATCH_R):
        K = uv.shape[0]
        P = 2 * radius + 1
        z = img2d[0, 0] * 0.0 + uv[0, 0] * 0.0
        return jnp.zeros((K, P, P), img2d.dtype) + z
    orb_mod.gather_patches = fake


def describe_cheap():
    def fake(patches, c, s, patch_size=31):
        z = ((patches[0, 0, 0] + c[0] + s[0]) * 0.0).astype(jnp.uint32)
        return jnp.zeros((patches.shape[0], 8), jnp.uint32) + z
    orb_mod.describe = fake


def opt_skip():
    def fake(pm, lm, cam_, cfg_, DT_prev, DT_prev_cov, err_prev):
        dtype = DT_prev.dtype
        # consume the match tensors so matching is not DCE'd
        z = (jnp.sum(pm.obs) + jnp.sum(lm.le_obs)) * 0.0
        est = opt_mod.PoseEstimate(
            DT=jnp.eye(4, dtype=dtype) + z,
            DT_cov=jnp.eye(6, dtype=dtype) * 1e-6,
            DT_cov_eig=jnp.full((6,), 1e-6, dtype),
            err_norm=jnp.asarray(0.5, dtype) + z,
            good=jnp.asarray(True),
            n_inliers_pt=pm.count(), n_inliers_ls=lm.count())
        return est, pm, lm
    opt_mod.optimize_pose = fake


def match_zero():
    def fake(a, b, use_mxu=True):
        z = ((a[0, 0] + b[0, 0]) * 0).astype(jnp.int32)
        return jnp.zeros((a.shape[0], b.shape[0]), jnp.int32) + z
    ham_mod.hamming_matrix = fake


VARIANTS = {
    "full": lambda: None,
    "lbd_zero": lbd_zero,
    "refine_skip": refine_skip,
    "patches_zero": patches_zero,
    "describe_cheap": describe_cheap,
    "opt_skip": opt_skip,
    "match_zero": match_zero,
}


def timeit(n, warmup=3):
    state = batched.init_batched_state(cfg, B)
    for _ in range(warmup):
        state, _ = batched.vo_step_batched(state, img[:, 0], img[:, 1],
                                           cam, cfg)
    jax.block_until_ready(state.Tfw)
    t0 = time.perf_counter()
    for _ in range(n):
        state, _ = batched.vo_step_batched(state, img[:, 0], img[:, 1],
                                           cam, cfg)
    jax.block_until_ready(state.Tfw)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("-n", type=int, default=20)
    args = ap.parse_args()
    names = [v for v in args.variants.split(",") if v]
    base_ms = None
    for name in names:
        restore()
        VARIANTS[name]()
        jax.clear_caches()
        t0 = time.perf_counter()
        ms = timeit(args.n)
        compile_s = time.perf_counter() - t0 - args.n * ms / 1e3
        delta = "" if base_ms is None else f"  delta={base_ms - ms:+7.2f} ms"
        if name == "full":
            base_ms = ms
        print(f"{name:16s} step={ms:7.2f} ms  fps={B / ms * 1e3:7.1f}"
              f"{delta}  (compile {compile_s:.0f}s)", flush=True)
    restore()


if __name__ == "__main__":
    main()
