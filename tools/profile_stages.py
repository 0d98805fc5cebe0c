"""Per-stage device timing of the VO pipeline on the current backend.

Times each stage in isolation (own jit, donated where possible) at the
bench configuration (KITTI-scale 1226x370, reference default budgets),
batch B, so HBM-bound stages show their real cost.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=10, warmup=2):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    args_cli = ap.parse_args()
    B = args_cli.batch

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models import frame, frontend
    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.ops import fast as fast_ops
    from stvo_pl_tpu.ops import hamming, lbd, lsd, matching, orb
    from stvo_pl_tpu.ops.image import gaussian_blur, sobel

    cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                               b=0.5372, width=1226, height=370)
    cfg = VOConfig()
    rng = np.random.default_rng(0)
    H, W = 370, 1226
    img = jnp.asarray(rng.uniform(0, 255, (B, 2, H, W)).astype(np.float32))
    fast_th = jnp.full((B,), float(cfg.orb_fast_th), jnp.float32)
    min_len = jnp.full((B,), 0.025 * min(H, W), jnp.float32)

    results = {}

    # --- full pipeline per-frame step (batched) ---
    from stvo_pl_tpu.parallel import batched
    state = batched.init_batched_state(cfg, B)
    step = jax.jit(lambda s, il, ir: batched.vo_step_batched(s, il, ir, cam, cfg))
    results["full_vo_step"] = timeit(step, (state, img[:, 0], img[:, 1]))

    # --- extract only ---
    ext = jax.jit(jax.vmap(
        lambda il, ir, ft, ml: frame.extract_stereo_features(
            il, ir, ft, ml, cam, cfg)))
    results["extract_stereo_features"] = timeit(
        ext, (img[:, 0], img[:, 1], fast_th, min_len))

    # --- point detection (both eyes) ---
    det_pts = jax.jit(jax.vmap(lambda im2, ft: jax.vmap(
        lambda im: frame.detect_points_multilevel(im, ft, cfg))(im2)))
    results["detect_points_LR"] = timeit(det_pts, (img, fast_th))

    # fast score only (level 0, both eyes)
    fs = jax.jit(lambda im2, ft: fast_ops.fast_score(im2, ft[:, None, None, None]))
    results["fast_score_L0_LR"] = timeit(fs, (img, fast_th))

    # select_keypoints only
    score = fs(img, fast_th)
    sel = jax.jit(jax.vmap(jax.vmap(
        lambda s: fast_ops.select_keypoints(s, 600, edge=cfg.orb_edge_th,
                                            cell=4))))
    results["select_keypoints_L0_LR"] = timeit(sel, (score,))

    # orb describe only
    blur = jax.jit(lambda x: gaussian_blur(x, 2.0, radius=3))(img)
    uv, sc, v = sel(score)
    desc_fn = jax.jit(jax.vmap(jax.vmap(orb.orient_and_describe)))
    results["orb_describe_L0_LR"] = timeit(desc_fn, (img, blur, uv))

    # gaussian blur alone
    results["gaussian_blur_r3_LR"] = timeit(
        jax.jit(lambda x: gaussian_blur(x, 2.0, radius=3)), (img,))

    # --- line stack ---
    det_lines = jax.jit(jax.vmap(jax.vmap(
        lambda im, ml: lsd.detect_line_segments(
            im, ml, capacity=cfg.line_capacity, n_dirs=cfg.lsd_n_dirs,
            ang_th_deg=cfg.lsd_ang_th, quant=cfg.lsd_quant,
            density_th=cfg.lsd_density_th, refine=not cfg.use_fld_lines),
        in_axes=(0, None)), in_axes=(0, 0)))
    results["lsd_detect_LR"] = timeit(det_lines, (img, min_len))

    segs = det_lines(img, min_len)
    sob = jax.jit(sobel)
    gx, gy = sob(img)
    lbd_fn = jax.jit(jax.vmap(jax.vmap(
        lambda gx, gy, sp, ep: lbd.compute_lbd(gx, gy, sp, ep))))
    results["sobel_LR"] = timeit(sob, (img,))
    results["lbd_LR"] = timeit(lbd_fn, (gx, gy, segs.sp, segs.ep))

    # --- matching ---
    K = cfg.point_capacity
    d1 = jnp.asarray(rng.integers(0, 2**31, (B, K, 8), dtype=np.int64)
                     .astype(np.int32))
    d2 = jnp.asarray(rng.integers(0, 2**31, (B, K, 8), dtype=np.int64)
                     .astype(np.int32))
    ham = jax.jit(jax.vmap(
        lambda a, b: hamming.hamming_matrix(a, b, cfg.hamming_use_mxu)))
    results["hamming_matrix_pts"] = timeit(ham, (d1, d2))

    dist = ham(d1, d2)
    candm = jnp.ones(dist.shape, bool)
    nnr = jax.jit(jax.vmap(
        lambda d, c: matching.nnr_mutual_match(d, c, cfg.min_ratio_12_p,
                                               mutual=cfg.best_lr_matches)))
    results["nnr_mutual_pts"] = timeit(nnr, (dist, candm))

    # --- optimizer (pose GN on synthetic matched sets) ---
    from stvo_pl_tpu.models import optimizer as opt
    feats = ext(img[:, 0], img[:, 1], fast_th, min_len)
    state2, _ = step(state, img[:, 0], img[:, 1])
    opt_fn = jax.jit(jax.vmap(lambda pm, lm: opt.optimize_pose(
        pm, lm, jnp.eye(4), cam, cfg)))
    try:
        from stvo_pl_tpu.models.frontend import _to_matches  # type: ignore
        pm = None
    except Exception:
        pm = None
    # time the full step minus extraction as a proxy for optimize+match
    results["(full - extract)"] = (results["full_vo_step"]
                                   - results["extract_stereo_features"])

    per_frame = {k: v / (B * (2 if k.endswith('_LR') else 1))
                 for k, v in results.items()}
    print(f"batch={B}  backend={jax.default_backend()}")
    print(f"{'stage':34s} {'total ms':>9s} {'ms/frame-eye':>13s}")
    for k, v in results.items():
        print(f"{k:34s} {v:9.2f} {per_frame[k]:13.3f}")


if __name__ == "__main__":
    main()
