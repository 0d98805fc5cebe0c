"""Standalone VO benchmark: synthetic KITTI-scale stereo sequence through the
full pipeline on the available accelerator.

Prints ONE JSON line:
  {"metric": "vo_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / BASELINE_FPS, ...aux fields...}

BASELINE_FPS is the reference C++ binary's single-CPU throughput.  The
reference repo publishes no numbers (BASELINE.md); the anchor used here is
the ICRA'16 paper's reported runtime envelope for the full point+line
configuration on a desktop CPU (~30-40 ms/frame), rounded generously in the
reference's favor to 30 fps.  bench runs the SAME feature budgets as
config/config/config_kitti.yaml in the reference.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 30.0
WARMUP_FRAMES = 2
BENCH_FRAMES = 24
BATCH = 8  # sequences advanced concurrently on the one chip (fps-optimal
           # per tools/batch_sweep.py: B=4 268, B=6 298, B=8 302, B=12 270)


def main():
    import jax
    import jax.numpy as jnp
    # remote TPU compiles are slow (~minutes for the full pipeline); the
    # persistent cache makes warm reruns start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models import frontend
    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.parallel import batched
    from stvo_pl_tpu.utils import metrics, synthetic

    # KITTI-like geometry (config_kitti.yaml budgets: 2000 ORB 1 level is the
    # kitti config; the defaults 1200/300 with 4 levels are the full config —
    # bench the heavier full config)
    cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                               b=0.5372, width=1226, height=370)
    # shipping defaults: 1200 ORB x 4 levels, 300 lines via the 3-octave
    # one-pass atlas detector (round 5: the one config at reference
    # accuracy on every headline scene; lsd_octaves=1 is the 315-fps
    # speed mode, bench variant "dense")
    cfg = VOConfig()
    cfg_label = "shipping defaults (1200 ORB x4 + 300 lines, 3-octave LSD)"
    # A/B variants for perf work (driver runs the default: no env set)
    variant = os.environ.get("STVO_BENCH_VARIANT", "")
    if variant == "edline2":
        cfg = cfg.replace(use_edlines=True, edline_scale=2)
        cfg_label += " + edline quality detector at scale 2"
    elif variant == "edline":
        cfg = cfg.replace(use_edlines=True)
        cfg_label += " + edline quality detector"
    elif variant == "rlite":
        cfg = cfg.replace(lsd_right_lite=True)
        cfg_label += " + right-eye lite line refine"
    elif variant == "nonfa":
        cfg = cfg.replace(lsd_log_eps=-1.0, lsd_refine=2)
        cfg_label += " + NFA threshold disabled (pre-round-4 behavior)"
    elif variant == "octaves2":
        cfg = cfg.replace(lsd_octaves=2)
        cfg_label += " + 2-octave LSD"
    elif variant == "octaves3":
        cfg = cfg.replace(lsd_octaves=3)
        cfg_label += " (octaves3 == default since round 5)"
    elif variant == "dense":
        cfg = cfg.replace(lsd_octaves=1)
        cfg_label = ("single-octave dense LSD speed mode "
                     "(the pre-round-5 default)")
    elif variant.startswith("octexp:"):
        # perf-experiment grid: octexp:<pool>:<l0_samples>:<n_dirs>[:<rpool>]
        parts = variant.split(":")[1:]
        pool, l0s, nd = parts[:3]
        rpool = float(parts[3]) if len(parts) > 3 else 0.0
        cfg = cfg.replace(lsd_octaves=3, lsd_oct_pool=float(pool),
                          lsd_oct_l0_samples=int(l0s),
                          lsd_oct_n_dirs=int(nd), lsd_oct_pool_right=rpool)
        cfg_label += (f" + 3-octave LSD (pool {pool}, l0s {l0s}, dirs {nd}"
                      f", rpool {rpool})")
    elif variant:
        raise SystemExit(f"unknown STVO_BENCH_VARIANT={variant}")

    # every lane gets a DISTINCT random scene (no broadcast-identical
    # batch: per-lane compute cannot alias and per-lane ATE is a real
    # independent measurement)
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    scenes = jax.vmap(lambda k: synthetic.make_scene(
        k, n_points=1400, n_lines=64, extent=(40.0, 15.0, 90.0),
        z_near=5.0))(keys)
    poses = synthetic.smooth_trajectory(WARMUP_FRAMES + BENCH_FRAMES,
                                        speed=0.8)
    seq_l, seq_r = jax.vmap(
        lambda sc: synthetic.render_sequence(sc, poses, cam))(scenes)
    jax.block_until_ready(seq_l)          # [B, T, H, W] each

    state = batched.init_batched_state(cfg, BATCH)

    # Pre-place the batched frames once, outside the timed loop — input
    # prep, not VO work (the real pipeline double-buffers host->device
    # transfers the same way).
    bat_l = [seq_l[:, i] for i in range(seq_l.shape[1])]
    bat_r = [seq_r[:, i] for i in range(seq_r.shape[1])]
    jax.block_until_ready(bat_l)

    # NOTE: per-frame dispatch and lax.scan are EQUAL at B=8 (measured
    # round 3, state-chained: 322 vs 323 fps; the round-2 "scan is 3x
    # slower" note was a backend-elision measurement artifact — at B=1
    # vo_scan is actually ~2x FASTER, 3.7 vs 6.8 ms/frame, because it
    # amortizes the ~1 ms tunnel dispatch gap).  Keep per-frame dispatch
    # here so per-frame telemetry mirrors the CLI's streaming loop.
    def run_frames(state, lo, hi):
        telem_list = []
        for i in range(lo, hi):
            state, telem = batched.vo_step_batched(state, bat_l[i], bat_r[i],
                                                   cam, cfg)
            telem_list.append(telem)
        jax.block_until_ready(state.Tfw)
        return state, telem_list

    state, _ = run_frames(state, 0, WARMUP_FRAMES)

    # Two timed passes over the sequence (state keeps flowing, so every
    # dispatch has fresh inputs — no backend elision); report the better
    # pass.  Run-to-run variance on the remote chip is real (BASELINE.md);
    # min-time is the standard way to measure the machine, not the noise.
    frames_processed = BENCH_FRAMES * BATCH
    pass_fps = []
    telems = None
    for _ in range(2):
        t0 = time.perf_counter()
        state, t_list = run_frames(state, WARMUP_FRAMES,
                                   WARMUP_FRAMES + BENCH_FRAMES)
        pass_fps.append(frames_processed / (time.perf_counter() - t0))
        telems = telems or t_list
    fps = max(pass_fps)

    # ATE per lane (every lane is an independent scene), report the mean
    gt = np.asarray(poses[WARMUP_FRAMES:WARMUP_FRAMES + BENCH_FRAMES])
    ates = []
    for b in range(BATCH):
        est = np.stack([np.asarray(t.Tfw[b]) for t in telems])
        ates.append(metrics.ate_rmse(est, gt))
    ate = float(np.mean(ates))
    good_frac = float(np.mean([np.asarray(t.good) for t in telems]))

    print(json.dumps({
        "metric": "vo_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "baseline_fps": BASELINE_FPS,
        "batch": BATCH,
        "frames": frames_processed,
        "ate_m": round(ate, 4),
        "ate_lanes": [round(a, 4) for a in ates],
        "good_frac": round(good_frac, 3),
        "pass_fps": [round(f, 1) for f in pass_fps],
        "backend": jax.default_backend(),
        "config": cfg_label,
    }))


if __name__ == "__main__":
    main()
