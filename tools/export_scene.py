"""Export a synthetic benchmark sequence to disk as 8-bit stereo PNGs +
ground-truth trajectory, so the reference C++ binary (and our CLI) can run
on identical frames.

Usage:
    JAX_PLATFORMS=cpu python tools/export_scene.py OUT_DIR [--frames N]
        [--scene stamps|textured] [--seed K]

Writes OUT_DIR/{image_0,image_1}/%06d.png, OUT_DIR/gt_kitti.txt and a
dataset_params.yaml (reference schema) so stvo_pl_tpu.cli can read the same
directory.
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=26)
    ap.add_argument("--scene", default="stamps",
                    choices=["stamps", "textured", "corridor",
                             "adversarial"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speed", type=float, default=0.8)
    ap.add_argument("--length", type=float, default=0.0,
                    help="world length in m for the world-based scenes "
                         "(default: path length + 120 margin — the "
                         "round-3 1000-frame runs exposed that a camera "
                         "driving past the default 120 m world free-falls "
                         "into featureless coasting)")
    args = ap.parse_args()

    import jax
    # force CPU even when the axon site hook pre-imported jax (env vars are
    # too late by then — see CLAUDE.md); scene export must not contend for
    # the TPU chip
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.utils import metrics, synthetic

    cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                               b=0.5372, width=1226, height=370)
    key = jax.random.PRNGKey(args.seed)
    if args.scene == "stamps":
        poses = synthetic.smooth_trajectory(args.frames, speed=args.speed)
    else:
        # world scenes are straight street canyons: smooth_trajectory's
        # integrated increments random-walk out of the canyon on long runs
        # (38 m of altitude by frame 1000); street_trajectory's bounded
        # offsets stay inside for any horizon
        poses = synthetic.street_trajectory(args.frames, speed=args.speed)
    if args.scene == "stamps":
        scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                                     extent=(40.0, 15.0, 90.0), z_near=5.0)
        seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)
        seq_l = np.asarray(seq_l)
        seq_r = np.asarray(seq_r)
    else:
        from stvo_pl_tpu.utils import world
        L = args.length or (args.frames * args.speed + 120.0)
        kw = dict(length=L)
        if args.scene == "corridor":
            kw["seed"] = args.seed + 100   # distinct facades from textured
        elif args.scene == "adversarial":
            kw.update(seed=args.seed + 200, exposure_amp=0.35)
        else:
            kw["seed"] = args.seed
        scene = world.make_world(**kw)
        seq_l, seq_r = world.render_sequence(scene, np.asarray(poses), cam)

    dl = os.path.join(args.out_dir, "image_0")
    dr = os.path.join(args.out_dir, "image_1")
    os.makedirs(dl, exist_ok=True)
    os.makedirs(dr, exist_ok=True)
    for i in range(args.frames):
        Image.fromarray(np.clip(seq_l[i], 0, 255).astype(np.uint8)).save(
            os.path.join(dl, f"{i:06d}.png"))
        Image.fromarray(np.clip(seq_r[i], 0, 255).astype(np.uint8)).save(
            os.path.join(dr, f"{i:06d}.png"))
    metrics.write_kitti(os.path.join(args.out_dir, "gt_kitti.txt"),
                        np.asarray(poses))
    with open(os.path.join(args.out_dir, "dataset_params.yaml"), "w") as f:
        f.write("images_subfolder_l: image_0\n"
                "images_subfolder_r: image_1\n"
                "cam0:\n"
                "  cam_width: 1226\n  cam_height: 370\n"
                "  cam_fx: 718.856\n  cam_fy: 718.856\n"
                "  cam_cx: 613.0\n  cam_cy: 185.0\n  cam_bl: 0.5372\n"
                "  cam_model: Pinhole\n")
    print(f"wrote {args.frames} stereo pairs to {args.out_dir}")


if __name__ == "__main__":
    main()
