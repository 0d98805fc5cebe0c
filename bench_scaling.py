"""Scaling-efficiency benchmark: batched VO throughput at 1..N devices.

On a real multi-chip host this measures frames/s scaling over the data mesh
(BASELINE.json target: >=80% efficiency to 2+ hosts).  On a single-chip or
CPU environment it validates the sharded program end-to-end with
`--xla_force_host_platform_device_count` virtual devices.

Prints one JSON line per device count plus a summary line with the scaling
efficiency (throughput_N / (N * throughput_1)).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="*", default=None,
                    help="device counts to test (default: 1, 2, ..., all)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--size", type=int, nargs=2, default=(512, 256),
                    metavar=("W", "H"))
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh with this many devices")
    args = ap.parse_args()

    import os
    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu_mesh}").strip()
    import jax
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.parallel import batched, mesh as mesh_mod
    from stvo_pl_tpu.utils import synthetic

    W, H = args.size
    cam = cam_ops.StereoCamera(fx=0.6 * W, fy=0.6 * W, cx=W / 2, cy=H / 2,
                               b=0.4, width=W, height=H)
    cfg = VOConfig(orb_nfeatures=600, orb_nlevels=2, lsd_nfeatures=100,
                   lsd_n_dirs=8)

    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(key, n_points=600, n_lines=40)
    poses = synthetic.smooth_trajectory(args.frames + 1, speed=0.5)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)
    jax.block_until_ready(seq_l)

    n_avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = {}
    for nd in counts:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = mesh_mod.make_mesh(n_data=nd, devices=jax.devices()[:nd])
        shard = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))
        B = nd * args.per_device_batch
        state = batched.init_batched_state(cfg, B)
        step, place = batched.make_sharded_vo_step(mesh, cam, cfg)
        il0 = jnp.broadcast_to(seq_l[0], (B,) + seq_l[0].shape)
        ir0 = jnp.broadcast_to(seq_r[0], (B,) + seq_r[0].shape)
        state, il0, ir0 = place(state, il0, ir0)
        state, _ = step(state, il0, ir0)   # compile + init frame
        jax.block_until_ready(state.Tfw)

        # pre-place every frame so the timed loop measures the sharded VO
        # step, not host-side broadcast + resharding traffic
        frames = []
        for i in range(1, args.frames + 1):
            il = jax.device_put(
                jnp.broadcast_to(seq_l[i], (B,) + seq_l[i].shape), shard)
            ir = jax.device_put(
                jnp.broadcast_to(seq_r[i], (B,) + seq_r[i].shape), shard)
            frames.append((il, ir))
        jax.block_until_ready(frames)

        t0 = time.perf_counter()
        for il, ir in frames:
            state, telem = step(state, il, ir)
        jax.block_until_ready(state.Tfw)
        dt = time.perf_counter() - t0
        fps = args.frames * B / dt
        results[nd] = fps
        print(json.dumps({"metric": "vo_scaling_fps", "devices": nd,
                          "batch": B, "value": round(fps, 2),
                          "unit": "frames/s"}))

    if len(results) > 1:
        base = min(results)
        eff = {n: results[n] / (results[base] * n / base)
               for n in results}
        cores = os.cpu_count() or 1
        virtual = args.cpu_mesh > 0 or jax.default_backend() == "cpu"
        out = {"metric": "scaling_efficiency",
               "value": round(min(eff.values()), 3),
               "unit": "fraction",
               "per_device": {str(k): round(v, 3) for k, v in eff.items()}}
        if virtual:
            # N virtual devices share the same physical cores: a 1-device
            # program already saturates them, so efficiency is bounded by
            # cores/N and this run only validates that the sharded program
            # compiles and executes; efficiency is only meaningful with >= 1
            # physical core (or chip) per device.
            out["note"] = (f"virtual CPU mesh on {cores} physical cores — "
                           "upper bound cores/N, not a hardware measurement")
            out["physical_cores"] = cores
        print(json.dumps(out))


if __name__ == "__main__":
    main()
