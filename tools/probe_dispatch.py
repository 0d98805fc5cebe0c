"""Dispatch-overhead probe: per-step wall vs device time, effect of
in-jit broadcast and K-frame unrolling (axon tunnel latency check)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import batched
from stvo_pl_tpu.utils import synthetic

cam = cam_ops.StereoCamera(fx=718.856, fy=718.856, cx=613.0, cy=185.0,
                           b=0.5372, width=1226, height=370)
cfg = VOConfig()
B = 4
key = jax.random.PRNGKey(0)
scene = synthetic.make_scene(key, n_points=1400, n_lines=64,
                             extent=(40.0, 15.0, 90.0), z_near=5.0)
poses = synthetic.smooth_trajectory(6, speed=0.8)
seq_l, seq_r = synthetic.render_sequence(scene, poses, cam)
jax.block_until_ready(seq_l)


def bench_loop(step, state, il, ir, n=24):
    state2 = step(state, il, ir)
    jax.block_until_ready(state2.Tfw)
    state = state2
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state, il, ir)
    jax.block_until_ready(state.Tfw)
    return (time.perf_counter() - t0) / n * 1e3


# (a) current shape: broadcast outside, one frame per dispatch
il4 = jnp.broadcast_to(seq_l[0], (B,) + seq_l[0].shape)
ir4 = jnp.broadcast_to(seq_r[0], (B,) + seq_r[0].shape)
step_a = lambda s, il, ir: batched.vo_step_batched(s, il, ir, cam, cfg)[0]
state = batched.init_batched_state(cfg, B)
print(f"1-frame step, prebatched imgs: {bench_loop(step_a, state, il4, ir4):7.2f} ms")


# (b) broadcast inside jit (single [H, W] image arg)
@jax.jit
def step_b(state, il, ir):
    il = jnp.broadcast_to(il, (B,) + il.shape)
    ir = jnp.broadcast_to(ir, (B,) + ir.shape)
    return batched.vo_step_batched(state, il, ir, cam, cfg)[0]

state = batched.init_batched_state(cfg, B)
print(f"1-frame step, in-jit broadcast: {bench_loop(step_b, state, seq_l[0], seq_r[0]):7.2f} ms")


# (c) 2-frame unroll
@jax.jit
def step_c(state, il, ir):
    for _ in range(2):
        ilb = jnp.broadcast_to(il, (B,) + il.shape)
        irb = jnp.broadcast_to(ir, (B,) + ir.shape)
        state, _ = batched.vo_step_batched(state, ilb, irb, cam, cfg)
    return state

state = batched.init_batched_state(cfg, B)
dt = bench_loop(step_c, state, seq_l[0], seq_r[0], n=12)
print(f"2-frame unroll: {dt:7.2f} ms ({dt / 2:6.2f} ms/frame-step)")
