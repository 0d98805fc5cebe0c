"""Sharded (shard_map) VO step == unsharded step, and its compiled HLO
contains no collectives.

Regression for the GSPMD sort/TopK partitioning trap: left to sharding
propagation, XLA all-gathers the batch at every sort/top_k and re-runs them
replicated on all devices (8x throughput collapse measured at 2 devices).
shard_map makes per-sequence locality structural."""

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import batched, mesh as mesh_mod
from stvo_pl_tpu.utils import synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=200, orb_nlevels=2, lsd_nfeatures=32,
               lsd_n_dirs=8, min_features=8, fast_feat_th=20)


def _sequence(n):
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(key, n_points=220, n_lines=20,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n, speed=0.25)
    return synthetic.render_sequence(scene, poses, CAM)


def test_sharded_step_matches_unsharded_and_has_no_collectives():
    n_dev = 4
    B = n_dev * 1
    seq_l, seq_r = _sequence(3)
    mesh = mesh_mod.make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
    step, place = batched.make_sharded_vo_step(mesh, CAM, CFG)

    state_s = batched.init_batched_state(CFG, B)
    state_u = batched.init_batched_state(CFG, B)
    il0 = jnp.broadcast_to(seq_l[0], (B,) + seq_l[0].shape)
    ir0 = jnp.broadcast_to(seq_r[0], (B,) + seq_r[0].shape)
    state_s, il0s, ir0s = place(state_s, il0, ir0)

    # no collectives in the compiled sharded program
    hlo = jax.jit(step).lower(state_s, il0s, ir0s).compile().as_text()
    for op in ("all-gather", "all-reduce", "collective-permute",
               "all-to-all"):
        assert hlo.count(op) == 0, f"{op} leaked into the DP step"

    for i in range(3):
        il = jnp.broadcast_to(seq_l[i], (B,) + seq_l[i].shape)
        ir = jnp.broadcast_to(seq_r[i], (B,) + seq_r[i].shape)
        _, ils, irs = place(batched.init_batched_state(CFG, B), il, ir)
        state_s, tel_s = step(state_s, ils, irs)
        state_u, tel_u = batched.vo_step_batched(state_u, il, ir, CAM, CFG)

    np.testing.assert_allclose(np.asarray(state_s.Tfw),
                               np.asarray(state_u.Tfw), rtol=0, atol=1e-5)
    assert np.array_equal(np.asarray(tel_s.good), np.asarray(tel_u.good))
    assert np.array_equal(np.asarray(tel_s.n_inliers_pt),
                          np.asarray(tel_u.n_inliers_pt))
