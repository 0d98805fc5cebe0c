"""Sliding-window keyframe refinement over a real (synthetic-rendered) VO
run: BA must not degrade — and with perturbed poses must repair — the
window."""

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import se3
from stvo_pl_tpu.parallel import window as win_mod
from stvo_pl_tpu.utils import metrics, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=300, orb_nlevels=2, has_lines=False,
               min_features=8)


def run_vo(n):
    key = jax.random.PRNGKey(7)
    scene = synthetic.make_scene(key, n_points=300, n_lines=8,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n, speed=0.25)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
    st = frontend.init_state(CFG)
    kfs = []
    for i in range(n):
        st, t = frontend.vo_step(st, seq_l[i], seq_r[i], CAM, CFG)
        kfs.append((t.Tfw, st.prev_points))
    return poses, kfs


def test_window_refine_improves_perturbed_poses(rng):
    poses, kfs = run_vo(5)
    win = win_mod.stack_keyframes(kfs)
    # perturb every pose but the first
    Tfw = np.asarray(win.Tfw).copy()
    for k in range(1, len(Tfw)):
        xi = rng.normal(0, 0.02, 6).astype(np.float32)
        xi[3:] *= 0.3
        Tfw[k] = Tfw[k] @ np.asarray(se3.expmap_se3(jnp.asarray(xi)))
    win_pert = win._replace(Tfw=jnp.asarray(Tfw))

    refined, X, costs = win_mod.refine_window(win_pert, CAM, CFG, n_iters=8)
    gt = np.asarray(poses)
    ate_pert = metrics.ate_rmse(Tfw, gt)
    ate_ref = metrics.ate_rmse(np.asarray(refined), gt)
    assert ate_ref < ate_pert * 0.6, (ate_pert, ate_ref)
    c = np.asarray(costs)
    assert c[-1] < c[0]


def test_window_refine_preserves_good_run():
    poses, kfs = run_vo(5)
    win = win_mod.stack_keyframes(kfs)
    refined, X, costs = win_mod.refine_window(win, CAM, CFG, n_iters=6)
    gt = np.asarray(poses)
    ate_vo = metrics.ate_rmse(np.asarray(win.Tfw), gt)
    ate_ba = metrics.ate_rmse(np.asarray(refined), gt)
    assert ate_ba < max(1.5 * ate_vo, 0.05), (ate_vo, ate_ba)


def test_window_refine_sharded_matches():
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs mesh")
    from stvo_pl_tpu.parallel import mesh as mesh_mod
    poses, kfs = run_vo(4)
    win = win_mod.stack_keyframes(kfs)
    mesh = mesh_mod.make_mesh(n_data=4, devices=jax.devices()[:4])
    refiner = win_mod.make_sharded_window_refiner(mesh, CAM, CFG, n_iters=5)
    r_sharded, _, _ = refiner(win)
    r_single, _, _ = win_mod.refine_window(win, CAM, CFG, n_iters=5)
    np.testing.assert_allclose(np.asarray(r_sharded), np.asarray(r_single),
                               rtol=1e-3, atol=1e-4)
