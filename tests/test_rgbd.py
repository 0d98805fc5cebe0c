"""RGB-D pipeline: synthetic intensity + depth frames with known motion
(reference extractRGBDFeatures path, src/stereoFrame.cpp:667-818)."""

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import se3
from stvo_pl_tpu.utils import metrics, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.2, width=240, height=180)
CFG = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=32,
               lsd_n_dirs=8, min_features=8, rgbd_max_depth=80.0)


def render_rgbd(scene, T_wc):
    """Intensity from the synthetic renderer; depth by z-projecting the
    landmark set into a smooth depth field (points carry their z)."""
    img, _ = synthetic.render_stereo(scene, T_wc, CAM)
    # crude depth map: plane at z = 20 plus landmark depths splatted
    T_cw = se3.inverse_se3(T_wc)
    Pc = se3.transform_points(T_cw, scene.P)
    uv = cam_ops.project(CAM, Pc)
    H, W = CAM.height, CAM.width
    depth = jnp.full((H, W), 15.0, jnp.float32)
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    ok = Pc[:, 2] > 0.5
    # splat a 9x9 patch of the landmark depth around each projection
    for dy in range(-6, 7):
        for dx in range(-6, 7):
            yy = jnp.clip(y + dy, 0, H - 1)
            xx = jnp.clip(x + dx, 0, W - 1)
            depth = depth.at[yy, xx].set(
                jnp.where(ok, Pc[:, 2].astype(jnp.float32), depth[yy, xx]))
    return img, depth


def test_rgbd_tracking():
    # points-only: the synthetic depth map only carries correct depth at
    # point landmarks (rendered 3-D lines would read the background plane)
    global CFG
    cfg = CFG.replace(has_lines=False)
    key = jax.random.PRNGKey(5)
    # indoor-scale scene: RGB-D disparities must clear min_disp
    scene = synthetic.make_scene(key, n_points=260, n_lines=20,
                                 extent=(6.0, 4.0, 12.0), z_near=1.5)
    poses = synthetic.smooth_trajectory(6, speed=0.1)
    frames = [render_rgbd(scene, poses[i]) for i in range(6)]

    state = frontend.init_state(cfg)
    traj = []
    for img, depth in frames:
        state, telem = frontend.vo_step_rgbd(state, img, depth, CAM, cfg)
        traj.append(np.asarray(telem.Tfw))
    good = [bool(t) for t in np.asarray([0, 1, 1, 1, 1, 1])]
    est = np.stack(traj)
    ate = metrics.ate_rmse(est, np.asarray(poses))
    assert ate < 0.12, ate


def test_rgbd_depth_gating():
    """Features on pixels with invalid/out-of-range depth must be dropped."""
    from stvo_pl_tpu.models import frame as frame_mod
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (180, 240)).astype(np.float32))
    depth = jnp.zeros((180, 240), jnp.float32)  # all invalid
    feats = frame_mod.extract_rgbd_features(
        img, depth, jnp.float32(20.0), jnp.float32(6.0), CAM, CFG)
    assert not bool(np.asarray(feats.points.valid).any())
    assert not bool(np.asarray(feats.lines.valid).any())
