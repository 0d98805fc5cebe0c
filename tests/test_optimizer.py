"""Pose optimizer vs synthetic ground truth: the numerical heart of the
framework, testable without any image processing (SURVEY.md §7 step 2)."""

import numpy as np
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models.features import LineMatches, PointMatches
from stvo_pl_tpu.models import optimizer
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import se3

CAM = cam_ops.StereoCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                           b=0.12, width=640, height=480)
CFG = VOConfig()


def synth_points(rng, n_cap, n_valid, T_cp, noise=0.0, n_outliers=0):
    """Generate PointMatches: 3-D points in the prev frame + observations in
    the curr frame under the prev->curr transform T_cp."""
    P = rng.uniform([-3, -2, 4], [3, 2, 15], (n_cap, 3)).astype(np.float32)
    Pc = (np.asarray(T_cp[:3, :3]) @ P.T).T + np.asarray(T_cp[:3, 3])
    obs = np.stack([CAM.fx * Pc[:, 0] / Pc[:, 2] + CAM.cx,
                    CAM.fy * Pc[:, 1] / Pc[:, 2] + CAM.cy], axis=-1)
    obs += rng.normal(0, noise, obs.shape)
    if n_outliers:
        idx = rng.choice(n_valid, n_outliers, replace=False)
        obs[idx] += rng.uniform(20, 60, (n_outliers, 2)) * rng.choice(
            [-1, 1], (n_outliers, 2))
    valid = np.zeros(n_cap, bool)
    valid[:n_valid] = True
    return PointMatches(P=jnp.asarray(P), obs=jnp.asarray(obs.astype(np.float32)),
                        sigma2=jnp.ones(n_cap, jnp.float32),
                        valid=jnp.asarray(valid),
                        inlier=jnp.ones(n_cap, bool))


def synth_lines(rng, n_cap, n_valid, T_cp, noise=0.0):
    sP = rng.uniform([-3, -2, 4], [3, 2, 15], (n_cap, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (n_cap, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    eP = sP + d * rng.uniform(0.5, 2.0, (n_cap, 1)).astype(np.float32)

    def proj(P, T):
        Pc = (np.asarray(T[:3, :3]) @ P.T).T + np.asarray(T[:3, 3])
        return np.stack([CAM.fx * Pc[:, 0] / Pc[:, 2] + CAM.cx,
                         CAM.fy * Pc[:, 1] / Pc[:, 2] + CAM.cy], axis=-1)

    spl = proj(sP, np.eye(4))  # prev-frame 2-D endpoints
    epl = proj(eP, np.eye(4))
    sp_obs = proj(sP, T_cp) + rng.normal(0, noise, (n_cap, 2))
    ep_obs = proj(eP, T_cp) + rng.normal(0, noise, (n_cap, 2))
    sph = np.concatenate([sp_obs, np.ones((n_cap, 1))], -1)
    eph = np.concatenate([ep_obs, np.ones((n_cap, 1))], -1)
    le = np.cross(sph, eph)
    le /= np.maximum(np.linalg.norm(le[:, :2], axis=-1, keepdims=True), 1e-9)
    valid = np.zeros(n_cap, bool)
    valid[:n_valid] = True
    return LineMatches(sP=jnp.asarray(sP), eP=jnp.asarray(eP),
                       spl=jnp.asarray(spl.astype(np.float32)),
                       epl=jnp.asarray(epl.astype(np.float32)),
                       le_obs=jnp.asarray(le.astype(np.float32)),
                       sigma2=jnp.ones(n_cap, jnp.float32),
                       valid=jnp.asarray(valid),
                       inlier=jnp.ones(n_cap, bool))


def empty_lines(n_cap):
    z = jnp.zeros
    return LineMatches(sP=z((n_cap, 3)), eP=z((n_cap, 3)), spl=z((n_cap, 2)),
                       epl=z((n_cap, 2)), le_obs=z((n_cap, 3)),
                       sigma2=jnp.ones(n_cap), valid=z((n_cap,), bool),
                       inlier=jnp.ones(n_cap, bool))


def small_motion():
    xi = jnp.asarray([0.05, -0.02, 0.3, 0.01, 0.02, -0.005], jnp.float32)
    return se3.expmap_se3(xi)


def run(pm, lm, cfg=CFG):
    I = jnp.eye(4, dtype=jnp.float32)
    return optimizer.optimize_pose(pm, lm, CAM, cfg, I, jnp.eye(6), 0.5)


def test_points_only_exact(rng):
    T_cp = small_motion()
    pm = synth_points(rng, 128, 100, T_cp)
    est, _, _ = run(pm, empty_lines(16))
    # committed DT = T_prev_curr = inv(T_cp)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert bool(est.good)
    np.testing.assert_allclose(np.asarray(est.DT), T_ref, atol=2e-4)
    assert float(est.err_norm) < 1e-3


def test_points_with_noise_and_outliers(rng):
    T_cp = small_motion()
    pm = synth_points(rng, 128, 110, T_cp, noise=0.4, n_outliers=15)
    est, pm_out, _ = run(pm, empty_lines(16))
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert bool(est.good)
    err = np.abs(np.asarray(est.DT) - T_ref)
    assert err[:3, 3].max() < 0.02, err[:3, 3]       # translation ~cm
    assert err[:3, :3].max() < 2e-3                  # rotation
    # outlier rejection fired
    assert int(est.n_inliers_pt) < 110


def test_lines_only(rng):
    T_cp = small_motion()
    lm = synth_lines(rng, 96, 80, T_cp)
    z = jnp.zeros
    pm = PointMatches(P=z((8, 3)), obs=z((8, 2)), sigma2=jnp.ones(8),
                      valid=z((8,), bool), inlier=jnp.ones(8, bool))
    est, _, _ = run(pm, lm)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert bool(est.good)
    # endpoint-to-infinite-line error leaves the along-line dof weakly
    # constrained per line, but 80 lines in general position pin the pose
    np.testing.assert_allclose(np.asarray(est.DT), T_ref, atol=5e-3)


def test_points_and_lines_fused(rng):
    T_cp = small_motion()
    pm = synth_points(rng, 128, 90, T_cp, noise=0.3)
    lm = synth_lines(rng, 64, 50, T_cp, noise=0.3)
    est, _, _ = run(pm, lm)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert bool(est.good)
    err = np.abs(np.asarray(est.DT) - T_ref)
    assert err[:3, 3].max() < 0.02
    assert int(est.n_inliers_ls) > 0


def test_too_few_features_fails_gracefully(rng):
    T_cp = small_motion()
    pm = synth_points(rng, 32, 4, T_cp)   # below min_features=10
    est, _, _ = run(pm, empty_lines(8))
    assert not bool(est.good)
    assert float(est.err_norm) == -1.0
    np.testing.assert_array_equal(np.asarray(est.DT), np.eye(4))


def test_large_motion_converges(rng):
    xi = jnp.asarray([0.2, 0.1, 1.2, 0.03, 0.06, 0.02], jnp.float32)
    T_cp = se3.expmap_se3(xi)
    pm = synth_points(rng, 256, 200, T_cp, noise=0.2)
    est, _, _ = run(pm, empty_lines(16))
    assert bool(est.good)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert np.abs(np.asarray(est.DT)[:3, 3] - T_ref[:3, 3]).max() < 0.02


def test_robust_mode(rng):
    cfg = CFG.replace(optim_mode=1)
    T_cp = small_motion()
    pm = synth_points(rng, 128, 100, T_cp, noise=0.3, n_outliers=20)
    est, _, _ = run(pm, empty_lines(8), cfg)
    assert bool(est.good)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert np.abs(np.asarray(est.DT)[:3, 3] - T_ref[:3, 3]).max() < 0.03


def test_tstudent_kernel(rng):
    # t-distribution robust weights (ICRA'16 paper's probabilistic
    # formulation; the C++ code ships Cauchy) drive the same optimizer
    cfg = CFG.replace(robust_kernel="tstudent")
    T_cp = small_motion()
    # nu=5 t-weights keep ~5x more relative weight on gross outliers than
    # Cauchy, so the bias envelope under 10% gross outliers is wider
    pm = synth_points(rng, 128, 100, T_cp, noise=0.3, n_outliers=10)
    est, _, _ = run(pm, empty_lines(8), cfg)
    assert bool(est.good)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert np.abs(np.asarray(est.DT)[:3, 3] - T_ref[:3, 3]).max() < 0.05


def test_lm_mode(rng):
    cfg = CFG.replace(optim_mode=2)
    T_cp = small_motion()
    pm = synth_points(rng, 128, 100, T_cp, noise=0.2)
    est, _, _ = run(pm, empty_lines(8), cfg)
    assert bool(est.good)
    T_ref = np.asarray(se3.inverse_se3(T_cp))
    assert np.abs(np.asarray(est.DT)[:3, 3] - T_ref[:3, 3]).max() < 0.02
