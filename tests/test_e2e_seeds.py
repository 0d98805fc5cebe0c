"""Multi-seed e2e robustness: the full VO pipeline must track across many
random synthetic scenes, not just one lucky draw.

Motivated by a real regression class: estimator edge cases (MAD threshold
collapse on near-exact data, robust-kernel health-gate calibration) that a
single-seed e2e test never hits.  One compiled step is reused across seeds
(same static shapes), so the sweep costs one compile + N cheap runs.
"""

import numpy as np
import pytest
import jax

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import metrics, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=48,
               lsd_n_dirs=8, min_features=8, fast_feat_th=20)

N_SEEDS = 6
N_FRAMES = 6


def test_vo_tracks_across_seeds():
    ates = []
    good_fracs = []
    for seed in range(N_SEEDS):
        key = jax.random.PRNGKey(seed)
        scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                     extent=(14.0, 8.0, 40.0), z_near=3.0)
        poses = synthetic.smooth_trajectory(N_FRAMES, speed=0.25,
                                            yaw_rate=0.003)
        seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
        state = frontend.init_state(CFG)
        final, telem = frontend.vo_scan(state, seq_l, seq_r, CAM, CFG)
        good = np.asarray(telem.good)[1:]
        ate = metrics.ate_rmse(np.asarray(telem.Tfw), np.asarray(poses))
        good_fracs.append(good.mean())
        ates.append(ate)

    ates = np.asarray(ates)
    good_fracs = np.asarray(good_fracs)
    # every seed must mostly track; no catastrophic scene-dependent failure
    assert (good_fracs > 0.7).all(), f"tracking failures: {good_fracs}"
    assert (ates < 0.15).all(), f"ATE outliers across seeds: {ates}"
    # and the typical case must stay cm-level
    assert np.median(ates) < 0.06, f"median ATE drifted: {ates}"
    # fixed-seed MEAN accuracy regression gate (VERDICT r2 item 7): the
    # 6-seed mean is deterministic on CPU; measured 0.0245 m with sub-pixel
    # refinement on (round 3).  0.032 = measured * 1.3 — a genuine accuracy
    # regression (e.g. losing sub-pixel corners, which alone moves the mean
    # to ~0.031) fails loudly, run-to-run noise does not.
    assert float(np.mean(ates)) < 0.032, \
        f"mean fixed-seed ATE regressed: {np.mean(ates):.4f} vs 0.0245 baseline"


def test_corridor_drift_gate():
    """Fixed-seed long(er)-horizon corridor regression gate (VERDICT r4
    item 7): a 60-frame / 48 m straight street-canyon run (the world
    generator behind the 1000-frame drift evals, at half KITTI resolution
    for CPU test speed) must stay at sub-promille-of-path drift.

    Measured round 4: ATE 0.0438 m (0.09% of path), good_frac 1.0.  The
    gate is 1.8x the measured value — cross-build f32 re-rounding moves
    lane ATEs but a real tracking regression (detector, matcher, or
    optimizer) blows through it.
    """
    from stvo_pl_tpu.utils import world

    cam = cam_ops.StereoCamera(fx=359.4, fy=359.4, cx=306.5, cy=92.5,
                               b=0.5372, width=613, height=185)
    cfg = VOConfig(orb_nfeatures=600, orb_nlevels=2, lsd_nfeatures=100,
                   lsd_n_dirs=8, min_features=8)
    w = world.make_world(seed=41, length=70.0)
    poses = synthetic.smooth_trajectory(60, speed=0.8, yaw_rate=0.0)
    seq_l, seq_r = world.render_sequence(w, np.asarray(poses), cam)
    state = frontend.init_state(cfg)
    final, telem = frontend.vo_scan(state, jax.numpy.asarray(seq_l),
                                    jax.numpy.asarray(seq_r), cam, cfg)
    good = np.asarray(telem.good)[1:]
    ate = metrics.ate_rmse(np.asarray(telem.Tfw), np.asarray(poses))
    assert good.mean() >= 0.9, f"corridor tracking failures: {good}"
    assert ate < 0.08, f"corridor drift regressed: {ate:.4f} m / 48 m"
