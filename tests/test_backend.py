"""Windowed-BA back end: the live VO loop feeds a keyframe ring whose
windows are jointly refined (VERDICT round-1 item 5: BA wired into the
runtime, not library-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.models.backend import WindowedBA
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import metrics, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=48,
               lsd_n_dirs=8, min_features=8, fast_feat_th=20,
               has_lines=False)


def run_vo(n_frames, seed=0, speed=0.25, img_noise=0.0):
    key = jax.random.PRNGKey(seed)
    scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n_frames, speed=speed,
                                        yaw_rate=0.003)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
    if img_noise > 0:
        kl, kr = jax.random.split(jax.random.PRNGKey(seed + 1))
        seq_l = seq_l + img_noise * jax.random.normal(kl, seq_l.shape)
        seq_r = seq_r + img_noise * jax.random.normal(kr, seq_r.shape)
    state = frontend.init_state(CFG)
    backend = WindowedBA(CAM, CFG, window=4, force_kf_every=3)
    raw = []
    for i in range(n_frames):
        state, telem = frontend.vo_step(state, seq_l[i], seq_r[i], CAM, CFG)
        raw.append(np.asarray(telem.Tfw))
        backend.observe(i, telem.Tfw, i > 0 and bool(telem.is_kf),
                        state.prev_points)
    return np.asarray(poses), np.stack(raw), backend


def test_backend_collects_and_refines():
    gt, raw, backend = run_vo(14, img_noise=4.0)
    # KFs every 3 frames, window 4 -> first window at KF #4 (frame 9),
    # chained second window by frame ~14
    assert len(backend.events) >= 1
    refined = backend.apply(raw)
    assert refined.shape == raw.shape
    # refinement must not corrupt the trajectory in the absolute (world)
    # frame — the honest drift measure (Umeyama alignment hides the
    # consistent lateral drift BA exists to remove)
    ate_raw = metrics.ate_rmse(raw, gt, align=False)
    ate_ref = metrics.ate_rmse(refined, gt, align=False)
    assert ate_ref <= ate_raw * 1.05, (ate_raw, ate_ref)


def test_backend_improves_noisy_run():
    """The VERDICT 'done' criterion: BA-refined ATE beats raw VO ATE on a
    drifting sequence (image noise -> measurable f2f drift)."""
    gt, raw, backend = run_vo(14, seed=3, img_noise=6.0)
    assert len(backend.events) >= 1
    refined = backend.apply(raw)
    ate_raw = metrics.ate_rmse(raw, gt, align=False)
    ate_ref = metrics.ate_rmse(refined, gt, align=False)
    # the noisy run drifts hard laterally; BA must cut the absolute error
    assert ate_ref < 0.7 * ate_raw, (ate_raw, ate_ref)


def test_backend_improves_clean_run_too():
    """Even the noise-free small-resolution run drifts laterally (~0.4 m
    unaligned over 14 frames); the BA window must recover most of it while
    keeping corrections bounded."""
    gt, raw, backend = run_vo(14, seed=1, img_noise=0.0)
    refined = backend.apply(raw)
    d = np.linalg.norm(refined[:, :3, 3] - raw[:, :3, 3], axis=-1)
    assert d.max() < 1.0   # corrections bounded (no blow-up)
    ate_raw = metrics.ate_rmse(raw, gt, align=False)
    ate_ref = metrics.ate_rmse(refined, gt, align=False)
    assert ate_ref < 0.7 * ate_raw, (ate_raw, ate_ref)


CFG_PL = CFG.replace(has_lines=True)


def run_vo_pl_exposure(n_frames, seed=0, amp=0.35):
    """Line-bearing run with sinusoidal per-frame exposure swings +
    saturation clipping — the adversarial regime where biased line
    observations flip BA from helping to hurting (EVAL.md §3)."""
    key = jax.random.PRNGKey(seed)
    scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n_frames, speed=0.25, yaw_rate=0.003)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
    t = jnp.arange(n_frames, dtype=jnp.float32)
    gain = 1.0 + amp * jnp.sin(t * 1.1)
    seq_l = jnp.clip(seq_l * gain[:, None, None], 0.0, 255.0)
    seq_r = jnp.clip(seq_r * gain[:, None, None], 0.0, 255.0)

    def run(auto_lines):
        state = frontend.init_state(CFG_PL)
        backend = WindowedBA(CAM, CFG_PL, window=4, force_kf_every=3,
                             auto_lines=auto_lines)
        raw = []
        for i in range(n_frames):
            state, telem = frontend.vo_step(state, seq_l[i], seq_r[i],
                                            CAM, CFG_PL)
            raw.append(np.asarray(telem.Tfw))
            backend.observe(i, telem.Tfw, i > 0 and bool(telem.is_kf),
                            state.prev_points, state.prev_lines)
        return np.stack(raw), backend
    return np.asarray(poses), run


def test_backend_exposure_swing_auto_trust():
    """Exposure-swing regression (VERDICT round-5 item 2): with DEFAULT
    flags the auto line-trust policy must keep the refined trajectory at
    least as good as the forced-joint solve, without any hand flag."""
    gt, run = run_vo_pl_exposure(14, seed=3)
    raw_a, backend_a = run(auto_lines=True)
    assert len(backend_a.events) >= 1
    ref_a = backend_a.apply(raw_a)
    raw_f, backend_f = run(auto_lines=False)
    ref_f = backend_f.apply(raw_f)
    ate_a = metrics.ate_rmse(ref_a, gt, align=False)
    ate_f = metrics.ate_rmse(ref_f, gt, align=False)
    ate_raw = metrics.ate_rmse(raw_a, gt, align=False)
    # auto must never be dragged below the forced-joint solve, and must
    # not corrupt the raw trajectory
    assert ate_a <= ate_f * 1.05, (ate_a, ate_f)
    assert ate_a <= ate_raw * 1.05, (ate_a, ate_raw)


def test_entropy_keyframes_drive_ba():
    """Entropy-policy keyframes (no forced cadence) must fire at a sane
    rate and feed the BA backend (VERDICT round-5 item 6 CPU gate; also
    regression-guards the round-5 T_prevKF fix — the pre-fix code measured
    KF distance from the ORIGIN, so max_kf_t_dist fired every frame once
    the path passed 5 m)."""
    key = jax.random.PRNGKey(0)
    from stvo_pl_tpu.utils import synthetic as synth
    scene = synth.make_scene(key, n_points=260, n_lines=24,
                             extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synth.smooth_trajectory(30, speed=0.25, yaw_rate=0.003)
    seq_l, seq_r = synth.render_sequence(scene, poses, CAM)
    state = frontend.init_state(CFG)
    backend = WindowedBA(CAM, CFG, window=4)   # force_kf_every=0: entropy
    raw = []
    kf_frames = []
    for i in range(30):
        state, telem = frontend.vo_step(state, seq_l[i], seq_r[i], CAM, CFG)
        raw.append(np.asarray(telem.Tfw))
        is_kf = i > 0 and bool(telem.is_kf)
        if is_kf:
            kf_frames.append(i)
        backend.observe(i, telem.Tfw, is_kf, state.prev_points)
    # sane cadence: neither every frame (the origin-distance bug) nor
    # starved (measured: every ~3 frames on this scene)
    assert 4 <= len(kf_frames) <= 15, kf_frames
    assert min(np.diff(kf_frames)) >= 2, kf_frames
    assert len(backend.events) >= 1
    refined = backend.apply(np.stack(raw))
    gt = np.asarray(poses)
    ate_raw = metrics.ate_rmse(np.stack(raw), gt, align=False)
    ate_ref = metrics.ate_rmse(refined, gt, align=False)
    assert ate_ref <= ate_raw * 1.05, (ate_raw, ate_ref)
