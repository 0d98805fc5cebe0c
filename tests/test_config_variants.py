"""Exercise the config surface end-to-end: FLD line path, window-based f2f
matching, robust/LM solver modes, preset files."""

import glob

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig, load_config
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import metrics, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
BASE = VOConfig(orb_nfeatures=260, orb_nlevels=2, lsd_nfeatures=32,
                lsd_n_dirs=8, min_features=8)


def run(cfg, n=5, seed=0):
    key = jax.random.PRNGKey(seed)
    scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n, speed=0.25)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
    st = frontend.init_state(cfg)
    _, telem = frontend.vo_scan(st, seq_l, seq_r, CAM, cfg)
    return metrics.ate_rmse(np.asarray(telem.Tfw), np.asarray(poses)), telem


def test_fld_line_path():
    ate, telem = run(BASE.replace(use_fld_lines=True))
    assert ate < 0.15, ate
    assert int(np.asarray(telem.n_lines)[1:].sum()) > 0


def test_window_based_f2f():
    ate, _ = run(BASE.replace(matching_strategy=1, has_lines=False))
    assert ate < 0.1, ate


def test_no_mutual_check():
    ate, _ = run(BASE.replace(best_lr_matches=False, has_lines=False))
    assert ate < 0.12, ate


def test_welsch_kernel():
    ate, _ = run(BASE.replace(robust_kernel="welsch", has_lines=False))
    assert ate < 0.1, ate


def test_wta3_descriptor_mode():
    """orb_wta_k=3: 2-bit argmax cells + HAMMING2 matching end to end
    (cv::ORB WTA_K semantics, reference src/stereoFrame.cpp:112-115)."""
    ate, telem = run(BASE.replace(orb_wta_k=3, has_lines=False))
    assert ate < 0.12, ate
    assert int(np.asarray(telem.n_points)[1:].min()) > 8


def test_wta4_descriptor_mode():
    ate, _ = run(BASE.replace(orb_wta_k=4, has_lines=False))
    assert ate < 0.12, ate


def test_lsd_scale_upsampled_mode():
    """lsd_scale=1.2 (cv::LSD resampled detection, the reference default)
    must track end to end with endpoints mapped back to source coords."""
    ate, telem = run(BASE.replace(lsd_scale=1.2))
    assert ate < 0.15, ate
    assert int(np.asarray(telem.n_lines)[1:].sum()) > 0


def test_preset_files_load_and_run():
    presets = sorted(glob.glob("configs/config_*.yaml"))
    assert len(presets) >= 5
    for pth in presets:
        cfg = load_config(pth)
        assert isinstance(cfg, VOConfig)
    # run one cheap preset end to end (reduced)
    cfg = load_config("configs/config_reduced.yaml").replace(
        orb_nfeatures=260, orb_nlevels=1, lsd_nfeatures=24, lsd_n_dirs=8,
        min_features=8)
    ate, _ = run(cfg, n=4)
    assert ate < 0.15, ate


def test_multi_octave_lsd_path():
    """lsd_octaves > 1 end-to-end: per-octave detection with quota-split
    capacity + octave-indexed LBD atlas (round-5 rework) must track."""
    ate, telem = run(BASE.replace(lsd_octaves=2))
    assert ate < 0.15, ate
    assert int(np.asarray(telem.n_points)[1:].min()) > 8
