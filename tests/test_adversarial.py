"""Adversarial robustness e2e on the textured world: exposure flicker,
outlier-feature injection, textureless stretches — the pipeline must keep
the reference's coast-and-recover semantics
(src/stereoFrameHandler.cpp:383-390: bad solution => DT=I, err=-1, pose
carried forward; adaptive FAST lowers the threshold to re-acquire)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import metrics, world

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=48,
               lsd_n_dirs=8, min_features=8, fast_feat_th=20)


def forward_poses(n, speed=0.3):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = speed * np.arange(n)
    return poses


def run(seq_l, seq_r):
    state = frontend.init_state(CFG)
    tel = []
    for i in range(len(seq_l)):
        state, t = frontend.vo_step(state, jnp.asarray(seq_l[i]),
                                    jnp.asarray(seq_r[i]), CAM, CFG)
        tel.append(t)
    Tfw = np.stack([np.asarray(t.Tfw) for t in tel])
    good = np.array([bool(t.good) for t in tel])
    return Tfw, good, tel


def test_exposure_flicker_coast_and_recover():
    """One near-black frame mid-sequence: the frame may coast (good=False,
    pose carried), and tracking must recover afterwards."""
    w = world.make_world(seed=21, length=40.0)
    w.flicker_frame = 5
    w.flicker_gain = 0.12
    poses = forward_poses(10)
    seq_l, seq_r = world.render_sequence(w, poses, CAM)
    Tfw, good, tel = run(seq_l, seq_r)
    assert np.isfinite(Tfw).all()
    # healthy before the flicker and after recovery
    assert good[2:5].all(), good
    assert good[7:].all(), good
    # coasting never rewinds the trajectory: z stays monotone-ish
    z = Tfw[:, 2, 3]
    assert z[-1] > z[4], (z[4], z[-1])
    # post-recovery ATE on the healthy tail is bounded (compare increments
    # from frame 7 on, removing whatever offset the coast left)
    dz_tail = np.diff(z[7:])
    assert np.all(np.abs(dz_tail - 0.3) < 0.15), dz_tail


def test_outlier_patch_injection():
    """50% of the image area covered by pasted random patches (dynamic-
    object analogue): robust GN + MAD outlier rejection must keep the
    recovered motion sane on the surviving static features."""
    w = world.make_world(seed=23, length=40.0)
    poses = forward_poses(8)
    seq_l, seq_r = world.render_sequence(w, poses, CAM)
    rng = np.random.default_rng(5)
    seq_l = np.array(seq_l)
    seq_r = np.array(seq_r)
    # paste the SAME textured patches at FIXED positions in every frame
    # (a static overlay moving wrongly vs. the world => gross outliers for
    # f2f tracking) over ~half of the image
    patch = (rng.uniform(0, 255, (60, 60))).astype(np.float32)
    spots = [(10, 10), (10, 120), (100, 40), (100, 160)]
    for t in range(len(seq_l)):
        for (y, x) in spots:
            for s in (seq_l, seq_r):
                s[t, y:y + 60, x:x + 60] = patch
    Tfw, good, tel = run(seq_l, seq_r)
    assert np.isfinite(Tfw).all()
    z = Tfw[:, 2, 3]
    # forward motion must still dominate despite the stuck overlay
    assert z[-1] > 0.5 * 0.3 * (len(seq_l) - 1), z
    # and no frame estimated a wild jump
    assert np.all(np.abs(np.diff(z)) < 1.0), z


def test_textureless_stretch_recovers():
    """Frames 4-5 nearly blank: tracking coasts (identity increment) and
    re-locks when texture returns."""
    w = world.make_world(seed=25, length=40.0)
    poses = forward_poses(10)
    seq_l, seq_r = world.render_sequence(w, poses, CAM)
    seq_l = np.array(seq_l)
    seq_r = np.array(seq_r)
    for t in (4, 5):
        seq_l[t] = 60.0 + np.random.default_rng(t).normal(0, 1.0, seq_l[t].shape)
        seq_r[t] = 60.0 + np.random.default_rng(t + 9).normal(0, 1.0, seq_r[t].shape)
    Tfw, good, tel = run(seq_l, seq_r)
    assert np.isfinite(Tfw).all()
    assert not good[4] or not good[5]   # blanks cannot optimize honestly
    assert good[8:].all(), good          # re-locks
    z = Tfw[:, 2, 3]
    dz_tail = np.diff(z[8:])
    assert np.all(np.abs(dz_tail - 0.3) < 0.15), dz_tail
    # adaptive FAST dropped the threshold during starvation
    th = [float(t.fast_th) for t in tel]
    assert min(th[4:8]) < th[0], th
