"""Smoke tests for the offline renderers (MRPT-scene / debug-plot parity:
reference src/sceneRepresentation.cpp, src/stereoFrameHandler.cpp:1222-1368,
3rdparty/line_descriptor/src/draw_custom.cpp)."""

import numpy as np

from stvo_pl_tpu.utils import visualization as viz


def _img(h=60, w=90, seed=0):
    return np.random.default_rng(seed).uniform(0, 255, (h, w)).astype(
        np.float32)


def test_plot_run_with_cov(tmp_path):
    n = 12
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 5, n)
    poses[:, 2, 3] = np.linspace(0, 20, n)
    stats = [{"err": 0.1, "ms": 3.0, "npt": 100, "nls": 20}] * n
    cov = np.diag([0.01, 0.02, 0.05, 1e-4, 1e-4, 1e-4])
    out = tmp_path / "run.png"
    viz.plot_run(str(out), poses, stats, gt_poses=poses, cov=cov)
    assert out.stat().st_size > 0


def test_plot_pair_matches(tmp_path):
    uv1 = np.random.default_rng(1).uniform(5, 55, (30, 2))
    uv2 = uv1 + 1.5
    valid = np.ones(30, bool)
    valid[::3] = False
    l1 = np.random.default_rng(2).uniform(5, 55, (8, 2, 2))
    l2 = l1 + 2.0
    out = tmp_path / "pair.png"
    viz.plot_pair_matches(str(out), _img(), _img(seed=1), uv1, uv2, valid,
                          lines1=l1, lines2=l2,
                          lines_valid=np.ones(8, bool))
    assert out.stat().st_size > 0


def test_plot_projection_error(tmp_path):
    obs = np.random.default_rng(3).uniform(5, 55, (20, 2))
    proj = obs + np.random.default_rng(4).normal(0, 1.0, (20, 2))
    ls_obs = np.random.default_rng(5).uniform(5, 55, (5, 2, 2))
    out = tmp_path / "projerr.png"
    viz.plot_projection_error(str(out), _img(), obs, proj,
                              np.ones(20, bool), ls_obs, ls_obs + 1.0,
                              np.ones(5, bool), title="iter 3")
    assert out.stat().st_size > 0
