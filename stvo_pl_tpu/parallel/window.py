"""Sliding-window keyframe refinement: the bridge between the frame-to-frame
VO engine and the distributed windowed BA.

The reference delegates everything beyond two frames to the external PL-SLAM
project (SURVEY.md §3.5); here the VO front end's keyframes feed a windowed
stereo BA directly:

  * landmarks = the anchor keyframe's stereo points lifted to world frame;
  * observations = descriptor matches (Hamming + NNR + mutual) of those
    landmarks into every other keyframe in the window, with stereo
    (u_l, v, u_r) measurements reconstructed from each match's disparity;
  * solve with parallel.ba (single device or landmark-sharded mesh).

Everything is fixed-capacity: a window of K keyframes with Np-landmark
capacity compiles once and reruns for every window.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models.features import PointSet
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import hamming, matching, se3
from stvo_pl_tpu.parallel import ba


class KeyframeWindow(NamedTuple):
    """Stacked keyframe data ([K, ...] leaves)."""
    Tfw: jnp.ndarray          # [K, 4, 4] camera-to-world
    points: PointSet          # leaves [K, Np, ...]


def stack_keyframes(kfs: list[tuple[jnp.ndarray, PointSet]]) -> KeyframeWindow:
    Tfw = jnp.stack([t for t, _ in kfs])
    pts = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                 *[p for _, p in kfs])
    return KeyframeWindow(Tfw=Tfw, points=pts)


def build_problem(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                  cfg: VOConfig) -> ba.BAProblem:
    """Landmarks from keyframe 0; observations by descriptor matching into
    every keyframe (keyframe 0 observes its own detections)."""
    anchor = jax.tree_util.tree_map(lambda x: x[0], win.points)
    X = se3.transform_points(win.Tfw[0], anchor.P)     # world frame
    Np = anchor.capacity
    K = win.Tfw.shape[0]

    def obs_in_kf(k):
        pts_k = jax.tree_util.tree_map(lambda x: x[k], win.points)
        dist = hamming.hamming_matrix(anchor.desc, pts_k.desc,
                                      cfg.hamming_use_mxu)
        cand = anchor.valid[:, None] & pts_k.valid[None, :]
        res = matching.nnr_mutual_match(dist, cand, cfg.min_ratio_12_p,
                                        mutual=cfg.best_lr_matches)
        j = jnp.maximum(res.idx, 0)
        uv = pts_k.uv[j]
        disp = pts_k.disp[j]
        obs = jnp.stack([uv[:, 0], uv[:, 1], uv[:, 0] - disp], axis=-1)
        return obs, res.valid & anchor.valid

    obs_list, mask_list = [], []
    for k in range(K):
        o, m = obs_in_kf(k)
        obs_list.append(o)
        mask_list.append(m)
    obs = jnp.stack(obs_list, axis=1)                  # [Np, K, 3]
    mask = jnp.stack(mask_list, axis=1)                # [Np, K]
    return ba.BAProblem(X=X, obs=obs, mask=mask, sigma2=anchor.sigma2)


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "n_iters"))
def refine_window(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                  cfg: VOConfig, n_iters: int = 6):
    """Jointly refine the window's keyframe poses (and landmarks).

    Returns (Tfw_refined [K, 4, 4], X_refined, costs [n_iters])."""
    prob = build_problem(win, cam, cfg)
    poses_cw = se3.inverse_se3(win.Tfw)
    poses_cw, X, costs = ba.ba_solve(poses_cw, prob, cam, n_iters=n_iters)
    return se3.inverse_se3(poses_cw), X, costs


def make_sharded_window_refiner(mesh, cam: cam_ops.StereoCamera,
                                cfg: VOConfig, n_iters: int = 6):
    """Landmark-sharded version: the problem is built locally (matching is
    cheap), then the BA inner loop runs under shard_map with psum-reduced
    camera systems (parallel.ba.make_sharded_ba)."""
    solver = ba.make_sharded_ba(mesh, cam, n_iters=n_iters)

    def refine(win: KeyframeWindow):
        prob = build_problem(win, cam, cfg)
        poses_cw = se3.inverse_se3(win.Tfw)
        poses_cw, X, costs = solver(poses_cw, prob.X, prob.obs, prob.mask,
                                    prob.sigma2)
        return se3.inverse_se3(poses_cw), X, costs

    return refine
