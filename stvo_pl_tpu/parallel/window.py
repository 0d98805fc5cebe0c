"""Sliding-window keyframe refinement: the bridge between the frame-to-frame
VO engine and the distributed windowed BA.

The reference delegates everything beyond two frames to the external PL-SLAM
project (SURVEY.md §3.5); here the VO front end's keyframes feed a windowed
stereo BA directly:

  * landmarks = MULTI-ANCHOR tracks unioned across all window keyframes
    (build_problem_tracks): every pair of keyframes is mutually matched
    (Hamming + NNR + mutual), the match graph's connected components are
    found by dense min-label propagation with pointer jumping (the same
    log-depth union-find used in ops/edline.py), each component becomes
    one landmark anchored at its lowest-(kf, slot) member, and member
    observations are scatter-written into the [N, K] observation table
    with a reprojection gate.  Features born mid-window ARE landmarks —
    the anchor-only builder (build_problem, kept for comparison) could
    never refine against them;
  * observations = stereo (u_l, v, u_r) measurements reconstructed from
    each member's own detection + disparity;
  * solve with parallel.ba (single device or landmark-sharded mesh).

Everything is fixed-capacity: a window of K keyframes with Np-landmark
capacity compiles once and reruns for every window (track capacity K*Np,
non-root slots masked).
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
        dist = hamming.distance_matrix(anchor.desc, pts_k.desc,
                                       cfg.hamming_use_mxu,
                                       wta_k=cfg.orb_wta_k)
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


def build_problem_tracks(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                         cfg: VOConfig,
                         reproj_gate: float = 8.0) -> ba.BAProblem:
    """Multi-anchor landmark tracks unioned across ALL window keyframes.

    Returns a BAProblem with N = K*Np landmark slots: slot (k, i) is a
    live landmark iff feature i of keyframe k is the root (lowest flat
    index) of its match-graph component and the component spans >= 2
    keyframes.  Landmarks are initialized from the root's own stereo
    back-projection lifted to world; observations failing the
    reprojection gate against that initialization are masked out.
    """
    K = win.Tfw.shape[0]
    pts = win.points
    Np = pts.uv.shape[1]
    Ntot = K * Np
    BIG = jnp.int32(Ntot)

    valid = pts.valid                                   # [K, Np]
    # --- pairwise mutual matching over all keyframe pairs -------------
    match_idx = {}
    for a in range(K):
        for b in range(a + 1, K):
            dist = hamming.distance_matrix(pts.desc[a], pts.desc[b],
                                           cfg.hamming_use_mxu,
                                           wta_k=cfg.orb_wta_k)
            cand = valid[a][:, None] & valid[b][None, :]
            res = matching.nnr_mutual_match(dist, cand, cfg.min_ratio_12_p,
                                            mutual=cfg.best_lr_matches)
            match_idx[(a, b)] = (jnp.maximum(res.idx, 0), res.valid)

    # --- connected components by min-label propagation ----------------
    flat0 = jnp.arange(Ntot, dtype=jnp.int32).reshape(K, Np)
    L = jnp.where(valid, flat0, BIG)
    n_rounds = 2 + max(1, K.bit_length())
    for _ in range(n_rounds):
        for (a, b), (idx, ok) in match_idx.items():
            la = L[a]
            lb_at = L[b][idx]
            la_new = jnp.where(ok, jnp.minimum(la, lb_at), la)
            lb_new = L[b].at[idx].min(jnp.where(ok, la, BIG))
            L = L.at[a].set(la_new).at[b].set(lb_new)
        # pointer jump on the flat label array
        Lf = L.reshape(-1)
        Lj = jnp.where(Lf < BIG, Lf, 0)
        Lf = jnp.where(Lf < BIG, jnp.minimum(Lf, Lf[Lj]), BIG)
        L = Lf.reshape(K, Np)

    Lf = L.reshape(-1)
    valid_f = valid.reshape(-1)
    k_of_n = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Np)

    # --- member observations scattered into the track table -----------
    uv = pts.uv.reshape(-1, 2)
    disp = pts.disp.reshape(-1)
    obs_node = jnp.stack([uv[:, 0], uv[:, 1], uv[:, 0] - disp], axis=-1)
    root_idx = jnp.where(valid_f, Lf, BIG)              # drop invalid
    obs = jnp.zeros((Ntot, K, 3), obs_node.dtype) \
        .at[root_idx, k_of_n].set(obs_node, mode="drop")
    mask = jnp.zeros((Ntot, K), bool) \
        .at[root_idx, k_of_n].set(True, mode="drop")

    # --- landmark init from each root's own stereo back-projection ----
    disp_safe = jnp.where(disp > 1e-3, disp, 1.0)
    P_node = cam_ops.back_project(cam, uv, disp_safe)   # camera frame
    T_node = win.Tfw[k_of_n]                            # [Ntot, 4, 4]
    X_node = (jnp.einsum("nab,nb->na", T_node[:, :3, :3], P_node)
              + T_node[:, :3, 3])
    is_root = (Lf == jnp.arange(Ntot, dtype=jnp.int32)) & valid_f
    nk = mask.sum(axis=-1)
    live = is_root & (nk >= 2)
    X = jnp.where(live[:, None], X_node, 0.0)

    # --- reprojection gate against the initialization ------------------
    poses_cw = se3.inverse_se3(win.Tfw)                 # [K, 4, 4]
    Pc = jnp.einsum("kab,nb->nka", poses_cw[:, :3, :3], X) \
        + poses_cw[:, :3, 3][None]
    z = jnp.where(jnp.abs(Pc[..., 2]) < 1e-6, 1e-6, Pc[..., 2])
    u = cam.cx + cam.fx * Pc[..., 0] / z
    v = cam.cy + cam.fy * Pc[..., 1] / z
    err = jnp.maximum(jnp.abs(u - obs[..., 0]), jnp.abs(v - obs[..., 1]))
    mask = mask & live[:, None] & (err < reproj_gate) & (z > 0.1)

    sigma2 = jnp.where(live, pts.sigma2.reshape(-1), 1.0)
    return ba.BAProblem(X=X, obs=obs, mask=mask, sigma2=sigma2)


@functools.partial(jax.jit,
                   static_argnames=("cam", "cfg", "n_iters", "multi_anchor"))
def refine_window(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                  cfg: VOConfig, n_iters: int = 6,
                  multi_anchor: bool = True):
    """Jointly refine the window's keyframe poses (and landmarks).

    Returns (Tfw_refined [K, 4, 4], X_refined, costs [n_iters])."""
    build = build_problem_tracks if multi_anchor else build_problem
    prob = build(win, cam, cfg)
    poses_cw = se3.inverse_se3(win.Tfw)
    poses_cw, X, costs = ba.ba_solve(poses_cw, prob, cam, n_iters=n_iters)
    return se3.inverse_se3(poses_cw), X, costs


def make_sharded_window_refiner(mesh, cam: cam_ops.StereoCamera,
                                cfg: VOConfig, n_iters: int = 6,
                                multi_anchor: bool = True):
    """Landmark-sharded version: the problem is built locally (matching is
    cheap), then the BA inner loop runs under shard_map with psum-reduced
    camera systems (parallel.ba.make_sharded_ba)."""
    solver = ba.make_sharded_ba(mesh, cam, n_iters=n_iters)
    build = build_problem_tracks if multi_anchor else build_problem

    def refine(win: KeyframeWindow):
        prob = build(win, cam, cfg)
        poses_cw = se3.inverse_se3(win.Tfw)
        poses_cw, X, costs = solver(poses_cw, prob.X, prob.obs, prob.mask,
                                    prob.sigma2)
        return se3.inverse_se3(poses_cw), X, costs

    return refine
