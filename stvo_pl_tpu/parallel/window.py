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
from stvo_pl_tpu.models.features import LineSet, PointSet
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import hamming, matching, se3
from stvo_pl_tpu.parallel import ba


class KeyframeWindow(NamedTuple):
    """Stacked keyframe data ([K, ...] leaves).  lines is None when the
    window carries only point snapshots (points-only config or callers
    that predate line BA)."""
    Tfw: jnp.ndarray          # [K, 4, 4] camera-to-world
    points: PointSet          # leaves [K, Np, ...]
    lines: LineSet | None = None  # leaves [K, Nl, ...]


def stack_keyframes(kfs: list[tuple]) -> KeyframeWindow:
    """Each entry is (Tfw, PointSet) or (Tfw, PointSet, LineSet)."""
    Tfw = jnp.stack([e[0] for e in kfs])
    pts = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                 *[e[1] for e in kfs])
    lines = None
    if len(kfs[0]) > 2 and kfs[0][2] is not None:
        lines = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                       *[e[2] for e in kfs])
    return KeyframeWindow(Tfw=Tfw, points=pts, lines=lines)


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


def _track_labels(dist_fn, valid, K: int, N: int, ratio: float,
                  cfg: VOConfig, extra_cand=None) -> jnp.ndarray:
    """Match-graph connected components over a [K, N] feature table.

    Every keyframe pair is mutually matched (dist_fn(a, b) -> [N, N]
    distances, NNR + mutual), then components are found by dense min-label
    propagation with pointer jumping (the same log-depth union-find used in
    ops/edline.py).  Returns flat labels [K*N]: each feature's component
    root (lowest flat index), K*N for invalid features."""
    Ntot = K * N
    BIG = jnp.int32(Ntot)
    match_idx = {}
    for a in range(K):
        for b in range(a + 1, K):
            cand = valid[a][:, None] & valid[b][None, :]
            if extra_cand is not None:
                cand = cand & extra_cand(a, b)
            res = matching.nnr_mutual_match(dist_fn(a, b), cand, ratio,
                                            mutual=cfg.best_lr_matches)
            match_idx[(a, b)] = (jnp.maximum(res.idx, 0), res.valid)

    flat0 = jnp.arange(Ntot, dtype=jnp.int32).reshape(K, N)
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
        L = Lf.reshape(K, N)
    return L.reshape(-1)


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

    def dist_fn(a, b):
        return hamming.distance_matrix(pts.desc[a], pts.desc[b],
                                       cfg.hamming_use_mxu,
                                       wta_k=cfg.orb_wta_k)

    Lf = _track_labels(dist_fn, valid, K, Np, cfg.min_ratio_12_p, cfg)
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
    prob = ba.BAProblem(X=X, obs=obs, mask=mask, sigma2=sigma2)
    if win.lines is not None and cfg.has_lines:
        prob = prob._replace(**_build_line_tracks(win, cam, cfg,
                                                  line_gate=reproj_gate))
    return prob


def _build_line_tracks(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                       cfg: VOConfig, line_gate: float = 8.0) -> dict:
    """Multi-anchor LINE landmark tracks for the windowed BA.

    Same union-find machinery as the point tracks, on LBD descriptors with
    the reference's direction-similarity candidate filter (matchGrid lines,
    src/matching.cpp:221-222).  Each track root contributes a 3-D endpoint
    pair initialized from its own stereo endpoint disparities
    (src/stereoFrame.cpp:366-394 semantics); member observations are the
    member's own infinite-line coefficients + 2-D endpoints (for the
    overlap weight).  Observations whose initialized endpoints project
    farther than line_gate px from the observed infinite line are masked.
    """
    K = win.Tfw.shape[0]
    ls = win.lines
    Nl = ls.spl.shape[1]
    Ntot = K * Nl
    BIG = jnp.int32(Ntot)

    valid = ls.valid                                     # [K, Nl]
    d = ls.epl - ls.spl
    dirs = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)

    def dist_fn(a, b):
        return hamming.hamming_matrix(ls.desc[a], ls.desc[b],
                                      cfg.hamming_use_mxu)

    def dir_cand(a, b):
        cosang = jnp.abs(jnp.einsum("ic,jc->ij", dirs[a], dirs[b]))
        # the matcher's own threshold; a 0.95 (18 deg) tightening and a
        # 4 px endpoint gate were MEASURED WORSE on all three 1000-frame
        # scenes (textured 2.76 -> 4.14 m, adversarial 12.9 -> 27.8 m):
        # starving the refiner of line support hurts more than the
        # occasional wrong track the Cauchy weight already suppresses
        return cosang > cfg.line_sim_th

    Lf = _track_labels(dist_fn, valid, K, Nl, cfg.min_ratio_12_l, cfg,
                       extra_cand=dir_cand)
    valid_f = valid.reshape(-1)
    k_of_n = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Nl)

    # --- member observations scattered into the track table ------------
    obs_node = jnp.concatenate([ls.le.reshape(-1, 3),
                                ls.spl.reshape(-1, 2),
                                ls.epl.reshape(-1, 2)], axis=-1)  # [Ntot, 7]
    root_idx = jnp.where(valid_f, Lf, BIG)
    obs_l = jnp.zeros((Ntot, K, 7), obs_node.dtype) \
        .at[root_idx, k_of_n].set(obs_node, mode="drop")
    mask_l = jnp.zeros((Ntot, K), bool) \
        .at[root_idx, k_of_n].set(True, mode="drop")

    # --- endpoint init from each root's own stereo back-projection -----
    sdisp = jnp.maximum(ls.sdisp.reshape(-1), 1e-3)
    edisp = jnp.maximum(ls.edisp.reshape(-1), 1e-3)
    Ps = cam_ops.back_project(cam, ls.spl.reshape(-1, 2), sdisp)
    Pe = cam_ops.back_project(cam, ls.epl.reshape(-1, 2), edisp)
    T_node = win.Tfw[k_of_n]
    lift = lambda P: (jnp.einsum("nab,nb->na", T_node[:, :3, :3], P)
                      + T_node[:, :3, 3])
    Xl_node = jnp.stack([lift(Ps), lift(Pe)], axis=1)    # [Ntot, 2, 3]
    is_root = (Lf == jnp.arange(Ntot, dtype=jnp.int32)) & valid_f
    nk = mask_l.sum(axis=-1)
    live = is_root & (nk >= 2)
    Xl = jnp.where(live[:, None, None], Xl_node, 0.0)

    # --- endpoint-to-line gate against the initialization --------------
    poses_cw = se3.inverse_se3(win.Tfw)                  # [K, 4, 4]
    Pc = jnp.einsum("kab,njb->nkja", poses_cw[:, :3, :3], Xl) \
        + poses_cw[:, :3, 3][None, :, None]              # [Ntot, K, 2, 3]
    z = Pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.cx + cam.fx * Pc[..., 0] / z_safe
    v = cam.cy + cam.fy * Pc[..., 1] / z_safe
    le = obs_l[..., :3]
    derr = jnp.abs(le[..., 0:1] * u + le[..., 1:2] * v + le[..., 2:3])
    mask_l = (mask_l & live[:, None] & jnp.all(derr < line_gate, axis=-1)
              & jnp.all(z > 0.1, axis=-1))

    sigma2_l = jnp.where(live, ls.sigma2.reshape(-1), 1.0)
    return dict(Xl=Xl, obs_l=obs_l, mask_l=mask_l, sigma2_l=sigma2_l)


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
    poses_cw, X, _, costs = ba.ba_solve(poses_cw, prob, cam, n_iters=n_iters)
    return se3.inverse_se3(poses_cw), X, costs


@functools.partial(jax.jit,
                   static_argnames=("cam", "cfg", "n_iters", "multi_anchor",
                                    "chi2_tol", "max_disagree_t",
                                    "max_disagree_r"))
def refine_window_auto(win: KeyframeWindow, cam: cam_ops.StereoCamera,
                       cfg: VOConfig, n_iters: int = 6,
                       multi_anchor: bool = True, chi2_tol: float = 1.10,
                       max_disagree_t: float = 0.25,
                       max_disagree_r: float = 1.0):
    """Window refinement with AUTOMATIC per-window line trust.

    Solves BOTH the points-only and the joint points+lines systems (the
    problem build and the dominant landmark work are shared; the extra
    solve is cheap) and accepts the joint solution only when it stays
    consistent with the point evidence — the window-level analogue of
    isGoodSolution (src/stereoFrameHandler.cpp:292-305):

      * the joint solution's point-residual chi-square may not degrade
        beyond chi2_tol x the points-only solution's (lines may not buy
        their own fit by sacrificing the points');
      * the joint poses may not DISAGREE with the points-only poses by
        more than max_disagree_t meters / max_disagree_r degrees at any
        keyframe.  Biased-but-self-consistent line tracks (exposure-swing
        edge bloom: every edge shifts the same way) drag the joint
        solution confidently while barely raising the point chi-square —
        the disagreement gate catches what the residual test cannot.

    Corrupted windows fall back to the points-only solution (NOT skipped:
    the point refinement is kept), no hand flags.

    Returns (Tfw_refined, X_refined, costs, used_lines: bool scalar)."""
    build = build_problem_tracks if multi_anchor else build_problem
    prob = build(win, cam, cfg)
    poses_cw0 = se3.inverse_se3(win.Tfw)
    prob_p = prob._replace(Xl=None, obs_l=None, mask_l=None, sigma2_l=None)
    poses_p, Xp, _, costs_p = ba.ba_solve(poses_cw0, prob_p, cam,
                                          n_iters=n_iters)
    if prob.Xl is None:
        return (se3.inverse_se3(poses_p), Xp, costs_p,
                jnp.asarray(False))
    poses_j, Xj, _, costs_j = ba.ba_solve(poses_cw0, prob, cam,
                                          n_iters=n_iters)
    chi_p, _ = ba.point_chi2(poses_p, prob_p, cam)
    chi_j, _ = ba.point_chi2(poses_j, prob_p, cam)
    # per-keyframe pose disagreement joint vs points-only
    D = se3.mm(poses_j, se3.inverse_se3(poses_p))        # [K, 4, 4]
    dis_t = jnp.max(jnp.linalg.norm(D[:, :3, 3], axis=-1))
    cos_r = jnp.clip((jnp.trace(D[:, :3, :3], axis1=-2, axis2=-1) - 1.0)
                     / 2.0, -1.0, 1.0)
    dis_r = jnp.max(jnp.degrees(jnp.arccos(cos_r)))
    use_lines = ((chi_j <= chi2_tol * chi_p)
                 & (dis_t <= max_disagree_t)
                 & (dis_r <= max_disagree_r))
    poses = jnp.where(use_lines, poses_j, poses_p)
    X = jnp.where(use_lines, Xj, Xp)
    costs = jnp.where(use_lines, costs_j, costs_p)
    return se3.inverse_se3(poses), X, costs, use_lines


def make_sharded_window_refiner(mesh, cam: cam_ops.StereoCamera,
                                cfg: VOConfig, n_iters: int = 6,
                                multi_anchor: bool = True,
                                has_lines: bool = False):
    """Landmark-sharded version: the problem is built locally (matching is
    cheap), then the BA inner loop runs under shard_map with psum-reduced
    camera systems (parallel.ba.make_sharded_ba).  has_lines must match
    whether the windows carry LineSet snapshots (line-endpoint landmarks
    are sharded over the data axis alongside the points)."""
    solver = ba.make_sharded_ba(mesh, cam, n_iters=n_iters,
                                has_lines=has_lines)
    build = build_problem_tracks if multi_anchor else build_problem

    def refine(win: KeyframeWindow):
        prob = build(win, cam, cfg)
        poses_cw = se3.inverse_se3(win.Tfw)
        if has_lines:
            poses_cw, X, _, costs = solver(
                poses_cw, prob.X, prob.obs, prob.mask, prob.sigma2,
                prob.Xl, prob.obs_l, prob.mask_l, prob.sigma2_l)
        else:
            poses_cw, X, costs = solver(poses_cw, prob.X, prob.obs,
                                        prob.mask, prob.sigma2)
        return se3.inverse_se3(poses_cw), X, costs

    return refine
