"""The VO engine: frame-to-frame tracking state machine.

Reimplements StereoFrameHandler (reference src/stereoFrameHandler.cpp) as a
functional state + one jitted step:

    state' , telemetry = vo_step(state, img_l, img_r)

covering initialize (:35-52), insertStereoPair (:54-60), f2fTracking
(:106-180), optimizePose (:307-392, via models.optimizer), updateFrame with
the adaptive-FAST controller (:62-102), and the keyframe hooks
needNewKF/currFrameIsKF (:1136-1218).

The per-frame state is a pytree, so `lax.scan` runs whole sequences on
device, `vmap` batches many sequences per chip, and `shard_map` distributes
batches across a mesh (stvo_pl_tpu.parallel).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frame as frame_mod
from stvo_pl_tpu.models import optimizer
from stvo_pl_tpu.models.features import (LineMatches, LineSet, PointMatches,
                                         PointSet, empty_lines, empty_points)
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import hamming, linalg, matching, se3


class VOState(NamedTuple):
    """Carried across frames (the reference's prev_frame + handler fields)."""
    prev_points: PointSet
    prev_lines: LineSet
    Tfw: jnp.ndarray          # [4,4] camera-to-world of prev frame
    Tfw_cov: jnp.ndarray      # [6,6]
    DT: jnp.ndarray           # [4,4] last pose increment (motion model)
    DT_cov: jnp.ndarray       # [6,6]
    err_norm: jnp.ndarray     # scalar
    fast_th: jnp.ndarray      # adaptive FAST threshold (float)
    initialized: jnp.ndarray  # bool — first frame seen
    # keyframe bookkeeping (:47-51, :1136-1218)
    T_prevKF: jnp.ndarray         # [4,4]
    cov_prevKF_currF: jnp.ndarray  # [6,6]
    entropy_first_prevKF: jnp.ndarray
    prev_f_iskf: jnp.ndarray      # bool
    N_prevKF_currF: jnp.ndarray   # int32


class StepTelemetry(NamedTuple):
    """Per-frame console telemetry of the reference CLI
    (app/imagesStVO.cpp:113-121) plus KF signals."""
    Tfw: jnp.ndarray
    DT: jnp.ndarray
    DT_cov_eig: jnp.ndarray
    err_norm: jnp.ndarray
    good: jnp.ndarray
    n_points: jnp.ndarray      # matched (valid) point count
    n_inliers_pt: jnp.ndarray
    n_lines: jnp.ndarray
    n_inliers_ls: jnp.ndarray
    fast_th: jnp.ndarray
    is_kf: jnp.ndarray
    entropy_ratio: jnp.ndarray
    opt_iters: jnp.ndarray     # solver iterations spent this frame


def init_state(cfg: VOConfig, dtype=jnp.float32) -> VOState:
    I4 = jnp.eye(4, dtype=dtype)
    I6 = jnp.eye(6, dtype=dtype)
    return VOState(
        prev_points=empty_points(cfg.point_capacity, dtype),
        prev_lines=empty_lines(cfg.line_capacity, dtype),
        Tfw=I4, Tfw_cov=I6, DT=I4, DT_cov=jnp.zeros((6, 6), dtype),
        err_norm=jnp.asarray(-1.0, dtype),
        fast_th=jnp.asarray(float(cfg.orb_fast_th), dtype),
        initialized=jnp.asarray(False),
        T_prevKF=I4, cov_prevKF_currF=jnp.zeros((6, 6), dtype),
        entropy_first_prevKF=jnp.asarray(-1e9, dtype),
        prev_f_iskf=jnp.asarray(True),
        N_prevKF_currF=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# frame-to-frame matching (f2fTracking, :106-180)
# ---------------------------------------------------------------------------

def match_f2f_points(prev: PointSet, curr: PointSet, cfg: VOConfig,
                     cam: cam_ops.StereoCamera | None = None,
                     tp=None) -> PointMatches:
    """matchF2FPoints (:131-153): full descriptor matching (NNR + mutual)
    between the previous and current stereo point sets.  With
    matching_strategy == 1 (reference src/config.cpp:90-92) candidates are
    additionally constrained to a +/- matching_f2f_ws grid-cell window.
    tp = (axis, n_shards) auto-switches to the model-axis-sharded matcher
    at large budgets (ops/matching.match_auto)."""
    cand = prev.valid[:, None] & curr.valid[None, :]
    if cfg.matching_strategy == 1 and cam is not None:
        inv_w = cfg.grid_cols / float(cam.width)
        inv_h = cfg.grid_rows / float(cam.height)
        cand = cand & matching.f2f_point_window_mask(
            prev.uv, curr.uv, inv_w, inv_h, cfg.matching_f2f_ws)
    res = matching.match_auto(prev.desc, curr.desc, cand, cfg.min_ratio_12_p,
                              cfg, tp=tp, wta_k=cfg.orb_wta_k)
    j = jnp.maximum(res.idx, 0)
    obs = curr.uv[j]
    valid = res.valid & prev.valid
    return PointMatches(P=prev.P, obs=jnp.where(valid[:, None], obs, 0.0),
                        sigma2=prev.sigma2, valid=valid,
                        inlier=jnp.ones_like(valid))


def match_f2f_lines(prev: LineSet, curr: LineSet, cfg: VOConfig,
                    cam: cam_ops.StereoCamera | None = None,
                    tp=None) -> LineMatches:
    """matchF2FLines (:155-180): descriptor matching; observation is the
    current frame's infinite-line coefficients.

    The reference f2f path is always brute-force (match(), :164); like the
    point side, matching_strategy == 1 here additionally windows candidates
    to +/- matching_f2f_ws grid cells around the previous midpoint — the
    f2f analogue of matchGrid's locality prior.
    """
    cand = prev.valid[:, None] & curr.valid[None, :]
    if cfg.matching_strategy == 1 and cam is not None:
        inv_w = cfg.grid_cols / float(cam.width)
        inv_h = cfg.grid_rows / float(cam.height)
        mid_p = 0.5 * (prev.spl + prev.epl)
        mid_c = 0.5 * (curr.spl + curr.epl)
        cand = cand & matching.f2f_point_window_mask(
            mid_p, mid_c, inv_w, inv_h, cfg.matching_f2f_ws)
    res = matching.match_auto(prev.desc, curr.desc, cand, cfg.min_ratio_12_l,
                              cfg, tp=tp)
    j = jnp.maximum(res.idx, 0)
    le_obs = curr.le[j]
    valid = res.valid & prev.valid
    return LineMatches(sP=prev.sP, eP=prev.eP, spl=prev.spl, epl=prev.epl,
                       le_obs=jnp.where(valid[:, None], le_obs, 0.0),
                       sigma2=prev.sigma2, valid=valid,
                       inlier=jnp.ones_like(valid))


# ---------------------------------------------------------------------------
# adaptive FAST controller (updateFrame, :62-102)
# ---------------------------------------------------------------------------

def update_fast_threshold(fast_th, good, err_norm, n_inliers_pt,
                          cfg: VOConfig):
    if not cfg.adaptative_fast:
        return fast_th
    lo = float(cfg.fast_min_th)
    hi = float(cfg.fast_max_th)
    inc = float(cfg.fast_inc_th)
    feat = cfg.fast_feat_th
    bad = (~good) | (err_norm > cfg.fast_err_th)
    th = jnp.where(
        bad, fast_th - 2 * inc,
        jnp.where(n_inliers_pt < feat, fast_th - 2 * inc,
        jnp.where(n_inliers_pt < feat * 2, fast_th - inc,
        jnp.where(n_inliers_pt > feat * 4, fast_th + 2 * inc,
        jnp.where(n_inliers_pt > feat * 3, fast_th + inc, fast_th)))))
    return jnp.clip(th, lo, hi)


# ---------------------------------------------------------------------------
# keyframe decision (needNewKF / currFrameIsKF, :1136-1218)
# ---------------------------------------------------------------------------

_ENTROPY_CONST = 3.0 * (1.0 + math.log(2.0 * math.pi))


def keyframe_update(state: VOState, est: optimizer.PoseEstimate,
                    Tfw_curr, cfg: VOConfig):
    """Returns (is_kf, new KF bookkeeping fields, entropy_ratio)."""
    dtype = Tfw_curr.dtype
    # refresh entropy_first on the first frame after a KF (:1140-1153)
    logdet_dt = linalg.logdet6(est.DT_cov)
    entropy_first = jnp.where(
        state.prev_f_iskf,
        jnp.where(jnp.isfinite(logdet_dt),
                  _ENTROPY_CONST + 0.5 * logdet_dt, -1e9),
        state.entropy_first_prevKF).astype(dtype)

    # geometric distance from previous KF (:1156-1159).  The reference
    # resets curr_frame->Tfw to identity at every KF (currFrameIsKF,
    # :1210-1213) so its Tfw is KF-RELATIVE and T_prevKF stays identity;
    # this frontend keeps GLOBAL poses, so T_prevKF stores the KF's global
    # pose and the same formula measures motion since that KF.  (The
    # pre-round-5 code stored identity here, which made t the distance
    # from the ORIGIN — max_kf_t_dist then fired on every frame once the
    # path exceeded 5 m, collapsing the entropy policy to KF-every-frame.)
    DTkf = se3.mm(se3.inverse_se3(Tfw_curr), state.T_prevKF)
    dX = se3.logmap_se3(DTkf)
    t = jnp.linalg.norm(dX[:3])
    r = jnp.linalg.norm(dX[3:]) * (180.0 / math.pi)

    # accumulated covariance (:1162-1165).  The reference conjugates by
    # Adj(T_prevKF) with T_prevKF identically I (assigned only from the
    # just-reset Tfw, :1213) — i.e. raw summation; mirrored exactly.
    covDTinv = se3.uncTinv_se3(est.DT, est.DT_cov)
    cov_acc = state.cov_prevKF_currF + covDTinv
    entropy_curr = _ENTROPY_CONST + 0.5 * linalg.logdet6(cov_acc)
    entropy_ratio = entropy_curr / entropy_first

    is_kf = ((entropy_ratio < cfg.min_entropy_ratio)
             | ~jnp.isfinite(entropy_ratio)
             | ~est.good
             | (t > cfg.max_kf_t_dist) | (r > cfg.max_kf_r_dist)
             | (state.N_prevKF_currF > 10))

    # currFrameIsKF resets (:1189-1218) vs no-KF accumulation (:1184)
    T_prevKF = jnp.where(is_kf, Tfw_curr, state.T_prevKF)
    cov_next = jnp.where(is_kf, jnp.zeros((6, 6), dtype), cov_acc)
    n_next = jnp.where(is_kf, 0, state.N_prevKF_currF + 1).astype(jnp.int32)
    return is_kf, T_prevKF, cov_next, entropy_first, n_next, entropy_ratio


# ---------------------------------------------------------------------------
# one full VO step
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "cam", "tp"))
def vo_step(state: VOState, img_l: jnp.ndarray, img_r: jnp.ndarray,
            cam: cam_ops.StereoCamera,
            cfg: VOConfig, tp=None) -> tuple[VOState, StepTelemetry]:
    """Process one rectified stereo pair: extract, track, optimize, update.

    On the first frame (state.initialized == False) this is `initialize`
    (:35-52): extract features, pose stays identity.
    """
    dtype = state.Tfw.dtype
    llength_th = jnp.asarray(
        cfg.min_line_length * min(cam.width, cam.height), dtype)

    feats = frame_mod.extract_stereo_features(
        img_l, img_r, state.fast_th, llength_th, cam, cfg, tp=tp)
    return _track_and_update(state, feats, cam, cfg, tp=tp)


def _track_and_update(state: VOState, feats, cam, cfg: VOConfig, tp=None):
    dtype = state.Tfw.dtype
    pm = match_f2f_points(state.prev_points, feats.points, cfg, cam, tp=tp)
    lm = match_f2f_lines(state.prev_lines, feats.lines, cfg, cam, tp=tp)

    est, pm, lm = optimizer.optimize_pose(
        pm, lm, cam, cfg, state.DT, state.DT_cov, state.err_norm)

    first = ~state.initialized
    I4 = jnp.eye(4, dtype=dtype)
    # first frame: identity pose, "good" irrelevant (reference initialize)
    DT_commit = jnp.where(first, I4, est.DT)
    good = jnp.where(first, True, est.good)
    cov_commit = jnp.where(first, jnp.zeros((6, 6), dtype), est.DT_cov)
    err_commit = jnp.where(first, -1.0, est.err_norm).astype(dtype)

    # pose composition (:377-378); bad solution coasts on prev Tfw (:383-390)
    Tfw_new = jnp.where(
        good & ~first, se3.renormalize_se3(se3.mm(state.Tfw, DT_commit)), state.Tfw)
    Tfw_cov_new = jnp.where(
        good & ~first,
        se3.unccomp_se3(state.Tfw, state.Tfw_cov, cov_commit),
        state.Tfw_cov)

    est_for_kf = est._replace(DT=DT_commit, DT_cov=cov_commit,
                              good=good & ~first)
    (is_kf, T_prevKF, cov_kf, entropy_first, n_kf,
     entropy_ratio) = keyframe_update(state, est_for_kf, Tfw_new, cfg)

    fast_th_new = jnp.where(
        first, state.fast_th,
        update_fast_threshold(state.fast_th, good, err_commit,
                              est.n_inliers_pt, cfg))

    new_state = VOState(
        prev_points=feats.points, prev_lines=feats.lines,
        Tfw=Tfw_new, Tfw_cov=Tfw_cov_new,
        DT=DT_commit, DT_cov=cov_commit, err_norm=err_commit,
        fast_th=fast_th_new,
        initialized=jnp.asarray(True),
        T_prevKF=T_prevKF, cov_prevKF_currF=cov_kf,
        entropy_first_prevKF=entropy_first,
        prev_f_iskf=is_kf, N_prevKF_currF=n_kf)

    telem = StepTelemetry(
        Tfw=Tfw_new, DT=DT_commit, DT_cov_eig=est.DT_cov_eig,
        err_norm=err_commit, good=good,
        n_points=jnp.sum(pm.valid), n_inliers_pt=est.n_inliers_pt,
        n_lines=jnp.sum(lm.valid), n_inliers_ls=est.n_inliers_ls,
        fast_th=fast_th_new, is_kf=is_kf & ~first,
        entropy_ratio=entropy_ratio, opt_iters=est.iters)
    return new_state, telem


@functools.partial(jax.jit, static_argnames=("cfg", "cam"))
def vo_step_rgbd(state: VOState, img: jnp.ndarray, depth: jnp.ndarray,
                 cam: cam_ops.StereoCamera,
                 cfg: VOConfig) -> tuple[VOState, StepTelemetry]:
    """RGB-D variant of vo_step: intensity + registered metric depth map
    (reference extractRGBDFeatures path, src/stereoFrame.cpp:667-818)."""
    dtype = state.Tfw.dtype
    llength_th = jnp.asarray(
        cfg.min_line_length * min(cam.width, cam.height), dtype)
    feats = frame_mod.extract_rgbd_features(
        img, depth, state.fast_th, llength_th, cam, cfg)
    return _track_and_update(state, feats, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "cam", "tp"))
def vo_scan(state: VOState, imgs_l: jnp.ndarray, imgs_r: jnp.ndarray,
            cam: cam_ops.StereoCamera, cfg: VOConfig, tp=None):
    """Run a whole sequence on device: [T, H, W] stereo stacks -> trajectory.

    The reference's while-loop over dataset frames (app/imagesStVO.cpp:88-125)
    becomes one `lax.scan`, keeping HBM-resident state between frames."""
    def step(s, pair):
        il, ir = pair
        s2, t = vo_step(s, il, ir, cam, cfg, tp=tp)
        return s2, t
    return jax.lax.scan(step, state, (imgs_l, imgs_r))
