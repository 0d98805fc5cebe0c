"""Robust 6-DoF pose optimization over matched point + line features.

Reimplements the reference's numerical core — optimizeFunctions /
optimizeFunctionsRobust (src/stereoFrameHandler.cpp:549-962), the GN / robust
GN / LM drivers (:394-547), MAD outlier rejection (:988-1067), and the
optimizePose state machine (:307-392) — as masked, batched array programs:

  * residuals/Jacobians for ALL features at once ([N] lanes, invalid lanes
    weighted 0), H = J^T W J and g = J^T W r via einsum -> MXU;
  * iteration with `lax.while_loop` carrying (DT, H, err, status) so the
    reference's early-exit semantics (error increase, small change, small
    step) survive compilation;
  * the good/bad-solution branching of optimizePose via `lax.cond`.

Point residual: r = |proj(DT P) - obs| * sqrt(sigma2), Cauchy weight on r.
Line residual: r = |(le . [sp_proj;1], le . [ep_proj;1])| * sqrt(sigma2),
Cauchy weight x segment-overlap factor.  Jacobian formulas are the analytic
6-DoF expressions of the reference (:582-587, :636-654).

One deliberate improvement over the reference: its Jacobian is the gradient
under a LEFT perturbation exp(xi) * DT, but its update multiplies on the
RIGHT (DT * expmap(dx)^{-1}, :419) — the Adj(DT) mismatch turns Gauss-Newton
into an inexact method that limit-cycles near the optimum once |t| grows
(masked in the reference by max_iters=5 and sensor noise).  Here the update
side matches the Jacobian convention (expmap(dx)^{-1} * DT), restoring true
GN with quadratic convergence to the same optimum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import linalg, robust, se3
from stvo_pl_tpu.models.features import LineMatches, PointMatches

SQRT_CHI2_995_3DOF = 2.7955  # sqrt(7.815), robust-scale clamp (:744)


class OptimResult(NamedTuple):
    DT: jnp.ndarray        # [4, 4]
    cov: jnp.ndarray       # [6, 6]
    err: jnp.ndarray       # scalar; -1.0 flags failure
    iters: jnp.ndarray     # scalar int


# ---------------------------------------------------------------------------
# residuals and Jacobians
# ---------------------------------------------------------------------------

def _safe_project(cam, P_):
    """Projection with a z-guard so masked/degenerate lanes yield finite
    garbage instead of NaN (0 * NaN = NaN would poison the einsum sums)."""
    z = P_[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.cx + cam.fx * P_[..., 0] / z_safe
    v = cam.cy + cam.fy * P_[..., 1] / z_safe
    return jnp.stack([u, v], axis=-1)


def _point_terms(DT, pm: PointMatches, cam, homog_th):
    """Per-point residual norm, unit-residual Jacobian, active mask."""
    P_ = se3.transform_points(DT, pm.P)            # [N, 3]
    proj = _safe_project(cam, P_)
    err = proj - pm.obs                            # [N, 2]
    err_norm = jnp.linalg.norm(err, axis=-1)

    gx, gy, gz = P_[..., 0], P_[..., 1], P_[..., 2]
    gz2 = gz * gz
    fgz2 = cam.fx / jnp.maximum(homog_th, gz2)
    dx, dy = err[..., 0], err[..., 1]
    # analytic Jacobian of |err| wrt the twist (reference :582-588)
    J = jnp.stack([
        + fgz2 * dx * gz,
        + fgz2 * dy * gz,
        - fgz2 * (gx * dx + gy * dy),
        - fgz2 * (gx * gy * dx + gy * gy * dy + gz * gz * dy),
        + fgz2 * (gx * gx * dx + gz * gz * dx + gx * gy * dy),
        + fgz2 * (gx * gz * dy - gy * gz * dx),
    ], axis=-1) / jnp.maximum(homog_th, err_norm)[..., None]

    active = pm.valid & pm.inlier
    return err_norm, J, active


def _line_point_jac(P_, lx, ly, fx, homog_th):
    gx, gy, gz = P_[..., 0], P_[..., 1], P_[..., 2]
    gz2 = gz * gz
    fgz2 = fx / jnp.maximum(homog_th, gz2)
    return jnp.stack([
        + fgz2 * lx * gz,
        + fgz2 * ly * gz,
        - fgz2 * (gx * lx + gy * ly),
        - fgz2 * (gx * gy * lx + gy * gy * ly + gz * gz * ly),
        + fgz2 * (gx * gx * lx + gz * gz * lx + gx * gy * ly),
        + fgz2 * (gx * gz * ly - gy * gz * lx),
    ], axis=-1)


def segment_overlap(sp_obs, ep_obs, sp_proj, ep_proj):
    """Projection overlap of the projected segment onto the observed one
    (lineSegmentOverlap, src/stereoFrame.cpp:510-616 /
    f2fLineSegmentOverlap :182-288), branch-free.

    Project both projected endpoints onto the observed segment's axis and
    measure the [0,1]-clipped parameter overlap.  This unifies the
    reference's vertical / horizontal / general special cases (which exist
    only to avoid divisions) into one formula.
    """
    l = ep_obs - sp_obs
    denom = jnp.maximum(jnp.sum(l * l, axis=-1), 1e-12)
    lam_s = jnp.sum((sp_proj - sp_obs) * l, axis=-1) / denom
    lam_e = jnp.sum((ep_proj - sp_obs) * l, axis=-1) / denom
    lam_min = jnp.minimum(lam_s, lam_e)
    lam_max = jnp.maximum(lam_s, lam_e)
    ov = jnp.minimum(lam_max, 1.0) - jnp.maximum(lam_min, 0.0)
    return jnp.clip(ov, 0.0, 1.0)


def _line_terms(DT, lm: LineMatches, cam, homog_th):
    """Per-line residual norm, Jacobian, overlap factor, active mask."""
    sP_ = se3.transform_points(DT, lm.sP)
    eP_ = se3.transform_points(DT, lm.eP)
    sp_proj = _safe_project(cam, sP_)
    ep_proj = _safe_project(cam, eP_)
    l = lm.le_obs
    ds = l[..., 0] * sp_proj[..., 0] + l[..., 1] * sp_proj[..., 1] + l[..., 2]
    de = l[..., 0] * ep_proj[..., 0] + l[..., 1] * ep_proj[..., 1] + l[..., 2]
    err_norm = jnp.sqrt(ds * ds + de * de)

    Js = _line_point_jac(sP_, l[..., 0], l[..., 1], cam.fx, homog_th)
    Je = _line_point_jac(eP_, l[..., 0], l[..., 1], cam.fx, homog_th)
    J = (Js * ds[..., None] + Je * de[..., None]) \
        / jnp.maximum(homog_th, err_norm)[..., None]

    overlap = segment_overlap(lm.spl, lm.epl, sp_proj, ep_proj)
    active = lm.valid & lm.inlier
    return err_norm, J, overlap, active


def _accumulate(J, r, w, active, dtype):
    # sanitize inactive lanes: einsum contractions must never see NaN/inf
    wm = jnp.where(active, w, 0.0).astype(dtype)
    r = jnp.where(active, r, 0.0)
    J = jnp.where(active[:, None], J, 0.0)
    H = jnp.einsum("ni,nj,n->ij", J, J, wm,
                   precision=jax.lax.Precision.HIGHEST)
    g = jnp.einsum("ni,n->i", J, (r * wm),
                   precision=jax.lax.Precision.HIGHEST)
    e = jnp.sum(r * r * wm)
    return H, g, e


def build_normal_equations(DT, pm: PointMatches, lm: LineMatches, cam,
                           cfg: VOConfig, robust_scaled: bool,
                           s_p=None, s_l=None):
    """One evaluation of (H, g, err) over all active features.

    robust_scaled=False: optimizeFunctions (:549-694) — residual scaled by
    sqrt(sigma2), Cauchy weight on the scaled residual.
    robust_scaled=True: optimizeFunctionsRobust (:696-962) — raw residual,
    Cauchy weight on r / s with per-modality MAD scale s (clamped).
    """
    th = cfg.homog_th
    p_norm, Jp, p_active = _point_terms(DT, pm, cam, th)
    l_norm, Jl, l_overlap, l_active = _line_terms(DT, lm, cam, th)

    if robust_scaled:
        rp = p_norm
        rl = l_norm
        wp = robust.robust_weight(rp / s_p, cfg.robust_kernel)
        wl = robust.robust_weight(rl / s_l, cfg.robust_kernel) * l_overlap
    else:
        rp = p_norm * jnp.sqrt(pm.sigma2)
        rl = l_norm * jnp.sqrt(lm.sigma2)
        wp = robust.robust_weight(rp, cfg.robust_kernel)
        wl = robust.robust_weight(rl, cfg.robust_kernel) * l_overlap

    dtype = DT.dtype
    Hp, gp, ep = _accumulate(Jp, rp, wp, p_active, dtype)
    Hl, gl, el = _accumulate(Jl, rl, wl, l_active, dtype)
    n = (jnp.sum(p_active) + jnp.sum(l_active)).astype(dtype)
    H = Hp + Hl
    g = gp + gl
    e = (ep + el) / jnp.maximum(n, 1.0)
    return H, g, e


def _mad_scales(DT, pm, lm, cam):
    """Per-modality MAD scale of raw residual norms, clamped to
    [1e-4, sqrt(7.815)] (reference :741-781)."""
    p_norm, _, p_active = _point_terms(DT, pm, cam, 1e-7)
    l_norm, _, _, l_active = _line_terms(DT, lm, cam, 1e-7)
    s_p = robust.masked_stdv_mad(p_norm, p_active)
    s_l = robust.masked_stdv_mad(l_norm, l_active)
    clamp = lambda s: jnp.clip(s, 1e-4, SQRT_CHI2_995_3DOF)
    return clamp(s_p), clamp(s_l)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------

_BIG_ERR = 999999999.9


def gauss_newton(DT0, pm, lm, cam, cfg: VOConfig, max_iters: int,
                 robust_scaled: bool = False) -> OptimResult:
    """GN driver replicating gaussNewtonOptimization (:394-431) and, with
    robust_scaled=True, gaussNewtonOptimizationRobust (:433-480)."""

    def cost(DT):
        if robust_scaled:
            s_p, s_l = _mad_scales(DT, pm, lm, cam)
            return build_normal_equations(DT, pm, lm, cam, cfg, True, s_p, s_l)
        return build_normal_equations(DT, pm, lm, cam, cfg, False)

    def body(carry):
        DT, H_out, err_out, err_prev, it, status = carry
        H, g, err = cost(DT)

        if not robust_scaled:
            # plain GN: increasing error aborts (keeps stepped DT if it > 0,
            # total failure if the first evaluation already increased — :405-410)
            inc = err > err_prev
            fail_first = inc & (it == 0)
        else:
            inc = jnp.asarray(False)
            fail_first = jnp.asarray(False)

        small = (err < cfg.min_error) | (jnp.abs(err - err_prev)
                                         < cfg.min_error_change)

        dx, ok = linalg.solve6(H, g)
        solver_fail = ~ok if robust_scaled else jnp.asarray(False)

        DT_new = se3.mm(se3.inverse_se3(se3.expmap_se3(dx)), DT)
        if not robust_scaled:
            small_dx = ((jnp.linalg.norm(dx[:3]) < cfg.min_error_change)
                        & (jnp.linalg.norm(dx[3:]) < cfg.min_error_change))
        else:
            small_dx = jnp.linalg.norm(dx) < cfg.min_error_change

        stop_before_step = inc | small | solver_fail | fail_first
        DT_next = jnp.where(stop_before_step, DT, DT_new)
        status_new = jnp.where(
            fail_first | solver_fail, 2,
            jnp.where(inc | small | small_dx, 1, 0)).astype(jnp.int32)
        return (DT_next, H, err, err, it + 1, status_new)

    def cond(carry):
        *_, it, status = carry
        return (it < max_iters) & (status == 0)

    dtype = DT0.dtype
    init = (DT0, jnp.eye(6, dtype=dtype),
            jnp.asarray(-1.0, dtype), jnp.asarray(_BIG_ERR, dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    DT, H, err, _, iters, status = jax.lax.while_loop(cond, body, init)

    failed = status == 2
    cov = jnp.where(failed, jnp.eye(6, dtype=dtype), linalg.inv6(H))
    err_out = jnp.where(failed, -1.0, err)
    DT_out = jnp.where(failed, DT0, DT)
    return OptimResult(DT=DT_out, cov=cov, err=err_out, iters=iters)


def levenberg_marquardt(DT0, pm, lm, cam, cfg: VOConfig,
                        max_iters: int) -> OptimResult:
    """LM driver (levenbergMarquardtOptimization, :482-547): lambda seeded
    from max |diag H|, /4 on error increase, x4 + step on decrease."""
    lambda_k = 4.0

    def cost(DT):
        return build_normal_equations(DT, pm, lm, cam, cfg, False)

    H0, g0, err0 = cost(DT0)
    Hmax = jnp.max(jnp.abs(jnp.diagonal(H0)))
    lam0 = 1e-9 * Hmax
    dx0, _ = linalg.solve6(H0 + lam0 * jnp.eye(6, dtype=DT0.dtype), g0)
    DT1 = se3.mm(se3.inverse_se3(se3.expmap_se3(dx0)), DT0)

    def body(carry):
        DT, lam, H_out, err_prev, it, status = carry
        H, g, err = cost(DT)
        small = (err < cfg.min_error) | (jnp.abs(err - err_prev)
                                         < cfg.min_error_change)
        Hlm = H + lam * jnp.eye(6, dtype=DT.dtype)
        dx, _ = linalg.solve6(Hlm, g)
        worse = err > err_prev
        lam_new = jnp.where(worse, lam / lambda_k, lam * lambda_k)
        DT_new = jnp.where(worse, DT,
                           se3.mm(se3.inverse_se3(se3.expmap_se3(dx)), DT))
        small_dx = ((jnp.linalg.norm(dx[:3]) < cfg.min_error_change)
                    & (jnp.linalg.norm(dx[3:]) < cfg.min_error_change))
        status_new = jnp.where(small | small_dx, 1, 0).astype(jnp.int32)
        DT_next = jnp.where(small, DT, DT_new)
        return (DT_next, lam_new, H, err, it + 1, status_new)

    def cond(carry):
        *_, it, status = carry
        return (it < max_iters) & (status == 0)

    init = (DT1, lam0, H0, err0, jnp.asarray(1, jnp.int32),
            jnp.asarray(0, jnp.int32))
    DT, lam, H, err, iters, status = jax.lax.while_loop(cond, body, init)
    return OptimResult(DT=DT, cov=linalg.inv6(H), err=err, iters=iters)


# ---------------------------------------------------------------------------
# outlier rejection + state machine
# ---------------------------------------------------------------------------

def remove_outliers(DT, pm: PointMatches, lm: LineMatches, cam,
                    cfg: VOConfig):
    """MAD-threshold outlier rejection (removeOutliers, :988-1067): residual
    (x sqrt(sigma2)) per feature, trimmed mean + MAD stdv, feature is an
    outlier when |res - mean| > inlier_k * stdv.

    Deliberate improvement: the threshold gets an absolute floor (1e-4 px).
    The reference has none, so on a (near-)exact solution — residuals at
    round-off scale, MAD stdv ~ 0 — it would reject essentially every
    feature and coast; its f64 round-off jitter just happens to hide the
    degeneracy.  The floor is far below any real observation noise, so
    behavior on noisy data is unchanged."""
    _TH_FLOOR = 1e-4
    if cfg.has_points:
        p_norm, _, _ = _point_terms(DT, pm, cam, cfg.homog_th)
        res_p = p_norm * jnp.sqrt(pm.sigma2)
        mean_p, stdv_p = robust.masked_mean_stdv_mad(res_p, pm.valid)
        th_p = jnp.maximum(cfg.inlier_k * stdv_p, _TH_FLOOR)
        out_p = jnp.abs(res_p - mean_p) > th_p
        pm = pm._replace(inlier=pm.inlier & ~(out_p & pm.valid))
    if cfg.has_lines:
        l_norm, _, _, _ = _line_terms(DT, lm, cam, cfg.homog_th)
        res_l = l_norm * jnp.sqrt(lm.sigma2)
        mean_l, stdv_l = robust.masked_mean_stdv_mad(res_l, lm.valid)
        th_l = jnp.maximum(cfg.inlier_k * stdv_l, _TH_FLOOR)
        out_l = jnp.abs(res_l - mean_l) > th_l
        lm = lm._replace(inlier=lm.inlier & ~(out_l & lm.valid))
    return pm, lm


def is_good_solution(DT, cov, err):
    """isGoodSolution gate (:292-305): cov eigenvalues in [0, 1], err in
    [0, 1], DT finite."""
    eig = linalg.eigvalsh6(cov)
    return ((eig[0] >= 0.0) & (eig[5] <= 1.0)
            & (err >= 0.0) & (err <= 1.0) & se3.is_finite_mat(DT)
            & jnp.all(jnp.isfinite(eig)))


class PoseEstimate(NamedTuple):
    DT: jnp.ndarray          # [4,4] pose increment T_prev_curr (committed)
    DT_cov: jnp.ndarray      # [6,6]
    DT_cov_eig: jnp.ndarray  # [6]
    err_norm: jnp.ndarray    # scalar (-1 on failure)
    good: jnp.ndarray        # bool — solution committed vs identity fallback
    n_inliers_pt: jnp.ndarray
    n_inliers_ls: jnp.ndarray
    iters: jnp.ndarray       # total GN/LM iterations spent (both stages)


@functools.partial(jax.jit, static_argnames=("cfg", "cam"))
def optimize_pose(pm: PointMatches, lm: LineMatches, cam, cfg: VOConfig,
                  DT_prev, DT_prev_cov, err_prev) -> tuple[PoseEstimate,
                                                           PointMatches,
                                                           LineMatches]:
    """Full optimizePose state machine (:307-392).

    Returns the committed pose increment (already inverted + renormalized:
    curr->DT of the reference) plus the updated inlier masks.
    """
    dtype = DT_prev.dtype
    I4 = jnp.eye(4, dtype=dtype)

    if cfg.use_motion_model:
        prev_ok = is_good_solution(DT_prev, DT_prev_cov, err_prev)
        DT_init = jnp.where(prev_ok, DT_prev, I4)
    else:
        DT_init = I4

    n_inliers = pm.count() + lm.count()
    enough = n_inliers >= cfg.min_features

    def solver(DT0, iters):
        if cfg.optim_mode == 1:
            return gauss_newton(DT0, pm, lm, cam, cfg, iters,
                                robust_scaled=True)
        if cfg.optim_mode == 2:
            return levenberg_marquardt(DT0, pm, lm, cam, cfg, iters)
        return gauss_newton(DT0, pm, lm, cam, cfg, iters)

    # stage 1
    first = solver(DT_init, cfg.max_iters)
    good1 = is_good_solution(first.DT, first.cov, first.err)

    # stage 2a: reject outliers against the stage-1 pose, refine from DT_init
    pm2, lm2 = remove_outliers(first.DT, pm, lm, cam, cfg)
    enough2 = (pm2.count() + lm2.count()) >= cfg.min_features

    def refine_path():
        if cfg.optim_mode == 1:
            r = gauss_newton(DT_init, pm2, lm2, cam, cfg, cfg.max_iters_ref,
                             robust_scaled=True)
        elif cfg.optim_mode == 2:
            r = levenberg_marquardt(DT_init, pm2, lm2, cam, cfg,
                                    cfg.max_iters_ref)
        else:
            r = gauss_newton(DT_init, pm2, lm2, cam, cfg, cfg.max_iters_ref)
        # not enough inliers after removal -> identity failure (:351-355)
        return OptimResult(
            DT=jnp.where(enough2, r.DT, I4),
            cov=jnp.where(enough2, r.cov, jnp.zeros((6, 6), dtype)),
            err=jnp.where(enough2, r.err, -1.0),
            iters=r.iters)

    def fallback_path():
        # stage 2b: robust GN from DT_init (:359)
        return gauss_newton(DT_init, pm, lm, cam, cfg, cfg.max_iters_ref,
                            robust_scaled=True)

    second = jax.lax.cond(good1, refine_path, fallback_path)
    DT_f, cov_f, err_f = second.DT, second.cov, second.err
    nontrivial = (good1 & enough2) | ~good1
    # not enough features at all -> identity failure (:364-368)
    DT_f = jnp.where(enough, DT_f, I4)
    cov_f = jnp.where(enough, cov_f, jnp.zeros((6, 6), dtype))
    err_f = jnp.where(enough, err_f, -1.0)
    nontrivial = nontrivial & enough

    # commit (:372-391): good solution -> invert + renormalize
    good_final = is_good_solution(DT_f, cov_f, err_f) & nontrivial
    DT_commit = jnp.where(
        good_final, se3.renormalize_se3(se3.inverse_se3(DT_f)), I4)
    cov_commit = jnp.where(good_final, cov_f, jnp.zeros((6, 6), dtype))
    err_commit = jnp.where(good_final, err_f, -1.0)
    eig = jnp.where(good_final, linalg.eigvalsh6(cov_f), jnp.zeros(6, dtype))

    # masks: outlier rejection only sticks when stage-2a path was taken
    took_refine = good1 & enough
    pm_out = pm._replace(inlier=jnp.where(took_refine, pm2.inlier, pm.inlier))
    lm_out = lm._replace(inlier=jnp.where(took_refine, lm2.inlier, lm.inlier))

    est = PoseEstimate(
        DT=DT_commit, DT_cov=cov_commit, DT_cov_eig=eig, err_norm=err_commit,
        good=good_final,
        n_inliers_pt=pm_out.count(), n_inliers_ls=lm_out.count(),
        iters=first.iters + second.iters)
    return est, pm_out, lm_out
