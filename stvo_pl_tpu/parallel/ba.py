"""Windowed bundle adjustment with Schur-complement reduction, distributed
over the device mesh.

A genuinely new capability over the reference (which is strictly
frame-to-frame, SURVEY.md §5 "long-context"): jointly refine a window of K
keyframe poses against N tracked POINT landmarks and Nl tracked LINE
landmarks.

Math (classic Schur BA, shaped for TPU):
  * point residual r_ik = proj(T_k^w->c X_i) - obs_ik (stereo u_l, v, u_r);
  * line residual: each line landmark is a pair of 3-D endpoints; per
    keyframe the residual is the signed distance of each projected endpoint
    to the OBSERVED infinite line, le . [u, v, 1] — the same
    endpoint-to-line error the pose optimizer minimizes (reference
    src/stereoFrameHandler.cpp:610-684, repo models/optimizer._line_terms),
    weighted by Cauchy x segment overlap.  Each endpoint enters the normal
    equations as its own 3-DoF landmark block (the two residual rows couple
    disjoint endpoints), so the Schur structure is unchanged.  Sliding of
    an endpoint ALONG the 3-D line is unobservable by construction; the
    scale-aware Hll damping leaves that null direction un-updated instead
    of chasing noise, exactly like a gauge freedom;
  * normal equations split into pose blocks Hpp (6x6 per pose), landmark
    blocks Hll (3x3 per landmark/endpoint, block diagonal), coupling U_ik;
  * the reduced camera system S = Hpp - U Hll^{-1} U^T is dense [6K, 6K] —
    tiny — while everything landmark-indexed is embarrassingly parallel
    over i.  MEASURED window sizes (round 5, corridor 1000-frame CLI):
    K=4 compiles in ~24 s and refines at 0.10 s/window; K=8 ~39 s / 0.23;
    K=16 ~152 s / 0.53 (the K*Np landmark slots and K^2/2 pairwise track
    matching grow the graph).  K=4-8 is the supported envelope; larger K
    also buys nothing at the production keyframe cadence (EVAL.md §3
    round-5 table: cross-KF tracks over ~30+-frame baselines mostly fail
    the trust gates);
  * distribution: shard landmarks over the mesh's data axis with shard_map;
    each device reduces its partial S and rhs, one psum produces the global
    reduced system, every device solves it redundantly (cheaper than a
    gather), landmark back-substitution stays local.  This is the
    "psum of H/b blocks" north star of BASELINE.json.

Gauge: pose 0 is held fixed.  Robust Cauchy weights on the reprojection
residual, reference-style (src/auxiliar.cpp:556-559).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stvo_pl_tpu.ops import robust, se3
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel.mesh import DATA_AXIS


class BAProblem(NamedTuple):
    X: jnp.ndarray         # [N, 3] landmark positions (window/world frame)
    obs: jnp.ndarray       # [N, K, 3] stereo observations (u_l, v, u_r)
    mask: jnp.ndarray      # [N, K] bool: landmark i observed in keyframe k
    sigma2: jnp.ndarray    # [N] per-landmark measurement variance factor
    # --- line landmarks (None when the problem is points-only) ----------
    Xl: jnp.ndarray | None = None       # [Nl, 2, 3] 3-D endpoints (world)
    obs_l: jnp.ndarray | None = None    # [Nl, K, 7] (a, b, c, sx, sy, ex, ey):
    #   observed infinite line (|(a,b)|=1) + observed 2-D segment endpoints
    mask_l: jnp.ndarray | None = None   # [Nl, K]
    sigma2_l: jnp.ndarray | None = None  # [Nl]


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det), det clamped."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20,
                    jnp.where(det < 0, -1e-20, 1e-20), det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _residuals_jacobians(poses_cw: jnp.ndarray, X: jnp.ndarray,
                         obs: jnp.ndarray, cam: cam_ops.StereoCamera):
    """poses_cw: [K, 4, 4] world->camera.  Returns per-observation stereo
    residual [N, K, 3] (left u, v, right u), pose Jacobian A [N, K, 3, 6]
    (left perturbation on the world->camera transform), landmark Jacobian
    B [N, K, 3, 3].

    The right-camera u observation pins the metric scale of the window —
    without it a monocular BA gauge (global scale) stays free even with
    pose 0 fixed, and the window drifts along the noise direction.
    """
    R = poses_cw[:, :3, :3]                       # [K, 3, 3]
    t = poses_cw[:, :3, 3]
    Pc = jnp.einsum("kab,nb->nka", R, X,
                    precision=jax.lax.Precision.HIGHEST) + t[None]
    z = Pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.cx + cam.fx * Pc[..., 0] / z_safe
    v = cam.cy + cam.fy * Pc[..., 1] / z_safe
    u_r = cam.cx + cam.fx * (Pc[..., 0] - cam.b) / z_safe
    r = jnp.stack([u, v, u_r], axis=-1) - obs     # [N, K, 3]

    x, y = Pc[..., 0], Pc[..., 1]
    iz = 1.0 / z_safe
    iz2 = iz * iz
    fx, fy = cam.fx, cam.fy
    zero = jnp.zeros_like(z)
    # d (u, v, u_r) / d Pc  [N, K, 3, 3]
    Jp = jnp.stack([
        jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
        jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        jnp.stack([fx * iz, zero, -fx * (x - cam.b) * iz2], axis=-1),
    ], axis=-2)
    # left perturbation: d Pc / d xi = [I | -[Pc]x]  -> A = Jp @ [I, -skew]
    skew = se3.skew(Pc)                            # [N, K, 3, 3]
    A_t = Jp                                       # translation part
    A_w = -jnp.einsum("nkij,nkjl->nkil", Jp, skew,
                      precision=jax.lax.Precision.HIGHEST)
    A = jnp.concatenate([A_t, A_w], axis=-1)       # [N, K, 2, 6]
    # d Pc / d X = R_k
    B = jnp.einsum("nkij,kjl->nkil", Jp, R,
                   precision=jax.lax.Precision.HIGHEST)  # [N, K, 2, 3]
    return r, A, B


def _line_residuals_jacobians(poses_cw: jnp.ndarray, Xl: jnp.ndarray,
                              obs_l: jnp.ndarray, cam: cam_ops.StereoCamera):
    """Endpoint-to-observed-infinite-line residuals for line landmarks.

    Xl [Nl, 2, 3] world endpoints; obs_l [Nl, K, 7].  Returns residual
    r [Nl, K, 2] (start, end row), pose Jacobian A [Nl, K, 2, 6] (left
    perturbation), endpoint Jacobian B [Nl, K, 2, 3] (row j w.r.t. endpoint
    j only), projected endpoints [Nl, K, 2, 2], and depth z [Nl, K, 2].
    """
    R = poses_cw[:, :3, :3]
    t = poses_cw[:, :3, 3]
    Pc = jnp.einsum("kab,njb->nkja", R, Xl,
                    precision=jax.lax.Precision.HIGHEST) \
        + t[None, :, None]                          # [Nl, K, 2, 3]
    z = Pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.cx + cam.fx * Pc[..., 0] / z_safe
    v = cam.cy + cam.fy * Pc[..., 1] / z_safe
    le = obs_l[..., :3]                             # [Nl, K, 3]
    a_, b_, c_ = le[..., 0:1], le[..., 1:2], le[..., 2:3]
    r = a_ * u + b_ * v + c_                        # [Nl, K, 2]

    # d r / d Pc = a * du/dPc + b * dv/dPc      [Nl, K, 2, 3]
    iz = 1.0 / z_safe
    iz2 = iz * iz
    g = jnp.stack([
        a_ * cam.fx * iz,
        b_ * cam.fy * iz,
        -(a_ * cam.fx * Pc[..., 0] + b_ * cam.fy * Pc[..., 1]) * iz2,
    ], axis=-1)
    # left perturbation: d Pc / d xi = [I | -[Pc]x]
    gw = -jnp.einsum("nkji,nkjil->nkjl", g, se3.skew(Pc),
                     precision=jax.lax.Precision.HIGHEST)
    A = jnp.concatenate([g, gw], axis=-1)           # [Nl, K, 2, 6]
    B = jnp.einsum("nkji,kil->nkjl", g, R,
                   precision=jax.lax.Precision.HIGHEST)  # [Nl, K, 2, 3]
    proj = jnp.stack([u, v], axis=-1)               # [Nl, K, 2, 2]
    return r, A, B, proj, z


def _schur_partials(r, A, B, w):
    """Generic per-landmark normal-equation partials.  All residual rows of
    element m couple pose k and landmark m: r [M, K, a], A [M, K, a, 6],
    B [M, K, a, 3], w [M, K] (already masked)."""
    hp = jax.lax.Precision.HIGHEST
    Aw = A * w[..., None, None]
    Bw = B * w[..., None, None]
    Hpp = jnp.einsum("mkai,mkaj->kij", Aw, A, precision=hp)   # [K, 6, 6]
    Hll = jnp.einsum("mkai,mkaj->mij", Bw, B, precision=hp)   # [M, 3, 3]
    U = jnp.einsum("mkai,mkaj->mkij", Aw, B, precision=hp)    # [M, K, 6, 3]
    bp = -jnp.einsum("mkai,mka->ki", Aw, r, precision=hp)     # [K, 6]
    bl = -jnp.einsum("mkai,mka->mi", Bw, r, precision=hp)     # [M, 3]
    return Hpp, Hll, U, bp, bl


def _invert_landmark_blocks(Hll):
    """Damp + invert landmark blocks.  A landmark seen once has a rank-2
    (points) or rank-1 (line endpoints) block; scale-aware damping keeps the
    inverse finite in f32 (plain jnp.linalg.inv NaNs at condition ~1e9), and
    the closed-form adjugate is branch-free and batch-friendly.  Null
    directions (e.g. sliding along a line) get a ~1e3-damped, i.e.
    effectively frozen, update."""
    I3 = jnp.eye(3, dtype=Hll.dtype)
    lam = (1e-3 * jnp.trace(Hll, axis1=-2, axis2=-1) / 3.0 + 1e-6)
    return _inv3(Hll + lam[:, None, None] * I3)


def _schur_reduce(Hll_inv, U, bl):
    """S_red[k,l] = sum_m U_mk Hll_m^-1 U_ml^T and its rhs."""
    hp = jax.lax.Precision.HIGHEST
    UHinv = jnp.einsum("mkij,mjl->mkil", U, Hll_inv, precision=hp)
    S_red = jnp.einsum("mkil,mnjl->kinj", UHinv, U, precision=hp)
    b_red = jnp.einsum("mkij,mj->ki", UHinv, bl, precision=hp)
    return S_red, b_red, UHinv


def _point_system(poses_cw, prob: BAProblem, cam, kernel):
    r, A, B = _residuals_jacobians(poses_cw, prob.X, prob.obs, cam)
    rn = jnp.linalg.norm(r, axis=-1)               # [N, K]
    w = robust.robust_weight(rn * jnp.sqrt(prob.sigma2)[:, None], kernel)
    w = jnp.where(prob.mask, w, 0.0)               # [N, K]
    Hpp, Hll, U, bp, bl = _schur_partials(r, A, B, w)
    cost = jnp.sum(w * rn * rn)
    nobs = jnp.sum(w > 0)
    return Hpp, Hll, U, bp, bl, cost, nobs


def _line_system(poses_cw, prob: BAProblem, cam, kernel):
    """Line landmarks flattened to independent per-endpoint 3-DoF blocks
    (M = 2*Nl, one residual row each)."""
    r, A, B, proj, z = _line_residuals_jacobians(poses_cw, prob.Xl,
                                                 prob.obs_l, cam)
    rn = jnp.linalg.norm(r, axis=-1)               # [Nl, K]
    w = robust.robust_weight(rn * jnp.sqrt(prob.sigma2_l)[:, None], kernel)
    # segment-overlap factor like the pose optimizer (reference :672-676)
    from stvo_pl_tpu.models.optimizer import segment_overlap
    ov = segment_overlap(prob.obs_l[..., 3:5], prob.obs_l[..., 5:7],
                         proj[:, :, 0], proj[:, :, 1])
    w = jnp.where(prob.mask_l & jnp.all(z > 0.1, axis=-1), w * ov, 0.0)
    cost = jnp.sum(w * rn * rn)
    nobs = jnp.sum(w > 0)

    Nl, K = rn.shape
    # endpoint-flatten: row j of line i -> element m = 2 i + j, a-dim 1
    r2 = r.transpose(0, 2, 1).reshape(2 * Nl, K, 1)
    A2 = A.transpose(0, 2, 1, 3).reshape(2 * Nl, K, 1, 6)
    B2 = B.transpose(0, 2, 1, 3).reshape(2 * Nl, K, 1, 3)
    w2 = jnp.broadcast_to(w[:, None, :], (Nl, 2, K)).reshape(2 * Nl, K)
    Hpp, Hll, U, bp, bl = _schur_partials(r2, A2, B2, w2)
    return Hpp, Hll, U, bp, bl, cost, nobs


def point_chi2(poses_cw, prob: BAProblem, cam, kernel="cauchy"):
    """Robust point-residual chi-square of a window solution.

    The acceptance statistic for the automatic line-trust policy: a joint
    points+lines solution is only trusted when the POINT residuals it
    leaves behind are no worse than the points-only solution's — the
    window-level analogue of the reference's isGoodSolution gate
    (src/stereoFrameHandler.cpp:292-305).  With the Cauchy kernel each
    observation contributes w*r^2 = r^2/(1+r^2) <= 1, so the sum is
    mask-comparable across solutions of the same problem."""
    _, _, _, _, _, cost, nobs = _point_system(poses_cw, prob, cam, kernel)
    return cost, nobs


def _reduced_system(poses_cw, prob: BAProblem, cam, kernel="cauchy"):
    """Build the Schur-reduced camera system (S [K,6,K,6], b [K,6]) plus the
    per-type landmark blocks needed for back-substitution."""
    K = poses_cw.shape[0]
    Hpp, Hll, U, bp, bl, cost, nobs = _point_system(poses_cw, prob, cam,
                                                    kernel)
    Hll_inv = _invert_landmark_blocks(Hll)
    S_red, b_red, _ = _schur_reduce(Hll_inv, U, bl)
    aux_l = None
    if prob.Xl is not None:
        Hpp_l, Hll_l, U_l, bp_l, bl_l, cost_l, nobs_l = _line_system(
            poses_cw, prob, cam, kernel)
        Hll_inv_l = _invert_landmark_blocks(Hll_l)
        S_red_l, b_red_l, _ = _schur_reduce(Hll_inv_l, U_l, bl_l)
        Hpp = Hpp + Hpp_l
        bp = bp + bp_l
        S_red = S_red + S_red_l
        b_red = b_red + b_red_l
        cost = cost + cost_l
        nobs = nobs + nobs_l
        aux_l = (Hll_inv_l, U_l, bl_l)

    S = -S_red
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
    b = bp - b_red
    return S, b, (Hll_inv, U, bl), aux_l, cost, nobs


def _apply_pose_update(poses_cw, dxi):
    """Left-multiplicative update exp(dxi_k) T_k, pose 0 pinned."""
    dxi = dxi.at[0].set(0.0)
    return se3.mm(se3.expmap_se3(dxi), poses_cw)


def _solve_reduced(S, b, damping, K):
    """Solve the gauge-fixed reduced camera system for the pose update."""
    S2 = S.reshape(6 * K, 6 * K)
    S2 = S2 + damping * jnp.eye(6 * K, dtype=S2.dtype)
    # gauge fix: pin pose 0 by clearing its rows/cols and setting identity
    g = jnp.arange(6)
    S2 = S2.at[:6, :].set(0.0).at[:, :6].set(0.0)
    S2 = S2.at[g, g].set(1.0)
    b2 = b.reshape(-1).at[:6].set(0.0)
    return jnp.linalg.solve(S2, b2).reshape(K, 6)


def _back_substitute(aux, dxi, X, mask):
    """dX_m = Hll_m^-1 (bl_m - sum_k U_mk^T dxi_k), frozen where unseen."""
    Hll_inv, U, bl = aux
    hp = jax.lax.Precision.HIGHEST
    Ud = jnp.einsum("mkij,ki->mj", U, dxi, precision=hp)
    dX = jnp.einsum("mij,mj->mi", Hll_inv, bl - Ud, precision=hp)
    seen = jnp.any(mask, axis=1)
    return X + jnp.where(seen[:, None], dX, 0.0)


def ba_iteration(poses_cw, prob: BAProblem, cam, damping=1e-4,
                 kernel="cauchy", update_landmarks=True):
    """One GN/LM step of windowed BA.  Returns (poses, X, Xl, cost);
    Xl is None for points-only problems."""
    K = poses_cw.shape[0]
    S, b, aux_p, aux_l, cost, _ = _reduced_system(poses_cw, prob, cam,
                                                  kernel)
    dxi = _solve_reduced(S, b, damping, K)
    poses_new = _apply_pose_update(poses_cw, dxi)
    X_new, Xl_new = prob.X, prob.Xl
    if update_landmarks:
        X_new = _back_substitute(aux_p, dxi, prob.X, prob.mask)
        if aux_l is not None:
            Nl = prob.Xl.shape[0]
            mask_ep = jnp.broadcast_to(prob.mask_l[:, None, :],
                                       (Nl, 2, prob.mask_l.shape[1]))
            Xl_flat = _back_substitute(aux_l, dxi, prob.Xl.reshape(2 * Nl, 3),
                                       mask_ep.reshape(2 * Nl, -1))
            Xl_new = Xl_flat.reshape(Nl, 2, 3)
    return poses_new, X_new, Xl_new, cost


@functools.partial(jax.jit, static_argnames=("cam", "n_iters", "kernel",
                                             "update_landmarks"))
def ba_solve(poses_cw, prob: BAProblem, cam, n_iters: int = 8,
             damping: float = 1e-4, kernel: str = "cauchy",
             update_landmarks: bool = True):
    """Run n_iters of windowed BA on one device.  Returns
    (poses, X, Xl_or_None, costs)."""
    def body(carry, _):
        poses, X, Xl = carry
        p2, X2, Xl2, cost = ba_iteration(
            poses, prob._replace(X=X, Xl=Xl), cam, damping, kernel,
            update_landmarks)
        return (p2, X2, Xl2), cost
    (poses, X, Xl), costs = jax.lax.scan(
        body, (poses_cw, prob.X, prob.Xl), None, length=n_iters)
    return poses, X, Xl, costs


def make_sharded_ba(mesh, cam, n_iters: int = 8, damping: float = 1e-4,
                    kernel: str = "cauchy", has_lines: bool = False):
    """Distributed windowed BA: landmarks sharded over the data axis.

    Per device: partial (S, b) over its landmark shard (points AND line
    endpoints); one psum builds the global reduced camera system; the
    [6K, 6K] solve is replicated (cheaper than gathering); landmark updates
    stay local to each shard.  With has_lines=True the solver takes four
    extra line arrays, each sharded on the landmark axis.
    """
    from jax import shard_map

    def one_iter(poses_cw, prob: BAProblem):
        K = poses_cw.shape[0]
        S, b, aux_p, aux_l, cost, _ = _reduced_system(poses_cw, prob, cam,
                                                      kernel)
        S = jax.lax.psum(S, DATA_AXIS)
        b = jax.lax.psum(b, DATA_AXIS)
        cost = jax.lax.psum(cost, DATA_AXIS)
        dxi = _solve_reduced(S, b, damping, K)
        poses_new = _apply_pose_update(poses_cw, dxi)
        X_new = _back_substitute(aux_p, dxi, prob.X, prob.mask)
        Xl_new = prob.Xl
        if aux_l is not None:
            Nl = prob.Xl.shape[0]
            mask_ep = jnp.broadcast_to(prob.mask_l[:, None, :],
                                       (Nl, 2, prob.mask_l.shape[1]))
            Xl_new = _back_substitute(
                aux_l, dxi, prob.Xl.reshape(2 * Nl, 3),
                mask_ep.reshape(2 * Nl, -1)).reshape(Nl, 2, 3)
        return poses_new, X_new, Xl_new, cost

    def solve(poses_cw, X, obs, mask, sigma2,
              Xl=None, obs_l=None, mask_l=None, sigma2_l=None):
        def body(carry, _):
            poses, Xc, Xlc = carry
            prob = BAProblem(X=Xc, obs=obs, mask=mask, sigma2=sigma2,
                             Xl=Xlc, obs_l=obs_l, mask_l=mask_l,
                             sigma2_l=sigma2_l)
            p2, X2, Xl2, cost = one_iter(poses, prob)
            return (p2, X2, Xl2), cost
        (poses, Xf, Xlf), costs = jax.lax.scan(body, (poses_cw, X, Xl), None,
                                               length=n_iters)
        return poses, Xf, Xlf, costs

    if has_lines:
        entry = solve
        in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS))
        out_specs = (P(), P(DATA_AXIS), P(DATA_AXIS), P())
    else:
        def entry(poses_cw, X, obs, mask, sigma2):
            poses, Xf, _, costs = solve(poses_cw, X, obs, mask, sigma2)
            return poses, Xf, costs
        in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS))
        out_specs = (P(), P(DATA_AXIS), P())

    sharded = shard_map(
        entry, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs,
        check_vma=False)
    return jax.jit(sharded)
