"""Windowed bundle adjustment with Schur-complement reduction, distributed
over the device mesh.

A genuinely new capability over the reference (which is strictly
frame-to-frame, SURVEY.md §5 "long-context"): jointly refine a window of K
keyframe poses against N tracked landmarks.

Math (classic Schur BA, shaped for TPU):
  * residual r_ik = proj(T_k^w->c X_i) - obs_ik for landmark i in keyframe k;
  * normal equations split into pose blocks Hpp (6x6 per pose), landmark
    blocks Hll (3x3 per landmark, block diagonal), coupling U_ik (6x3);
  * the reduced camera system S = Hpp - U Hll^{-1} U^T is dense [6K, 6K] —
    tiny (K <= 32) — while everything landmark-indexed is embarrassingly
    parallel over i;
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


def _reduced_system(poses_cw, prob: BAProblem, cam, kernel="cauchy"):
    """Build the Schur-reduced system (S [K,6,K,6], b [K,6]) plus the
    landmark blocks needed for back-substitution."""
    r, A, B = _residuals_jacobians(poses_cw, prob.X, prob.obs, cam)
    rn = jnp.linalg.norm(r, axis=-1)               # [N, K]
    w = robust.robust_weight(rn * jnp.sqrt(prob.sigma2)[:, None], kernel)
    w = jnp.where(prob.mask, w, 0.0)               # [N, K]

    Aw = A * w[..., None, None]
    Hpp = jnp.einsum("nkai,nkaj->kij", Aw, A,
                     precision=jax.lax.Precision.HIGHEST)   # [K, 6, 6]
    Hll = jnp.einsum("nkai,nkaj->nij", B * w[..., None, None], B,
                     precision=jax.lax.Precision.HIGHEST)   # [N, 3, 3]
    U = jnp.einsum("nkai,nkaj->nkij", Aw, B,
                   precision=jax.lax.Precision.HIGHEST)     # [N, K, 6, 3]
    bp = -jnp.einsum("nkai,nka->ki", Aw, r,
                     precision=jax.lax.Precision.HIGHEST)   # [K, 6]
    bl = -jnp.einsum("nkai,nka->ni", B * w[..., None, None], r,
                     precision=jax.lax.Precision.HIGHEST)   # [N, 3]

    # damp + invert landmark blocks.  A landmark seen once has a rank-2
    # block; scale-aware damping keeps the inverse finite in f32 (plain
    # jnp.linalg.inv NaNs at condition ~1e9), and the closed-form adjugate
    # is branch-free and batch-friendly.
    I3 = jnp.eye(3, dtype=Hll.dtype)
    lam = (1e-3 * jnp.trace(Hll, axis1=-2, axis2=-1) / 3.0 + 1e-6)
    Hll_d = Hll + lam[:, None, None] * I3
    Hll_inv = _inv3(Hll_d)                                  # [N, 3, 3]

    # S_kl = delta Hpp - sum_i U_ik Hll_i^-1 U_il^T
    UHinv = jnp.einsum("nkij,njl->nkil", U, Hll_inv,
                       precision=jax.lax.Precision.HIGHEST)  # [N, K, 6, 3]
    S_red = jnp.einsum("nkil,nmjl->kimj", UHinv, U,
                       precision=jax.lax.Precision.HIGHEST)  # [K,6,K,6]
    b_red = jnp.einsum("nkij,nj->ki", UHinv, bl,
                       precision=jax.lax.Precision.HIGHEST)  # [K, 6]

    K = poses_cw.shape[0]
    S = -S_red
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
    b = bp - b_red
    cost = jnp.sum(w * rn * rn)
    nobs = jnp.sum(w > 0)
    return S, b, Hll_inv, U, bl, cost, nobs


def _apply_pose_update(poses_cw, dxi):
    """Left-multiplicative update exp(dxi_k) T_k, pose 0 pinned."""
    dxi = dxi.at[0].set(0.0)
    return se3.mm(se3.expmap_se3(dxi), poses_cw)


def ba_iteration(poses_cw, prob: BAProblem, cam, damping=1e-4,
                 kernel="cauchy", update_landmarks=True):
    """One GN/LM step of windowed BA.  Returns (poses, X, cost)."""
    K = poses_cw.shape[0]
    S, b, Hll_inv, U, bl, cost, _ = _reduced_system(poses_cw, prob, cam,
                                                    kernel)
    S2 = S.reshape(6 * K, 6 * K)
    S2 = S2 + damping * jnp.eye(6 * K, dtype=S2.dtype)
    # gauge fix: pin pose 0 by clearing its rows/cols and setting identity
    g = jnp.arange(6)
    S2 = S2.at[:6, :].set(0.0).at[:, :6].set(0.0)
    S2 = S2.at[g, g].set(1.0)
    b2 = b.reshape(-1).at[:6].set(0.0)
    dxi = jnp.linalg.solve(S2, b2).reshape(K, 6)

    poses_new = _apply_pose_update(poses_cw, dxi)
    if update_landmarks:
        # dX_i = Hll_i^-1 (bl_i - sum_k U_ik^T dxi_k)
        Ud = jnp.einsum("nkij,ki->nj", U, dxi,
                        precision=jax.lax.Precision.HIGHEST)
        dX = jnp.einsum("nij,nj->ni", Hll_inv, bl - Ud,
                        precision=jax.lax.Precision.HIGHEST)
        seen = jnp.any(prob.mask, axis=1)
        X_new = prob.X + jnp.where(seen[:, None], dX, 0.0)
    else:
        X_new = prob.X
    return poses_new, X_new, cost


@functools.partial(jax.jit, static_argnames=("cam", "n_iters", "kernel",
                                             "update_landmarks"))
def ba_solve(poses_cw, prob: BAProblem, cam, n_iters: int = 8,
             damping: float = 1e-4, kernel: str = "cauchy",
             update_landmarks: bool = True):
    """Run n_iters of windowed BA on one device."""
    def body(carry, _):
        poses, X, _ = carry
        p2, X2, cost = ba_iteration(poses, prob._replace(X=X), cam, damping,
                                    kernel, update_landmarks)
        return (p2, X2, cost), cost
    (poses, X, cost), costs = jax.lax.scan(
        body, (poses_cw, prob.X, jnp.inf), None, length=n_iters)
    return poses, X, costs


def make_sharded_ba(mesh, cam, n_iters: int = 8, damping: float = 1e-4,
                    kernel: str = "cauchy"):
    """Distributed windowed BA: landmarks sharded over the data axis.

    Per device: partial (S, b) over its landmark shard; one psum builds the
    global reduced camera system; the [6K, 6K] solve is replicated (cheaper
    than gathering); landmark updates stay local to each shard.
    """
    from jax import shard_map

    def one_iter(poses_cw, X, obs, mask, sigma2):
        prob = BAProblem(X=X, obs=obs, mask=mask, sigma2=sigma2)
        K = poses_cw.shape[0]
        S, b, Hll_inv, U, bl, cost, _ = _reduced_system(poses_cw, prob, cam,
                                                        kernel)
        S = jax.lax.psum(S, DATA_AXIS)
        b = jax.lax.psum(b, DATA_AXIS)
        cost = jax.lax.psum(cost, DATA_AXIS)
        S2 = S.reshape(6 * K, 6 * K) + damping * jnp.eye(6 * K, dtype=S.dtype)
        g = jnp.arange(6)
        S2 = S2.at[:6, :].set(0.0).at[:, :6].set(0.0)
        S2 = S2.at[g, g].set(1.0)
        b2 = b.reshape(-1).at[:6].set(0.0)
        dxi = jnp.linalg.solve(S2, b2).reshape(K, 6)
        poses_new = _apply_pose_update(poses_cw, dxi)
        Ud = jnp.einsum("nkij,ki->nj", U, dxi,
                        precision=jax.lax.Precision.HIGHEST)
        dX = jnp.einsum("nij,nj->ni", Hll_inv, bl - Ud,
                        precision=jax.lax.Precision.HIGHEST)
        seen = jnp.any(mask, axis=1)
        X_new = X + jnp.where(seen[:, None], dX, 0.0)
        return poses_new, X_new, cost

    def solve(poses_cw, X, obs, mask, sigma2):
        def body(carry, _):
            poses, Xc = carry
            p2, X2, cost = one_iter(poses, Xc, obs, mask, sigma2)
            return (p2, X2), cost
        (poses, Xf), costs = jax.lax.scan(body, (poses_cw, X), None,
                                          length=n_iters)
        return poses, Xf, costs

    sharded = shard_map(
        solve, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(), P(DATA_AXIS), P()),
        check_vma=False)
    return jax.jit(sharded)
