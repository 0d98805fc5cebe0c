"""SE(3) Lie-group kernels.

Capability parity with the reference's Eigen-based helpers
(`src/auxiliar.cpp:29-197`: skew, expmap_se3, logmap_se3, inverse_se3,
adjoint_se3, uncTinv_se3, unccomp_se3), redesigned for XLA:

  * broadcast-native — every function maps over arbitrary leading batch
    dimensions, so `vmap`/`scan` over frames and sequences is free;
  * branch-free — the reference switches on `theta < 1e-6`
    (src/auxiliar.cpp:131, :162); here the small-angle limits are handled
    with Taylor-series blends under `jnp.where`, which is both compilable
    and smoother for AD;
  * twist convention matches the reference: xi = [t(3), w(3)] with
    translation first (expmap_se3 at src/auxiliar.cpp:124-141).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix (src/auxiliar.cpp:29-44)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def _sinc_coeffs(theta: jnp.ndarray):
    """A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3, Taylor-safe."""
    t2 = theta * theta
    small = theta < 1e-4
    # guard the denominators; the Taylor branch is used when small
    ts = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(ts) / ts)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(ts)) / (ts * ts))
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (ts - jnp.sin(ts)) / (ts * ts * ts))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] rotation vector -> [..., 3, 3] rotation matrix."""
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, _ = _sinc_coeffs(theta)
    W = skew(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def expmap_se3(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] twist [t, w] -> [..., 4, 4] transform (src/auxiliar.cpp:124-141)."""
    t, w = x[..., :3], x[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, C = _sinc_coeffs(theta)
    W = skew(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    Vt = (V @ t[..., None])[..., 0]
    top = jnp.concatenate([R, Vt[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] rotation vector (src/auxiliar.cpp:208-229).

    Like the reference we clamp the cosine; additionally the theta ~ pi case
    (where (R - R^T) vanishes) falls back to the diagonal formula so the log
    stays finite over the whole group.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 0.0, 1.0))

    # generic branch: w = theta * (R - R^T)^vee / (2 sin(theta))
    a = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    small = theta < 1e-6
    near_pi = sin < 1e-6
    generic_scale = theta / jnp.where(near_pi | small, 1.0, 2.0 * sin)
    w_generic = generic_scale[..., None] * a

    # theta ~ pi: |w_i| from diagonal, signs from off-diagonals
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos[..., None]) / (1.0 - cos[..., None] + 1e-12),
                       0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs using the symmetric part: sign(axis_i * axis_j) = sign(R_ij + R_ji)
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    # choose the dominant component positive, infer others from products
    s0 = jnp.sign(jnp.where(axis[..., 0] > 0.5, 1.0, sx))
    s1 = jnp.sign(R[..., 0, 1] + R[..., 1, 0]) * s0
    s1 = jnp.where(s1 == 0, 1.0, s1)
    s2 = jnp.sign(R[..., 0, 2] + R[..., 2, 0]) * s0
    s2 = jnp.where(s2 == 0, 1.0, s2)
    w_pi = theta[..., None] * axis * jnp.stack([s0, s1, s2], axis=-1)

    w = jnp.where(small[..., None], 0.5 * a,
                  jnp.where(near_pi[..., None], w_pi, w_generic))
    return w


def logmap_se3(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6] twist [t, w] (src/auxiliar.cpp:143-173)."""
    R = T[..., :3, :3]
    p = T[..., :3, 3]
    w = so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1)
    W = skew(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2 - (1+cos)/(2 theta sin)) W^2
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    small = theta < 1e-4
    ts = jnp.where(small, jnp.ones_like(theta), theta)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        1.0 / (ts * ts) - (1.0 + cos) / (2.0 * ts * sin + 1e-30),
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * W2
    t = (Vinv @ p[..., None])[..., 0]
    return jnp.concatenate([t, w], axis=-1)


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] rigid inverse (src/auxiliar.cpp:113-122)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    tinv = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, tinv[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> [..., 6, 6] adjoint (src/auxiliar.cpp:175-182)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = skew(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def uncTinv_se3(T: jnp.ndarray, covT: jnp.ndarray) -> jnp.ndarray:
    """Covariance of T^{-1}: Adj(T^{-1}) covT Adj(T^{-1})^T
    (src/auxiliar.cpp:184-190)."""
    adj = adjoint_se3(inverse_se3(T))
    return adj @ covT @ jnp.swapaxes(adj, -1, -2)


def unccomp_se3(T1: jnp.ndarray, covT1: jnp.ndarray,
                covTinc: jnp.ndarray) -> jnp.ndarray:
    """Covariance composition for T2 = T1 * inv(Tinc)
    (src/auxiliar.cpp:192-197)."""
    adj = adjoint_se3(T1)
    return covT1 + adj @ covTinc @ jnp.swapaxes(adj, -1, -2)


def transform_points(T: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to points [..., N, 3] -> [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return P @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def renormalize_se3(T: jnp.ndarray) -> jnp.ndarray:
    """expmap(logmap(T)): project back onto SE(3) to kill drift, as the
    reference does when committing poses (src/stereoFrameHandler.cpp:374-377)."""
    return expmap_se3(logmap_se3(T))


def is_finite_mat(M: jnp.ndarray) -> jnp.ndarray:
    """All-finite predicate per batch element (src/auxiliar.cpp:353-355)."""
    flat = M.reshape(M.shape[:-2] + (-1,)) if M.ndim >= 2 else M
    return jnp.all(jnp.isfinite(flat), axis=-1)
