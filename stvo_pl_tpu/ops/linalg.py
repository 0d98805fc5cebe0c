"""Small-matrix linear algebra for the 6-DoF normal equations.

The reference solves H dx = g with ColPivHouseholderQR and inspects
log|det| for failure (src/stereoFrameHandler.cpp:417-418, :453-459), and
eigendecomposes the 6x6 covariance (:294-295, :379-380).  On TPU a 6x6
factorization is register-resident; we use Cholesky with a tiny adaptive
jitter (H is PSD by construction, J^T W J) and fall back to reporting
non-success the same way the reference treats a failed QR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve6(H: jnp.ndarray, g: jnp.ndarray):
    """Solve H x = g for 6x6 SPD H (batched).

    Returns (x, ok) where ok mirrors the reference's QR success +
    logAbsDeterminant() >= 0 gate (src/stereoFrameHandler.cpp:455-459):
    the step is flagged bad when H is ill-conditioned / non-finite.
    """
    L, ok_chol = _cholesky6(H)
    x = _cho_solve(L, g)
    # log|det H| = 2 sum log diag(L); reference gates logAbsDeterminant < 0
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, 1e-300)), axis=-1)
    ok = ok_chol & jnp.isfinite(logdet) & (logdet >= 0.0) \
        & jnp.all(jnp.isfinite(x), axis=-1)
    x = jnp.where(ok[..., None], x, jnp.zeros_like(x))
    return x, ok


def _cholesky6(H: jnp.ndarray):
    """Cholesky with a small relative jitter; ok=False when pivots fail."""
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(H, axis1=-2, axis2=-1)),
                                axis=-1), 1e-30)
    jitter = (1e-10 * scale)[..., None] * jnp.eye(6, dtype=H.dtype)
    L = jnp.linalg.cholesky(H + jitter)
    ok = jnp.all(jnp.isfinite(L.reshape(L.shape[:-2] + (-1,))), axis=-1)
    L = jnp.where(ok[..., None, None], L, jnp.eye(6, dtype=H.dtype))
    return L, ok


def _cho_solve(L: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    y = jax.scipy.linalg.solve_triangular(L, g[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)
    return x[..., 0]


def inv6(H: jnp.ndarray) -> jnp.ndarray:
    """H^{-1} for the covariance (DT_cov = H.inverse(),
    src/stereoFrameHandler.cpp:429).  NaN-safe: returns zeros on failure."""
    L, ok = _cholesky6(H)
    I = jnp.broadcast_to(jnp.eye(6, dtype=H.dtype), H.shape)
    y = jax.scipy.linalg.solve_triangular(L, I, lower=True)
    Hinv = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)
    return jnp.where(ok[..., None, None], Hinv, jnp.zeros_like(Hinv))


def eigvalsh6(M: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues of a symmetric 6x6 (batched), for the
    isGoodSolution gate and DT_cov_eig (src/stereoFrameHandler.cpp:294,380)."""
    return jnp.linalg.eigvalsh(M)


def logdet6(M: jnp.ndarray) -> jnp.ndarray:
    """log(det(M)) for the keyframe entropy score
    (src/stereoFrameHandler.cpp:1144,1165). Returns -inf for det <= 0."""
    sign, logabs = jnp.linalg.slogdet(M)
    return jnp.where(sign > 0, logabs, -jnp.inf)
