"""Property tests for SE(3) kernels vs the closed-form reference formulas
(reference src/auxiliar.cpp:113-197)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from stvo_pl_tpu.ops import se3


def random_twists(rng, n, t_scale=1.0, w_scale=1.0):
    x = rng.standard_normal((n, 6)).astype(np.float32)
    x[:, :3] *= t_scale
    x[:, 3:] *= w_scale
    return jnp.asarray(x)


def test_expmap_matches_scipy(rng):
    x = random_twists(rng, 64)
    T = np.asarray(se3.expmap_se3(x))
    for i in range(x.shape[0]):
        w = np.asarray(x[i, 3:], dtype=np.float64)
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(T[i, :3, :3], R_ref, atol=1e-5)
        np.testing.assert_allclose(T[i, 3], [0, 0, 0, 1], atol=0)


def test_exp_log_roundtrip(rng):
    x = random_twists(rng, 128, t_scale=2.0, w_scale=0.8)
    # |w| can exceed pi, where log returns the equivalent wrapped twist —
    # the invariant is exp(log(T)) == T, and twist equality where |w| < pi
    T = se3.expmap_se3(x)
    x2 = se3.logmap_se3(T)
    T2 = se3.expmap_se3(x2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T),
                               rtol=1e-3, atol=5e-5)
    inside = np.linalg.norm(np.asarray(x)[:, 3:], axis=-1) < np.pi - 0.05
    np.testing.assert_allclose(np.asarray(x2)[inside], np.asarray(x)[inside],
                               rtol=1e-3, atol=2e-4)


def test_exp_log_small_angles(rng):
    x = random_twists(rng, 64, t_scale=0.5, w_scale=1e-6)
    x2 = se3.logmap_se3(se3.expmap_se3(x))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)


def test_log_near_pi(rng):
    # rotations close to pi exercise the sin(theta)->0 fallback
    axes = rng.standard_normal((16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = (axes * (np.pi - 1e-3)).astype(np.float32)
    x = jnp.concatenate([jnp.zeros((16, 3), jnp.float32), jnp.asarray(w)],
                        axis=-1)
    T = se3.expmap_se3(x)
    w2 = np.asarray(se3.logmap_se3(T))[:, 3:]
    # log may return the equivalent negated axis; compare rotations
    for i in range(16):
        R1 = Rotation.from_rotvec(w[i]).as_matrix()
        R2 = Rotation.from_rotvec(np.asarray(w2[i], np.float64)).as_matrix()
        np.testing.assert_allclose(R1, R2, atol=1e-3)


def test_inverse(rng):
    x = random_twists(rng, 32, w_scale=0.5)
    T = se3.expmap_se3(x)
    TT = T @ se3.inverse_se3(T)
    np.testing.assert_allclose(np.asarray(TT),
                               np.broadcast_to(np.eye(4), TT.shape),
                               atol=1e-5)


def test_adjoint_identity(rng):
    # Adj(T) x == log(T exp(x) T^-1) to first order
    xT = random_twists(rng, 8, w_scale=0.5)
    T = se3.expmap_se3(xT)
    eps = 1e-3
    xi = random_twists(rng, 8, t_scale=eps, w_scale=eps)
    lhs = (se3.adjoint_se3(T) @ xi[..., None])[..., 0]
    rhs = se3.logmap_se3(T @ se3.expmap_se3(xi) @ se3.inverse_se3(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=5e-5)


def test_unccomp_composition(rng):
    xT = random_twists(rng, 4, w_scale=0.3)
    T = se3.expmap_se3(xT)
    A = rng.standard_normal((4, 6, 6)).astype(np.float32)
    cov1 = jnp.asarray(A @ np.swapaxes(A, -1, -2))
    B = rng.standard_normal((4, 6, 6)).astype(np.float32)
    covi = jnp.asarray(B @ np.swapaxes(B, -1, -2))
    out = se3.unccomp_se3(T, cov1, covi)
    adj = np.asarray(se3.adjoint_se3(T))
    ref = np.asarray(cov1) + adj @ np.asarray(covi) @ np.swapaxes(adj, -1, -2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-4)


def test_transform_points(rng):
    x = random_twists(rng, 2, w_scale=0.5)
    T = se3.expmap_se3(x)
    P = jnp.asarray(rng.standard_normal((2, 10, 3)).astype(np.float32))
    out = se3.transform_points(T, P)
    ref = np.einsum("bij,bnj->bni", np.asarray(T[:, :3, :3]), np.asarray(P)) \
        + np.asarray(T[:, :3, 3])[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_jit_and_grad():
    x = jnp.array([0.1, -0.2, 0.3, 0.05, -0.02, 0.08], jnp.float32)

    @jax.jit
    def loss(x):
        T = se3.expmap_se3(x)
        return jnp.sum(se3.logmap_se3(T) ** 2)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x),
                               rtol=1e-3, atol=1e-4)
