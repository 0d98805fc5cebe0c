"""Masked robust statistics vs direct (unmasked) numpy implementations of the
reference formulas (src/auxiliar.cpp:387-460, 556-583)."""

import numpy as np
import jax.numpy as jnp

from stvo_pl_tpu.ops import robust


def ref_median(v):
    # reference convention: sorted[n // 2] (src/auxiliar.cpp:399)
    return np.sort(v)[len(v) // 2]


def ref_stdv_mad(v):
    med = ref_median(v)
    return 1.4826 * ref_median(np.abs(v - med))


def ref_mean_stdv_mad(v):
    stdv = ref_stdv_mad(v)
    good = v[v < 2.0 * stdv]
    if len(good) >= int(np.ceil(0.2 * len(v))):
        mean = good.mean() if len(good) else 0.0
    else:
        mean = v.mean()
    return mean, stdv


def test_masked_median_matches_reference(rng):
    for n in [1, 2, 5, 17, 100]:
        v = rng.standard_normal(n).astype(np.float32)
        pad = np.full(16, 1e9, np.float32)
        x = np.concatenate([v, pad])
        mask = np.concatenate([np.ones(n, bool), np.zeros(16, bool)])
        # shuffle to prove mask handling is order-independent
        perm = rng.permutation(len(x))
        got = robust.masked_median(jnp.asarray(x[perm]), jnp.asarray(mask[perm]))
        assert np.isclose(float(got), ref_median(v)), n


def test_masked_stdv_mad(rng):
    v = rng.standard_normal(101).astype(np.float32)
    mask = np.ones(101, bool)
    got = robust.masked_stdv_mad(jnp.asarray(v), jnp.asarray(mask))
    assert np.isclose(float(got), ref_stdv_mad(v), rtol=1e-5)


def test_masked_mean_stdv_mad(rng):
    for n in [5, 33, 200]:
        v = np.abs(rng.standard_normal(n)).astype(np.float32)
        pad = np.zeros(7, np.float32)
        x = np.concatenate([v, pad])
        mask = np.concatenate([np.ones(n, bool), np.zeros(7, bool)])
        mean, stdv = robust.masked_mean_stdv_mad(jnp.asarray(x),
                                                 jnp.asarray(mask))
        ref_mean, ref_stdv = ref_mean_stdv_mad(v)
        assert np.isclose(float(stdv), ref_stdv, rtol=1e-5)
        assert np.isclose(float(mean), ref_mean, rtol=1e-4)


def test_empty_mask():
    x = jnp.zeros(8)
    mask = jnp.zeros(8, bool)
    assert float(robust.masked_median(x, mask)) == 0.0
    assert float(robust.masked_stdv_mad(x, mask)) == 0.0
    m, s = robust.masked_mean_stdv_mad(x, mask)
    assert float(m) == 0.0 and float(s) == 0.0


def test_batched_median(rng):
    x = rng.standard_normal((4, 50)).astype(np.float32)
    mask = np.ones((4, 50), bool)
    mask[1, 25:] = False
    got = np.asarray(robust.masked_median(jnp.asarray(x), jnp.asarray(mask)))
    for b in range(4):
        assert np.isclose(got[b], ref_median(x[b][mask[b]]))


def test_cauchy_weight():
    r = jnp.array([0.0, 1.0, 2.0])
    w = robust.robust_weight(r, "cauchy")
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.5, 0.2])


def test_other_kernels():
    r = jnp.array([0.5, 1.5])
    assert np.allclose(np.asarray(robust.robust_weight(r, "tukey")),
                       [(1 - 0.25) ** 2, 0.0])
    assert np.allclose(np.asarray(robust.robust_weight(r, "huber")),
                       [1.0, 1 / 1.5])
    assert np.allclose(np.asarray(robust.robust_weight(r, "welsch")),
                       np.exp(-np.asarray(r) ** 2))
    assert np.allclose(np.asarray(robust.robust_weight(r, "tstudent")),
                       1.0 / (5.0 + np.asarray(r) ** 2))
