"""Masked robust statistics and M-estimator weights.

The reference computes MAD-based robust scale over std::vector<double> of
residuals (`src/auxiliar.cpp:387-552`) and the Cauchy weight
(`src/auxiliar.cpp:556-583`).  Here feature sets are fixed-capacity arrays
with validity masks, so every statistic is a *masked* reduction with static
shapes: invalid lanes are pushed to +inf before a sort and the median index
is computed from the dynamic count.  Sorting ~2k lanes is a single XLA sort —
far cheaper than emulating data-dependent compaction.

Median-index convention matches the reference exactly: `sorted[n / 2]`
(integer division, src/auxiliar.cpp:399,437) — i.e. the upper median.
"""

from __future__ import annotations

import jax.numpy as jnp

MAD_SCALE = 1.4826  # consistent MAD->stdev factor (src/auxiliar.cpp:403)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over valid lanes, reference convention sorted[n//2].

    x, mask: [..., N].  Returns [...]. Zero valid lanes -> 0.
    """
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n = jnp.sum(mask, axis=-1)
    idx = jnp.clip(n // 2, 0, x.shape[-1] - 1)
    med = jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def masked_stdv_mad(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """1.4826 * median(|x - median(x)|) over valid lanes
    (vector_stdv_mad, src/auxiliar.cpp:444-460)."""
    med = masked_median(x, mask)
    dev = jnp.abs(x - med[..., None])
    mad = masked_median(dev, mask)
    return MAD_SCALE * mad


def masked_mean_stdv_mad(x: jnp.ndarray, mask: jnp.ndarray):
    """(mean, stdv) with MAD scale and trimmed mean
    (vector_mean_stdv_mad, src/auxiliar.cpp:387-430).

    stdv = 1.4826 * MAD; mean = mean of lanes with value < 2*stdv, falling
    back to the plain mean when fewer than 20% of lanes qualify.
    """
    stdv = masked_stdv_mad(x, mask)
    n = jnp.sum(mask, axis=-1)
    good = mask & (x < 2.0 * stdv[..., None])
    k = jnp.sum(good, axis=-1)
    sum_good = jnp.sum(jnp.where(good, x, 0.0), axis=-1)
    sum_all = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    use_trimmed = k >= jnp.ceil(0.2 * n).astype(k.dtype)
    denom_g = jnp.maximum(k, 1).astype(x.dtype)
    denom_a = jnp.maximum(n, 1).astype(x.dtype)
    mean = jnp.where(use_trimmed, sum_good / denom_g, sum_all / denom_a)
    mean = jnp.where(n > 0, mean, jnp.zeros_like(mean))
    return mean, stdv


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask, axis=-1)
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    return jnp.where(n > 0, s / jnp.maximum(n, 1).astype(x.dtype), 0.0)


def robust_weight(norm_res: jnp.ndarray, kernel: str = "cauchy") -> jnp.ndarray:
    """M-estimator weight w(r) for a normalized residual.

    "cauchy" is the reference's active kernel (src/auxiliar.cpp:556-559);
    the others are its commented variants (:560-582), exposed as options.
    """
    r2 = norm_res * norm_res
    if kernel == "cauchy":
        return 1.0 / (1.0 + r2)
    if kernel == "parabola":  # smooth truncated parabola
        return jnp.where(norm_res <= 1.0, 1.0 - r2, 0.0)
    if kernel == "tukey":
        return jnp.where(norm_res <= 1.0, (1.0 - r2) ** 2, 0.0)
    if kernel == "huber":
        return jnp.where(norm_res <= 1.0, 1.0,
                         1.0 / jnp.maximum(norm_res, 1e-12))
    if kernel == "welsch":
        return jnp.exp(-r2)
    if kernel == "tstudent":
        # Student-t M-estimator weight ∝ (nu+1)/(nu+r^2), nu=5 — the
        # t-distribution weighting of the ICRA'16 PL-StVO paper's
        # probabilistic formulation (the C++ code ships Cauchy instead).
        # The constant factor cancels in the GN normal equations; it is
        # chosen as 1/(nu+r^2) so the weighted error w*r^2 stays < 1 and
        # the reference's err∈[0,1] health gate (isGoodSolution, :292-305)
        # keeps its calibration (Cauchy has the same bounded-loss property).
        nu = 5.0
        return 1.0 / (nu + r2)
    raise ValueError(f"unknown robust kernel: {kernel}")
