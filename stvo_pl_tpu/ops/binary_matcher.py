"""Binary-descriptor matcher: match / knn_match / radius_match over 256-bit
descriptors, plus a multi-image descriptor index.

Reference equivalent: the vendored `BinaryDescriptorMatcher` / `Mihasher`
(3rdparty/line_descriptor/src/binary_descriptor_matcher.cpp — `match` :127
and :197, `knnMatch` :258 and :339, `radiusMatch` :428 and :508, with the
multi-index-hashing backend `Mihasher::batchquery` :596 and the dataset
accumulation `add`/`train`/image-index bookkeeping).  StVO itself never uses
it (it matches through BFMatcher / `distance()`, src/matching.cpp:47,93) —
this module exists for capability parity with the vendored library.

TPU-native redesign: multi-index hashing exists to dodge O(Q*N) Hamming
comparisons on CPUs.  On TPU the full distance matrix IS the fast path — a
+-1-valued bf16 matmul on the MXU (ops/hamming.py) computes all Q*N 256-bit
distances exactly, and top-k / threshold reductions replace bucket probing.
At the budgets this library serves (hundreds to tens of thousands of line
descriptors) the dense matrix is orders of magnitude below MXU capacity, so
hash tables would only add scalar-unit work and dynamic shapes.

All shapes are static: queries/datasets are fixed-capacity with validity
masks, `k`/`max_results` are static ints, and unmatched slots return
idx = -1 / dist = 256 + 1 sentinel (one past the max possible distance).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops import hamming

INVALID_DIST = jnp.int32(257)   # > max Hamming distance of 256-bit strings


class DescriptorIndex(NamedTuple):
    """Accumulated descriptor dataset (the reference's `add`+`train` state:
    binary_descriptor_matcher.cpp dataset/`nextAddedIndex`/`numImages`)."""
    desc: jnp.ndarray       # [N, 8] uint32/int32 packed 256-bit descriptors
    image_id: jnp.ndarray   # [N] int32 source-image index per descriptor
    local_id: jnp.ndarray   # [N] int32 row within its source image
    valid: jnp.ndarray      # [N] bool


def build_index(descs: Sequence[jnp.ndarray],
                valids: Sequence[jnp.ndarray] | None = None,
                capacity: int | None = None) -> DescriptorIndex:
    """Concatenate per-image descriptor sets into one queryable index.

    Equivalent to reference `add` + `train` (which builds the Mihasher over
    the accumulated dataset); here "training" is just concatenation because
    the dense matmul needs no acceleration structure.
    """
    descs = [jnp.asarray(d) for d in descs]
    n_total = sum(d.shape[0] for d in descs)
    cap = capacity or n_total
    if cap < n_total:
        raise ValueError(f"capacity {cap} < total descriptors {n_total}")
    words = descs[0].shape[-1] if descs else 8
    dtype = descs[0].dtype if descs else jnp.uint32

    desc = jnp.zeros((cap, words), dtype)
    image_id = jnp.full((cap,), -1, jnp.int32)
    local_id = jnp.full((cap,), -1, jnp.int32)
    valid = jnp.zeros((cap,), bool)
    off = 0
    for i, d in enumerate(descs):
        n = d.shape[0]
        v = (jnp.ones((n,), bool) if valids is None
             else jnp.asarray(valids[i], bool))
        desc = jax.lax.dynamic_update_slice(desc, d.astype(dtype), (off, 0))
        image_id = jax.lax.dynamic_update_slice(
            image_id, jnp.full((n,), i, jnp.int32), (off,))
        local_id = jax.lax.dynamic_update_slice(
            local_id, jnp.arange(n, dtype=jnp.int32), (off,))
        valid = jax.lax.dynamic_update_slice(valid, v, (off,))
        off += n
    return DescriptorIndex(desc, image_id, local_id, valid)


def _masked_dist(query, q_valid, index: DescriptorIndex, use_mxu=True):
    dist = hamming.hamming_matrix(
        query.view(jnp.int32) if query.dtype == jnp.uint32 else query,
        index.desc.view(jnp.int32) if index.desc.dtype == jnp.uint32
        else index.desc, use_mxu).astype(jnp.int32)
    cand = index.valid[None, :]
    if q_valid is not None:
        cand = cand & jnp.asarray(q_valid, bool)[:, None]
    return jnp.where(cand, dist, INVALID_DIST)


class KnnMatches(NamedTuple):
    idx: jnp.ndarray       # [Q, k] int32 into the index, -1 = no match
    dist: jnp.ndarray      # [Q, k] int32 Hamming distance (257 = invalid)
    image_id: jnp.ndarray  # [Q, k] int32 source image of each match
    local_id: jnp.ndarray  # [Q, k] int32 row within the source image


@functools.partial(jax.jit, static_argnames=("k", "use_mxu"))
def knn_match(query: jnp.ndarray, index: DescriptorIndex, k: int,
              q_valid: jnp.ndarray | None = None,
              use_mxu: bool = True) -> KnnMatches:
    """k nearest descriptors per query (reference `knnMatch`,
    binary_descriptor_matcher.cpp:258,339), exact distances."""
    dist = _masked_dist(query, q_valid, index, use_mxu)
    neg, pos = jax.lax.top_k(-dist, k)
    d = -neg
    ok = d < INVALID_DIST
    return KnnMatches(
        idx=jnp.where(ok, pos, -1),
        dist=d,
        image_id=jnp.where(ok, index.image_id[pos], -1),
        local_id=jnp.where(ok, index.local_id[pos], -1))


@functools.partial(jax.jit, static_argnames=("use_mxu",))
def match(query: jnp.ndarray, index: DescriptorIndex,
          q_valid: jnp.ndarray | None = None,
          use_mxu: bool = True) -> KnnMatches:
    """Best match per query (reference `match`,
    binary_descriptor_matcher.cpp:127,197)."""
    return knn_match(query, index, 1, q_valid, use_mxu)


@functools.partial(jax.jit, static_argnames=("max_distance", "max_results",
                                             "use_mxu"))
def radius_match(query: jnp.ndarray, index: DescriptorIndex,
                 max_distance: int, max_results: int,
                 q_valid: jnp.ndarray | None = None,
                 use_mxu: bool = True) -> KnnMatches:
    """All matches within a Hamming radius (reference `radiusMatch`,
    binary_descriptor_matcher.cpp:428,508), as a fixed-capacity
    closest-first list of `max_results` per query (static shapes replace
    the reference's variable-length vectors; slots beyond the in-radius
    count are idx = -1)."""
    res = knn_match(query, index, max_results, q_valid, use_mxu)
    ok = res.dist <= max_distance
    return KnnMatches(
        idx=jnp.where(ok, res.idx, -1),
        dist=jnp.where(ok, res.dist, INVALID_DIST),
        image_id=jnp.where(ok, res.image_id, -1),
        local_id=jnp.where(ok, res.local_id, -1))
