"""TP-like feature sharding: brute-force descriptor matching with the
distance matrix sharded over the mesh's `model` axis.

SURVEY.md §2.4 maps the reference's (nonexistent) tensor parallelism to
"shard feature sets / distance matrices over chips for very large N": the
Hamming distance matrix is a matmul-shaped op (ops/hamming.py), so the
natural TP decomposition splits the TRAIN set's columns across devices.
Each device computes a [N1, M/P] block, its local top-2 and per-column
argmin; one small all_gather merges the per-shard results into the global
nearest-neighbor-ratio + mutual-consistency decision — identical (bit for
bit, including argmin tie-breaking toward the first column) to the dense
single-device `ops/matching.nnr_mutual_match` on the full matrix.

Reference semantics being distributed: `match`/`matchNNR`
(/root/reference/src/matching.cpp:41-91) — best < nnr * second, and
matches_21[best] == row for the mutual check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stvo_pl_tpu.ops import hamming
from stvo_pl_tpu.ops.matching import BIG, MatchResult
from stvo_pl_tpu.parallel.mesh import MODEL_AXIS

from jax import shard_map


def _merge_shards(d, p, n_shards, axis, nnr, mutual):
    """Merge per-shard top-2/argmin partials into the global NNR + mutual
    decision.  d: [N, m] local masked distance block (BIG where not a
    candidate); p: this shard's index along `axis`.  Returns replicated
    (idx, ok) bit-identical to the dense `nnr_mutual_match` on the full
    matrix (incl. argmin tie-breaking toward the first column: global
    column order is shard-major, and the first-shard-wins pstar argmin
    preserves it)."""
    m = d.shape[1]
    big = jnp.asarray(BIG, d.dtype)
    bi = jnp.argmin(d, axis=1).astype(jnp.int32)        # local col
    b = jnp.min(d, axis=1)
    cols = jnp.arange(m, dtype=jnp.int32)
    s = jnp.min(jnp.where(cols[None, :] == bi[:, None], big, d), axis=1)
    gi = bi + p * m                                      # global col

    # per-column best row (for the mutual check); columns with no valid
    # entry produce arbitrary rows that are never consulted — a row's
    # best column always has at least that row's own valid entry
    colbest = jnp.argmin(d, axis=0).astype(jnp.int32)    # [m]

    # merge across shards (replicated small tensors)
    B = jax.lax.all_gather(b, axis)                      # [P, N]
    GI = jax.lax.all_gather(gi, axis)                    # [P, N]
    S = jax.lax.all_gather(s, axis)                      # [P, N]
    CB = jax.lax.all_gather(colbest, axis).reshape(-1)   # [M]

    pstar = jnp.argmin(B, axis=0)                        # first shard wins
    n = jnp.arange(B.shape[1])
    best = B[pstar, n]
    idx = GI[pstar, n]
    # global second best: best of (other shards' minima, own second)
    pidx = jnp.arange(n_shards)
    others = jnp.where(pidx[:, None] == pstar[None, :], big, B)
    second = jnp.minimum(jnp.min(others, axis=0), S[pstar, n])

    ok = (best < big) & (best.astype(jnp.float32)
                         < second.astype(jnp.float32) * nnr)
    if mutual:
        rows = jnp.arange(d.shape[0], dtype=jnp.int32)
        ok = ok & (CB[idx] == rows)
    return jnp.where(ok, idx, -1), ok


def tp_match_inner(desc1: jnp.ndarray, desc2: jnp.ndarray,
                   cand: jnp.ndarray, nnr: float, axis: str,
                   n_shards: int, mutual: bool = True, wta_k: int = 2,
                   use_mxu: bool = True) -> MatchResult:
    """Column-sharded matching INSIDE an enclosing shard_map over `axis`.

    This is the composable form the production matchers auto-switch to
    (models/frame.py, models/frontend.py): desc1/desc2/cand arrive
    replicated (the front end computes features identically on every
    model-axis device); each device computes the distance block for its
    own M/n_shards train columns — the O(N*M) work that actually pays to
    split — and one small all_gather merges.  Bit-identical to
    `nnr_mutual_match(distance_matrix(desc1, desc2, wta_k), cand, nnr)`.
    """
    M = desc2.shape[0]
    assert M % n_shards == 0, (M, n_shards)
    m = M // n_shards
    p = jax.lax.axis_index(axis)
    d2s = jax.lax.dynamic_slice_in_dim(desc2, p * m, m, 0)
    cs = jax.lax.dynamic_slice_in_dim(cand, p * m, m, 1)
    dist = hamming.distance_matrix(desc1, d2s, use_mxu, wta_k=wta_k)
    big = jnp.asarray(BIG, dist.dtype)
    d = jnp.where(cs, dist, big)
    idx, ok = _merge_shards(d, p, n_shards, axis, nnr, mutual)
    return MatchResult(idx=idx, valid=ok)


def tp_match(desc1: jnp.ndarray, valid1: jnp.ndarray,
             desc2: jnp.ndarray, valid2: jnp.ndarray,
             nnr: float, mesh, mutual: bool = True,
             axis: str = MODEL_AXIS) -> MatchResult:
    """Sharded brute-force kNN+NNR+mutual matching (standalone wrapper).

    desc1 [N,8] uint32 (replicated), desc2 [M,8] uint32 (sharded on the
    mesh `axis`; M must be a multiple of the axis size).  Returns a
    replicated MatchResult equal to
    `nnr_mutual_match(hamming_matrix(desc1, desc2), valid1 x valid2, nnr)`.
    """
    Pax = mesh.shape[axis]
    M = desc2.shape[0]
    assert M % Pax == 0, f"train set {M} not divisible by axis size {Pax}"

    def local(d1, v1, d2s, v2s):
        p = jax.lax.axis_index(axis)
        dist = hamming.hamming_matrix(d1, d2s)          # [N, m]
        big = jnp.asarray(BIG, dist.dtype)
        d = jnp.where(v1[:, None] & v2s[None, :], dist, big)
        return _merge_shards(d, p, Pax, axis, nnr, mutual)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    idx, ok = fn(desc1, valid1, desc2, valid2)
    return MatchResult(idx=idx, valid=ok)
