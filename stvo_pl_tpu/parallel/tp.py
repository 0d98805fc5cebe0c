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


def tp_match(desc1: jnp.ndarray, valid1: jnp.ndarray,
             desc2: jnp.ndarray, valid2: jnp.ndarray,
             nnr: float, mesh, mutual: bool = True,
             axis: str = MODEL_AXIS) -> MatchResult:
    """Sharded brute-force kNN+NNR+mutual matching.

    desc1 [N,8] uint32 (replicated), desc2 [M,8] uint32 (sharded on the
    mesh `axis`; M must be a multiple of the axis size).  Returns a
    replicated MatchResult equal to
    `nnr_mutual_match(hamming_matrix(desc1, desc2), valid1 x valid2, nnr)`.
    """
    Pax = mesh.shape[axis]
    M = desc2.shape[0]
    assert M % Pax == 0, f"train set {M} not divisible by axis size {Pax}"
    m = M // Pax

    def local(d1, v1, d2s, v2s):
        p = jax.lax.axis_index(axis)
        dist = hamming.hamming_matrix(d1, d2s)          # [N, m]
        big = jnp.asarray(BIG, dist.dtype)
        d = jnp.where(v1[:, None] & v2s[None, :], dist, big)

        bi = jnp.argmin(d, axis=1).astype(jnp.int32)    # local col
        b = jnp.min(d, axis=1)
        cols = jnp.arange(m, dtype=jnp.int32)
        s = jnp.min(jnp.where(cols[None, :] == bi[:, None], big, d), axis=1)
        gi = bi + p * m                                  # global col

        # per-column best row (for the mutual check); columns with no valid
        # entry produce arbitrary rows that are never consulted — a row's
        # best column always has at least that row's own valid entry
        colbest = jnp.argmin(d, axis=0).astype(jnp.int32)   # [m]

        # merge across shards (replicated small tensors)
        B = jax.lax.all_gather(b, axis)                  # [P, N]
        GI = jax.lax.all_gather(gi, axis)                # [P, N]
        S = jax.lax.all_gather(s, axis)                  # [P, N]
        CB = jax.lax.all_gather(colbest, axis).reshape(M)  # [M]

        pstar = jnp.argmin(B, axis=0)                    # first shard wins
        n = jnp.arange(B.shape[1])
        best = B[pstar, n]
        idx = GI[pstar, n]
        # global second best: best of (other shards' minima, own second)
        pidx = jnp.arange(Pax)
        others = jnp.where(pidx[:, None] == pstar[None, :], big, B)
        second = jnp.minimum(jnp.min(others, axis=0), S[pstar, n])

        ok = (best < big) & (best.astype(jnp.float32)
                             < second.astype(jnp.float32) * nnr)
        if mutual:
            rows = jnp.arange(d.shape[0], dtype=jnp.int32)
            ok = ok & (CB[idx] == rows)
        return jnp.where(ok, idx, -1), ok

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    idx, ok = fn(desc1, valid1, desc2, valid2)
    return MatchResult(idx=idx, valid=ok)
