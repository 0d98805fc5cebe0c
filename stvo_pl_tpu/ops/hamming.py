"""Batched Hamming-distance matrices for 256-bit binary descriptors.

The reference computes Hamming distances one pair at a time with a popcount
bit-hack inside nested matching loops (`src/matching.cpp:93-109`) or via
cv::BFMatcher knnMatch (:47-48).  At the reference's feature budgets
(<=2000 points, <=300 lines) the full N x M distance matrix is tiny, so the
TPU-native design computes it densely and lets top-2 / mutual checks become
argmin reductions.

Two device kernels:

  * `hamming_matrix_mxu` — the speed-of-light path: unpack bits to +/-1
    bf16 and use ONE matmul on the MXU:  d(a, b) = (256 - <a_pm, b_pm>) / 2.
    Exact (dot products are integers, accumulated in f32).
  * `hamming_matrix_pallas` — XOR + popcount on the VPU, tiled; used when
    the MXU path is unavailable and as a cross-check.

Plus a plain-XLA fallback (`hamming_matrix_xla`) for interpretability and
CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DESC_WORDS = 8   # 8 x uint32 = 256 bits (reference descriptor width)
DESC_BITS = 32 * DESC_WORDS


def unpack_bits_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[:-1] + (DESC_BITS,))
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        return (2 * bits.astype(jnp.int32) - 1).astype(dtype)
    return (2.0 * bits.astype(jnp.float32) - 1.0).astype(dtype)


def hamming_matrix_mxu(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 Hamming distances via MXU.

    bf16 +/-1 operands, exact f32 accumulation.  (int8 operands with int32
    accumulation compute the same integers but measured slower end-to-end —
    8-bit relayouts outweigh the MXU's 2x int8 MAC rate; BASELINE.md.)"""
    a = unpack_bits_pm1(desc1)
    b = unpack_bits_pm1(desc2)
    dot = jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((DESC_BITS - dot) * 0.5).astype(jnp.int32)


def _popcount_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Bit-parallel popcount on uint32 lanes (same bit-hack family as
    reference src/matching.cpp:101-106)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_matrix_xla(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA XOR+popcount; loops over the 8 words to avoid a [N,M,8]
    intermediate."""
    total = jnp.zeros((desc1.shape[0], desc2.shape[0]), jnp.int32)
    for w in range(DESC_WORDS):
        x = desc1[:, None, w] ^ desc2[None, :, w]
        total = total + _popcount_u32(x)
    return total


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    """Pallas tile kernel: [TN, 8] x [TM, 8] -> [TN, TM]."""
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(DESC_WORDS):
        a = d1_ref[:, w][:, None]
        b = d2_ref[:, w][None, :]
        acc = acc + _popcount_u32(a ^ b)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m"))
def hamming_matrix_pallas(desc1: jnp.ndarray, desc2: jnp.ndarray,
                          tile_n: int = 256, tile_m: int = 256) -> jnp.ndarray:
    """Tiled Pallas XOR+popcount kernel (requires N, M multiples of tile)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = desc1.shape[0], desc2.shape[0]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    assert N % tile_n == 0 and M % tile_m == 0

    grid = (N // tile_n, M // tile_m)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, DESC_WORDS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, DESC_WORDS), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(desc1, desc2)


def hamming_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray,
                   use_mxu: bool = True) -> jnp.ndarray:
    """Default entry point: MXU matmul formulation, else plain XLA."""
    if use_mxu:
        return hamming_matrix_mxu(desc1, desc2)
    return hamming_matrix_xla(desc1, desc2)


# ---------------------------------------------------------------------------
# HAMMING2: distances over 2-bit cells (cv::NORM_HAMMING2), used with
# WTA_K = 3/4 descriptors (cv::ORB semantics at src/stereoFrame.cpp:112-115:
# BFMatcher(NORM_HAMMING2) when orb_wta_k != 2).  The 256-bit descriptor is
# read as 128 2-bit cells; distance = number of cells that differ.
# ---------------------------------------------------------------------------

N_CELLS = DESC_BITS // 2   # 128 two-bit cells


def unpack_cells_onehot(desc: jnp.ndarray,
                        dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 128*4] one-hot encoding of the 2-bit cells.

    With exactly one unit per cell, <a, b> counts agreeing cells, so the
    HAMMING2 distance rides the MXU exactly like the WTA_K=2 path
    (integer-valued dot products, f32 accumulation)."""
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    cells = (desc[..., :, None] >> shifts[None, :]) & jnp.uint32(3)
    cells = cells.reshape(desc.shape[:-1] + (N_CELLS,))
    onehot = (cells[..., None] == jnp.arange(4, dtype=jnp.uint32))
    return onehot.astype(dtype).reshape(desc.shape[:-1] + (N_CELLS * 4,))


def hamming2_matrix_mxu(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] uint32 -> [N, M] int32 HAMMING2 distances via MXU."""
    a = unpack_cells_onehot(desc1)
    b = unpack_cells_onehot(desc2)
    agree = jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (N_CELLS - agree).astype(jnp.int32)


def hamming2_matrix_xla(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """XOR + cell-collapse popcount (a cell differs iff either of its two
    bits differs: y = (x | x>>1) & 0x5555...), same bit-hack family as
    cv::normHamming(..., 2)."""
    total = jnp.zeros((desc1.shape[0], desc2.shape[0]), jnp.int32)
    for w in range(DESC_WORDS):
        x = desc1[:, None, w] ^ desc2[None, :, w]
        y = (x | (x >> 1)) & jnp.uint32(0x55555555)
        total = total + _popcount_u32(y)
    return total


def hamming2_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    use_mxu: bool = True) -> jnp.ndarray:
    if use_mxu:
        return hamming2_matrix_mxu(desc1, desc2)
    return hamming2_matrix_xla(desc1, desc2)


def distance_matrix(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    use_mxu: bool = True, wta_k: int = 2) -> jnp.ndarray:
    """Descriptor distance dispatch: HAMMING for WTA_K=2 bit descriptors,
    HAMMING2 for WTA_K=3/4 2-bit-cell descriptors (cv::BFMatcher norm
    selection, src/stereoFrame.cpp:112-115)."""
    if wta_k == 2:
        return hamming_matrix(desc1, desc2, use_mxu)
    return hamming2_matrix(desc1, desc2, use_mxu)
