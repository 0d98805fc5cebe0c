"""Pallas TPU kernel: batched patch extraction from VMEM-resident images.

Replaces the vmapped-dynamic_slice patch gather of the ORB descriptor stage
(ops/orb.py gather_patches).  XLA lowers that vmap to a sequential
while-loop of per-patch HBM DMAs (~2.7 us/patch measured in the composed
front end — the dominant cost of the whole pipeline).  Here each image is
staged into VMEM ONCE and every patch read is an on-chip dynamic slice
(~0.13 us/patch), with the image axis as a grid dimension.

A custom_vmap rule flattens any outer vmap (sequence batch, L/R eye axis)
into the kernel's native image axis, so arbitrary vmap nesting keeps
hitting ONE kernel launch instead of an XLA loop of launches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pallas_extract(img: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                    patch, chunk: int) -> jnp.ndarray:
    """[N, H, W] + [N, K] clipped top-left corners -> [N, K, PY, PX].

    `patch` is an int (square) or a (PY, PX) pair — rectangular blocks let
    row-structured consumers (LBD/LSD tap sampling) pull one wide row chunk
    per site instead of many scattered scalar gathers."""
    N, H, W = img.shape
    K = y0.shape[-1]
    Kp = _round_up(K, chunk)
    if Kp != K:
        pad = ((0, 0), (0, Kp - K))
        y0 = jnp.pad(y0, pad)
        x0 = jnp.pad(x0, pad)
    PY, PX = (patch, patch) if isinstance(patch, int) else patch
    # aligned superset reads: sublane offsets must be 8-aligned, lane
    # offsets 128-aligned for VMEM vector loads — load the aligned corner
    # block and rotate the remainder into place
    # block must cover rows [ya, ya+7+PY) for the 8-way sublane switch and
    # lanes [xa, xa+127+PX) for the lane roll
    BY = _round_up(PY + 7, 8)
    BX = _round_up(PX + 127, 128)
    Hp = max(_round_up(H, 8), (H - PY) // 8 * 8 + BY)
    Wp = max(_round_up(W, 128), (W - PX) // 128 * 128 + BX)
    img_p = jnp.pad(img, ((0, 0), (0, Hp - H), (0, Wp - W)))
    y0 = y0.astype(jnp.int32).reshape(-1)   # [N*Kp]
    x0 = x0.astype(jnp.int32).reshape(-1)

    def kernel(y_ref, x_ref, img_ref, out_ref):
        n = pl.program_id(0)
        c = pl.program_id(1)
        base = n * Kp + c * chunk
        for i in range(chunk):
            y = y_ref[base + i]
            x = x_ref[base + i]
            ya = (y // 8) * 8
            xa = (x // 128) * 128
            block = img_ref[0, pl.ds(ya, BY), pl.ds(xa, BX)]
            block = pltpu.roll(block, -(x - xa), axis=1)
            if PY == 1:
                # single-row chunks: branch-free sublane select (an 8-way
                # switch here costs ~100s of scalar cycles per chunk); the
                # i32 round-trip is free and dodges Mosaic's missing
                # unsigned reductions — exactly one row is nonzero, so the
                # sum is a bit-exact pass-through
                b = block[:, :PX]
                if b.dtype == jnp.uint32:
                    b = jax.lax.bitcast_convert_type(b, jnp.int32)
                rows = jax.lax.broadcasted_iota(jnp.int32, (BY, PX), 0)
                picked = jnp.where(rows == (y - ya), b, 0)
                row = jnp.sum(picked, axis=0)
                if out_ref.dtype == jnp.uint32:
                    row = jax.lax.bitcast_convert_type(row, jnp.uint32)
                out_ref[0, i, 0, :] = row
            else:
                # dynamic sublane roll after a dynamic slice miscompiles on
                # this toolchain; an 8-way switch over static slices works
                block = jax.lax.switch(y - ya, [
                    (lambda b=block, d=d: b[d:d + PY, :PX]) for d in range(8)])
                out_ref[0, i, :, :] = block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, Kp // chunk),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp), lambda n, c, y, x: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, PY, PX),
                               lambda n, c, y, x: (n, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Kp, PY, PX), img.dtype),
        grid_spec=grid_spec,
    )(y0, x0, img_p)
    return out[:, :K]


@functools.lru_cache(maxsize=None)
def _batched_extractor(patch, chunk: int):
    """custom_vmap wrapper: outer vmaps fold into the kernel's image axis."""

    @jax.custom_batching.custom_vmap
    def f(img, y0, x0):                      # [N, H, W], [N, K], [N, K]
        return _pallas_extract(img, y0, x0, patch, chunk)

    @f.def_vmap
    def _rule(axis_size, in_batched, img, y0, x0):
        ib_img, ib_y, ib_x = in_batched
        if not ib_img:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        if not ib_y:
            y0 = jnp.broadcast_to(y0[None], (axis_size,) + y0.shape)
        if not ib_x:
            x0 = jnp.broadcast_to(x0[None], (axis_size,) + x0.shape)
        # recurse through f so further outer vmaps keep flattening
        out = f(img.reshape((-1,) + img.shape[2:]),
                y0.reshape(-1, y0.shape[-1]),
                x0.reshape(-1, x0.shape[-1]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def extract_patches_batched(img: jnp.ndarray, y0: jnp.ndarray,
                            x0: jnp.ndarray, patch=33,
                            chunk: int = 8) -> jnp.ndarray:
    """[N, H, W] images + [N, K] clipped top-left corners -> [N, K, PY, PX].

    `patch` is an int (square) or a (PY, PX) pair."""
    return _batched_extractor(patch, chunk)(img, y0, x0)


def extract_patches(img: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                    patch: int = 33, chunk: int = 8) -> jnp.ndarray:
    """[H, W] single-image variant (vmap folds into the kernel)."""
    return _batched_extractor(patch, chunk)(img[None], y0[None],
                                            x0[None])[0]
