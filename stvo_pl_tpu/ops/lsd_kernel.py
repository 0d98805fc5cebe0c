"""Pallas TPU kernel: aligned-run scoring for the dense LSD detector.

ops/lsd.py finds maximal runs of direction-aligned pixels by pointer
doubling over statically shifted mask copies.  Through XLA that is ~15
full-image HBM round trips per direction x 12-16 directions (measured
~14.6 ms for 8 KITTI-sized images).  This kernel stages the aligned mask
for one direction in VMEM ONCE and performs every shift (thicken, dilate,
gap-close, 8 doubling rounds, run-start detection) on-chip, writing back
only a packed i32 map:

    packed[p] = hops(p) * 64 + (63 - tile_local_idx(p))   at run starts
                0                                         otherwise

so that a plain 8x8 reduce_window max outside the kernel recovers both the
per-tile best run AND its argmax position in one pooling pass (no
reshape-transpose relayouts, which cost more than the detection itself).
Shifts are wraparound rolls (pltpu.roll) followed by a one-sided iota mask
that zeroes the wrapped band — the pad region is already zero so only the
wrapped side needs masking.

A custom_vmap rule flattens outer vmaps (sequence batch, L/R eye) into the
kernel's native image axis, mirroring ops/patches.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(dx: int, dy: int, H: int, W: int, Hp: int, Wp: int,
                 max_doublings: int):

    def shift(x, sy, sx, iota_y, iota_x):
        """r[p] = x[p + (sy, sx)], zero-filled; static offsets."""
        if abs(sy) >= Hp or abs(sx) >= Wp:
            return jnp.zeros_like(x)
        r = x
        if sy:
            r = pltpu.roll(r, (-sy) % Hp, axis=0)   # roll shift must be >= 0
            r = jnp.where(iota_y < Hp - sy, r, 0) if sy > 0 else \
                jnp.where(iota_y >= -sy, r, 0)
        if sx:
            r = pltpu.roll(r, (-sx) % Wp, axis=1)
            r = jnp.where(iota_x < Wp - sx, r, 0) if sx > 0 else \
                jnp.where(iota_x >= -sx, r, 0)
        return r

    def kernel(al_ref, out_ref):
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
        sh = functools.partial(shift, iota_y=iota_y, iota_x=iota_x)

        a = al_ref[0].astype(jnp.int32)
        # thicken across the dominant perpendicular axis, then close
        # single-hop gaps along the direction (ops/lsd.py semantics)
        if abs(dx) >= abs(dy):
            thick = a | sh(a, 1, 0) | sh(a, -1, 0)
        else:
            thick = a | sh(a, 0, 1) | sh(a, 0, -1)
        dil = thick | sh(thick, dy, dx) | sh(thick, -dy, -dx)
        run = (dil & sh(dil, dy, dx) & sh(dil, -dy, -dx)) | thick

        f = run
        for k in range(max_doublings):
            h = 1 << k
            fwd = sh(f, dy * h, dx * h)
            f = jnp.where(f == h, f + fwd, f)

        is_start = run & (1 - sh(run, -dy, -dx))
        # pack hop count with the complemented tile-local position so a
        # plain 8x8 window max outside recovers (best f, first argmax):
        #   packed = f * 64 + (63 - (y%8)*8 - (x%8))
        idx = (iota_y % 8) * 8 + (iota_x % 8)
        packed = jnp.where(is_start == 1, f * 64 + (63 - idx), 0)
        out_ref[0] = packed

    return kernel


def _run_pack_pallas(aligned: jnp.ndarray, dx: int, dy: int,
                     max_doublings: int = 8) -> jnp.ndarray:
    """[N, H, W] bool/int8 aligned masks -> [N, Hp, Wp] i32 packed run maps.

    Output stays in the kernel's padded layout (Hp, Wp multiples of 8/128,
    pad entries 0) — the consumer pools 8x8 windows, so slicing back to
    (H, W) would only force an extra relayout copy."""
    N, H, W = aligned.shape
    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    al = jnp.pad(aligned.astype(jnp.int8), ((0, 0), (0, Hp - H),
                                            (0, Wp - W)))
    kernel = _make_kernel(dx, dy, H, W, Hp, Wp, max_doublings)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wp), jnp.int32),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Hp, Wp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
    )(al)


@functools.lru_cache(maxsize=None)
def _batched_run_pack(dx: int, dy: int, max_doublings: int):
    """custom_vmap wrapper: outer vmaps fold into the image axis."""

    @jax.custom_batching.custom_vmap
    def f(aligned):                        # [N, H, W]
        return _run_pack_pallas(aligned, dx, dy, max_doublings)

    @f.def_vmap
    def _rule(axis_size, in_batched, aligned):
        if not in_batched[0]:
            aligned = jnp.broadcast_to(aligned[None],
                                       (axis_size,) + aligned.shape)
        out = f(aligned.reshape((-1,) + aligned.shape[2:]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def run_pack(aligned: jnp.ndarray, dx: int, dy: int,
             max_doublings: int = 8) -> jnp.ndarray:
    """[H, W] aligned mask -> [Hp, Wp] i32 packed run-start map
    (hops * 64 + (63 - tile_local_idx) at run starts, 0 elsewhere).

    vmap folds into the kernel's native batch axis."""
    return _batched_run_pack(dx, dy, max_doublings)(aligned[None])[0]


# ---------------------------------------------------------------------------
# Multi-direction variant: ALL directions in ONE kernel launch.
#
# The per-direction kernel above still costs one pallas_call + one XLA
# aligned-mask pass per (image, direction) — 12-16 launches per image with
# the alignment masks crossing HBM every time.  Here XLA packs all D
# alignment masks into ONE i32 bitmask image (bit d = aligned to direction
# d), the kernel keeps it VMEM-resident across a (N, D) grid, and a
# D-way switch runs the direction-specialized shift program.  Runs are
# packed METRIC-scaled so one global top-k ranks candidates across
# directions by true pixel length:
#
#     packed = (hops * hq_d) * 64 + (63 - tile_local_idx),
#     hq_d = round(16 * hypot(dx, dy))   (4-bit fixed-point hop length)
# ---------------------------------------------------------------------------


def _hop_q(dx: int, dy: int) -> int:
    return int(round(16.0 * math.hypot(dx, dy)))


def _make_multi_kernel(steps: tuple, Hp: int, Wp: int, max_doublings: int):
    Ht = Hp // 8

    def shift(x, sy, sx, iota_y, iota_x):
        if abs(sy) >= Hp or abs(sx) >= Wp:
            return jnp.zeros_like(x)
        r = x
        if sy:
            r = pltpu.roll(r, (-sy) % Hp, axis=0)
            r = jnp.where(iota_y < Hp - sy, r, 0) if sy > 0 else \
                jnp.where(iota_y >= -sy, r, 0)
        if sx:
            r = pltpu.roll(r, (-sx) % Wp, axis=1)
            r = jnp.where(iota_x < Wp - sx, r, 0) if sx > 0 else \
                jnp.where(iota_x >= -sx, r, 0)
        return r

    def kernel(bits_ref, out_ref):
        # one grid step per image, STATIC unrolled loop over directions —
        # a lax.switch on the direction lowers to predicated execution of
        # every branch on this toolchain (measured ~D x slower)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
        sh = functools.partial(shift, iota_y=iota_y, iota_x=iota_x)
        bits = bits_ref[0]
        idx = (iota_y % 8) * 8 + (iota_x % 8)

        for di, (dx, dy) in enumerate(steps):
            hq = _hop_q(dx, dy)
            a = (bits >> di) & 1
            if abs(dx) >= abs(dy):
                thick = a | sh(a, 1, 0) | sh(a, -1, 0)
            else:
                thick = a | sh(a, 0, 1) | sh(a, 0, -1)
            dil = thick | sh(thick, dy, dx) | sh(thick, -dy, -dx)
            run = (dil & sh(dil, dy, dx) & sh(dil, -dy, -dx)) | thick

            f = run
            for k in range(max_doublings):
                h = 1 << k
                fwd = sh(f, dy * h, dx * h)
                f = jnp.where(f == h, f + fwd, f)

            is_start = run & (1 - sh(run, -dy, -dx))
            packed = jnp.where(is_start == 1, (f * hq) * 64 + (63 - idx), 0)
            # row-pool 8x on-chip (packing makes max == best-run-first);
            # lane pooling stays outside where an 8-wide window is cheap
            out_ref[0, di] = packed.reshape(Ht, 8, Wp).max(axis=1)

    return kernel


def _run_pack_multi_pallas(bits: jnp.ndarray, steps: tuple,
                           max_doublings: int) -> jnp.ndarray:
    """[N, H, W] i32 direction bitmasks -> [N, D, Hp/8, Wp] i32 row-pooled
    packed run maps."""
    N, H, W = bits.shape
    D = len(steps)
    Hp = _round_up(H, 64)          # row pooling needs Hp/8 itself 8-aligned
    Wp = _round_up(W, 128)
    bits_p = jnp.pad(bits, ((0, 0), (0, Hp - H), (0, Wp - W)))
    kernel = _make_multi_kernel(steps, Hp, Wp, max_doublings)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, D, Hp // 8, Wp), jnp.int32),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, D, Hp // 8, Wp), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # several [Hp, Wp] i32 temporaries live at once; the default 16 MB
        # scoped-vmem cap is too tight (v5e has 128 MB physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(bits_p)


@functools.lru_cache(maxsize=None)
def _batched_run_pack_multi(steps: tuple, max_doublings: int):
    """custom_vmap wrapper: outer vmaps fold into the image axis."""

    @jax.custom_batching.custom_vmap
    def f(bits):                           # [N, H, W]
        return _run_pack_multi_pallas(bits, steps, max_doublings)

    @f.def_vmap
    def _rule(axis_size, in_batched, bits):
        if not in_batched[0]:
            bits = jnp.broadcast_to(bits[None], (axis_size,) + bits.shape)
        out = f(bits.reshape((-1,) + bits.shape[2:]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def run_pack_multi(bits: jnp.ndarray, steps: tuple,
                   max_doublings: int = 8) -> jnp.ndarray:
    """[H, W] i32 direction bitmask -> [D, Hp, Wp] i32 metric-packed run maps
    ((hops * hq_d) * 64 + (63 - tile_idx) at run starts; hq_d = round(16*hop)).

    vmap folds into the kernel's native batch axis."""
    return _batched_run_pack_multi(tuple(steps), max_doublings)(
        bits[None])[0]
