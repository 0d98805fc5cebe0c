"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS + cell packing.

The XLA path (ops/fast.py fast_score + select_keypoints) materializes the
16-image shifted-diff stack and the min/max window trees through HBM —
~10 ms for 8 KITTI-sized images, almost all of it memory traffic.  This
kernel computes the exact same response per 40-row strip held in VMEM, so
the entire diff/window tree lives on-chip, and writes back ONE packed i32
map:

    packed[p] = floor(score * 256) * 2^14 + (15 - cell_local_idx(p)) * 2^10
                + oy5 * 2^5 + ox5
                at 3x3-NMS survivors inside the detector border, 0 elsewhere

where (ox5, oy5) are the 5-bit-quantized sub-pixel parabola offsets fit to
the corner's 3x3 pre-NMS response neighborhood (already in VMEM — the
refinement costs no extra memory traffic; measured 0.30 -> 0.12-0.18 px
RMS sub-pixel tracking error on natural texture).  A plain 4x4
reduce_window max outside then recovers the per-cell best corner, its
in-cell position AND its sub-pixel offset in one pooling pass, followed by
a single top-k — identical selection semantics to select_keypoints (cell=4
spatial uniformity, top-left plateau tie-break via the same index
epsilon), with score ranking quantized to 1/256 intensity.

Replaces cv::ORB's FAST stage (reference consumes it at
src/stereoFrame.cpp:112-115).  A custom_vmap rule flattens outer vmaps
(sequence batch, L/R eye) into the kernel's native image axis, mirroring
ops/patches.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stvo_pl_tpu.ops.fast import ARC, CIRCLE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


STRIP = 40     # rows produced per grid step (multiple of 8)
HALO = 4       # circle radius 3 + 1 NMS row


def _make_kernel(H: int, W: int, Wp: int, edge: int, n_strips: int):
    R = STRIP + 2  # response rows incl. the +-1 NMS halo

    def kernel(img_ref, out_ref):
        s = pl.program_id(1)
        # slab rows [y0-4, y0+STRIP+4) in real coords = [y0, y0+STRIP+8) in
        # the top-padded input; response computed for rows [y0-1, y0+STRIP]
        slab = img_ref[0, pl.ds(s * STRIP, STRIP + 2 * HALO), :]
        center = slab[HALO - 1:HALO - 1 + R, :]

        diffs = []
        for dy, dx in CIRCLE:
            sh = slab[HALO - 1 + dy:HALO - 1 + dy + R, :]
            if dx:
                sh = pltpu.roll(sh, (-int(dx)) % Wp, axis=1)
            diffs.append(sh - center)

        # min/max over every contiguous 9-window of the circular sequence,
        # shared-subtree form (identical to ops/fast.py fast_score)
        wrap = diffs + diffs[:ARC - 1]
        min3 = [jnp.minimum(jnp.minimum(wrap[i], wrap[i + 1]), wrap[i + 2])
                for i in range(16 + ARC - 3)]
        max3 = [jnp.maximum(jnp.maximum(wrap[i], wrap[i + 1]), wrap[i + 2])
                for i in range(16 + ARC - 3)]
        bright = None
        dark = None
        for i in range(16):
            wmin = jnp.minimum(jnp.minimum(min3[i], min3[i + 3]), min3[i + 6])
            wmax = jnp.maximum(jnp.maximum(max3[i], max3[i + 3]), max3[i + 6])
            bright = wmin if bright is None else jnp.maximum(bright, wmin)
            dark = wmax if dark is None else jnp.minimum(dark, wmax)
        resp = jnp.maximum(bright, -dark)

        # detector border (select_keypoints edge mask semantics).  The
        # adaptive FAST threshold is NOT applied here: a device->SMEM
        # scalar-prefetch stalls the launch pipeline (~1.8 ms/step
        # measured), and gating after NMS is exactly equivalent — a
        # survivor above t beats every neighbor regardless of the gate, so
        # zeroing sub-threshold pixels before NMS changes nothing for the
        # survivors the selection keeps.
        gy = (jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 0)
              + s * STRIP - 1)
        gx = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
        inside = ((gy >= edge) & (gy < H - edge)
                  & (gx >= edge) & (gx < W - edge))

        # sub-pixel parabola offsets from the PRE-border-mask positive
        # response (a corner at the border ring still has real neighbors);
        # 1-D fits per axis, clamped to +-0.5, quantized to 5 bits.  The
        # adaptive threshold is not applied to the surface (no scalar
        # operands in-kernel) — neighbors in (0, t] still shape the fit,
        # which only adds information.
        rp = jnp.where(resp > 0, resp, 0.0)
        rc = rp[1:1 + STRIP, :]
        rl = pltpu.roll(rc, 1, axis=1)          # value at x-1
        rr = pltpu.roll(rc, Wp - 1, axis=1)     # value at x+1
        ru = rp[0:STRIP, :]
        rd = rp[2:2 + STRIP, :]
        denx = rl - 2.0 * rc + rr
        deny = ru - 2.0 * rc + rd
        ox = jnp.where(denx < -1e-6,
                       0.5 * (rl - rr) / jnp.where(denx < -1e-6, denx, -1.0),
                       0.0)
        oy = jnp.where(deny < -1e-6,
                       0.5 * (ru - rd) / jnp.where(deny < -1e-6, deny, -1.0),
                       0.0)
        ox = jnp.clip(ox, -0.5, 0.5)
        oy = jnp.clip(oy, -0.5, 0.5)
        oqx = ((ox + 0.5) * 31.0 + 0.5).astype(jnp.int32)
        oqy = ((oy + 0.5) * 31.0 + 0.5).astype(jnp.int32)

        resp = jnp.where((resp > 0) & inside, resp, 0.0)

        # 3x3 NMS with the top-left plateau tie-break epsilon
        eps = (gy * W + gx).astype(jnp.float32) * 1e-7
        se = jnp.where(resp > 0, resp - eps, 0.0)
        nmax = None
        for dy in (-1, 0, 1):
            row = se[1 + dy:1 + dy + STRIP, :]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                v = pltpu.roll(row, (-dx) % Wp, axis=1) if dx else row
                nmax = v if nmax is None else jnp.maximum(nmax, v)
        sc = se[1:1 + STRIP, :]
        r0 = resp[1:1 + STRIP, :]
        keep = (sc >= nmax) & (r0 > 0)

        q = (r0 * 256.0).astype(jnp.int32)
        # fresh strip-shaped iotas: slicing a broadcasted_iota at an
        # unaligned sublane offset and then taking % crashes Mosaic
        sy = (jax.lax.broadcasted_iota(jnp.int32, (STRIP, Wp), 0)
              + s * STRIP)
        sx = jax.lax.broadcasted_iota(jnp.int32, (STRIP, Wp), 1)
        idx = (sy % 4) * 4 + sx % 4
        out_ref[0] = jnp.where(
            keep, q * 16384 + (15 - idx) * 1024 + oqy * 32 + oqx, 0)

    return kernel


def _fast_pack_pallas(img: jnp.ndarray, edge: int):
    """[N, H, W] images -> [N, n_strips*STRIP, Wp] packed corner maps."""
    N, H, W = img.shape
    Wp = _round_up(W, 128)
    n_strips = -(-H // STRIP)
    Htot = n_strips * STRIP + 2 * HALO
    img_p = jnp.pad(img, ((0, 0), (HALO, Htot - H - HALO), (0, Wp - W)))
    kernel = _make_kernel(H, W, Wp, edge, n_strips)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, n_strips * STRIP, Wp), jnp.int32),
        grid=(N, n_strips),
        in_specs=[pl.BlockSpec((1, Htot, Wp), lambda n, s: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, STRIP, Wp), lambda n, s: (n, s, 0),
                               memory_space=pltpu.VMEM),
    )(img_p)


@functools.lru_cache(maxsize=None)
def _batched_fast_pack(edge: int):
    """custom_vmap wrapper: outer vmaps fold into the image axis."""

    @jax.custom_batching.custom_vmap
    def f(img):                            # [N, H, W]
        return _fast_pack_pallas(img, edge)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        if not in_batched[0]:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        out = f(img.reshape((-1,) + img.shape[2:]))
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return f


def fast_pack(img: jnp.ndarray, edge: int) -> jnp.ndarray:
    """[H, W] image -> [Hs, Wp] packed NMS-survivor map
    (floor(score*256)*16 + (15 - cell_idx) at corners, 0 elsewhere).

    vmap folds into the kernel's native batch axis."""
    return _batched_fast_pack(edge)(img[None])[0]


def select_from_packed(packed: jnp.ndarray, capacity: int,
                       threshold: jnp.ndarray, cell: int = 4,
                       subpix: bool = True):
    """Packed map -> (uv [K,2] f32, score [K] f32, valid [K] bool).

    One 4x4 reduce_window max recovers the per-cell best NMS survivor, its
    in-cell position and its sub-pixel offset (the packing orders by
    quantized score, then top-left position, then offset bits as an inert
    tie-break); a single top-k ranks cells.  The (traced, adaptive) FAST
    threshold gates the decoded scores here — equivalent to gating before
    NMS, and it keeps the kernel free of scalar operands.
    """
    Hs, Wp = packed.shape
    pooled = jax.lax.reduce_window(packed, 0, jax.lax.max,
                                   (cell, cell), (cell, cell), "VALID")
    Wc = Wp // cell
    flat = pooled.reshape(-1)
    k = min(capacity, flat.size)
    # approx_max_k uses the TPU-native partial-reduction path (an exact
    # top_k sort here costs ~as much as the whole detection kernel).  The
    # f32 cast rounds packed words (~2^30) to 64s — i.e. it ranks by the
    # same 1/256-quantized score as before (offset bits never rank) — so
    # the winning POSITIONS are exact; re-gather the exact i32 words at
    # those positions to decode offsets losslessly.
    topf, pos = jax.lax.approx_max_k(flat.astype(jnp.float32), k,
                                     recall_target=0.95)
    top = flat[pos]
    idx = 15 - ((top >> 10) & 15)
    score = (top >> 14).astype(jnp.float32) * (1.0 / 256.0)
    ys = ((pos // Wc) * cell + idx // 4).astype(jnp.float32)
    xs = ((pos % Wc) * cell + idx % 4).astype(jnp.float32)
    if subpix:
        xs = xs + ((top & 31).astype(jnp.float32) * (1.0 / 31.0) - 0.5)
        ys = ys + (((top >> 5) & 31).astype(jnp.float32) * (1.0 / 31.0) - 0.5)
    valid = (top > 0) & (score > threshold)
    uv = jnp.stack([xs, ys], axis=-1)
    if k < capacity:
        pad = capacity - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), uv.dtype)])
        score = jnp.concatenate([score, jnp.zeros((pad,), score.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return uv, score, valid
