import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from stvo_pl_tpu.ops.fast import ARC, CIRCLE

N, H, W = 1, 370, 1226
Wp, STRIP, HALO = 1280, 40, 4
NS = -(-H // STRIP)
Htot = NS * STRIP + 2 * HALO
R = STRIP + 2
edge = 19
STAGE = int(sys.argv[1])

def kernel(thr_ref, img_ref, out_ref):
    n = pl.program_id(0)
    s = pl.program_id(1)
    t = thr_ref[n]
    slab = img_ref[0, pl.ds(s * STRIP, STRIP + 2 * HALO), :]
    center = slab[HALO - 1:HALO - 1 + R, :]
    if STAGE == 0:
        out_ref[0] = (center[1:1 + STRIP] + t).astype(jnp.int32)
        return
    diffs = []
    for dy, dx in CIRCLE:
        sh = slab[HALO - 1 + dy:HALO - 1 + dy + R, :]
        if dx:
            sh = pltpu.roll(sh, (-int(dx)) % Wp, axis=1)
        diffs.append(sh - center)
    if STAGE == 1:
        acc = diffs[0]
        for d in diffs[1:]:
            acc = acc + d
        out_ref[0] = acc[1:1 + STRIP].astype(jnp.int32)
        return
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
    if STAGE == 2:
        out_ref[0] = resp[1:1 + STRIP].astype(jnp.int32)
        return
    gy = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 0) + s * STRIP - 1
    gx = jax.lax.broadcasted_iota(jnp.int32, (R, Wp), 1)
    inside = ((gy >= edge) & (gy < H - edge) & (gx >= edge) & (gx < W - edge))
    resp = jnp.where((resp > t) & inside, resp, 0.0)
    if STAGE == 3:
        out_ref[0] = resp[1:1 + STRIP].astype(jnp.int32)
        return
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
    if STAGE == 4:
        out_ref[0] = keep.astype(jnp.int32)
        return
    q = (r0 * 256.0).astype(jnp.int32)
    if STAGE == 5:
        out_ref[0] = jnp.where(keep, q, 0)
        return
    idx = ((gy[1:1 + STRIP, :] % 4) * 4 + gx[1:1 + STRIP, :] % 4)
    out_ref[0] = jnp.where(keep, q * 16 + (15 - idx), 0)

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(N, NS),
    in_specs=[pl.BlockSpec((1, Htot, Wp), lambda n, s, thr: (n, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, STRIP, Wp), lambda n, s, thr: (n, s, 0),
                           memory_space=pltpu.VMEM),
)
f = jax.jit(lambda thr, img: pl.pallas_call(
    kernel, out_shape=jax.ShapeDtypeStruct((N, NS * STRIP, Wp), jnp.int32),
    grid_spec=grid_spec)(thr, img))
out = f(jnp.full((N,), 2.0, jnp.float32), jnp.ones((N, Htot, Wp), jnp.float32))
print("stage", STAGE, "ok", out.sum())
