import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

N, Htot, Wp, STRIP, NS = 1, 408, 1280, 40, 10

def kernel(thr_ref, img_ref, out_ref):
    n = pl.program_id(0)
    s = pl.program_id(1)
    t = thr_ref[n]
    slab = img_ref[0, pl.ds(s * STRIP, STRIP + 8), :]
    out_ref[0] = (slab[4:44, :] + t).astype(jnp.int32)

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
print("ok", out.shape, out[0, 0, 0], out[0, 399, 0])
