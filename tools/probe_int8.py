"""Functional probe: does the axon TPU backend compile int8 dot_general,
and is the int8 formulation of describe()/hamming exact vs the bf16 path?

Correctness-only — timing of sub-ms ops over the tunnel is unreliable
(CLAUDE.md); the decision measurement is a full bench.py A/B.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # --- raw int8 dot ---
    a = rng.integers(-128, 128, size=(256, 1152), dtype=np.int8)
    b = rng.integers(-2, 2, size=(1152, 7680), dtype=np.int8)

    @jax.jit
    def dot_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    try:
        out = np.asarray(dot_i8(jnp.asarray(a), jnp.asarray(b)))
        ref = a.astype(np.int64) @ b.astype(np.int64)
        print("int8 dot ok, exact:", bool((out == ref).all()))
    except Exception as e:  # noqa: BLE001
        print("int8 dot FAILED:", type(e).__name__, str(e)[:300])
        return

    # --- hamming int8 vs bf16 path ---
    from stvo_pl_tpu.ops import hamming
    d1 = rng.integers(0, 2**32, size=(640, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, size=(640, 8), dtype=np.uint32)
    ref_h = np.asarray(jax.jit(hamming.hamming_matrix_xla)(d1, d2))

    @jax.jit
    def hamming_i8(desc1, desc2):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        def pm1(d):
            bits = (d[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
            bits = bits.reshape(d.shape[:-1] + (256,))
            return (2 * bits.astype(jnp.int8) - 1)
        a, b = pm1(desc1), pm1(desc2)
        dot = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (256 - dot) // 2

    out_h = np.asarray(hamming_i8(jnp.asarray(d1), jnp.asarray(d2)))
    print("hamming int8 exact:", bool((out_h == ref_h).all()))


if __name__ == "__main__":
    main()
