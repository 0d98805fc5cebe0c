"""TP feature-sharded matching == dense single-device matching.

The sharded matcher (parallel/tp.py) must reproduce ops/matching
.nnr_mutual_match bit for bit, including argmin tie-breaking, on a
multi-device mesh (SURVEY.md §2.4 TP row)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.ops import hamming, matching
from stvo_pl_tpu.parallel import tp
from stvo_pl_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("n_model", [2, 4, 8])
@pytest.mark.parametrize("mutual", [True, False])
def test_tp_match_equals_dense(n_model, mutual):
    if len(jax.devices()) < n_model:
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(0)
    N, M = 160, 256
    d1 = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
    # duplicate some rows to force distance ties across shards
    d2 = d2.at[M // 2:M // 2 + 16].set(d2[:16])
    v1 = jnp.asarray(rng.random(N) > 0.2)
    v2 = jnp.asarray(rng.random(M) > 0.2)

    dist = hamming.hamming_matrix(d1, d2)
    ref = matching.nnr_mutual_match(dist, v1[:, None] & v2[None, :],
                                    0.8, mutual=mutual)

    mesh = make_mesh(n_data=len(jax.devices()) // n_model, n_model=n_model)
    got = tp.tp_match(d1, v1, d2, v2, 0.8, mesh, mutual=mutual)

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))
