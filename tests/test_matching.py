"""Hamming kernels and dense NNR/mutual matching vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from stvo_pl_tpu.ops import hamming, matching


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32))


def np_hamming(a, b):
    abits = np.unpackbits(np.ascontiguousarray(a).view(np.uint8), axis=1)
    bbits = np.unpackbits(np.ascontiguousarray(b).view(np.uint8), axis=1)
    return (abits[:, None, :] != bbits[None, :, :]).sum(-1)


def test_hamming_mxu_vs_numpy(rng):
    a = rand_desc(rng, 64)
    b = rand_desc(rng, 48)
    ref = np_hamming(np.asarray(a), np.asarray(b))
    got = np.asarray(hamming.hamming_matrix_mxu(a, b))
    np.testing.assert_array_equal(got, ref)


def test_hamming_xla_vs_numpy(rng):
    a = rand_desc(rng, 33)
    b = rand_desc(rng, 17)
    ref = np_hamming(np.asarray(a), np.asarray(b))
    got = np.asarray(hamming.hamming_matrix_xla(a, b))
    np.testing.assert_array_equal(got, ref)


def test_hamming_pallas(rng):
    # the pallas kernel needs a real TPU; on CPU its popcount body is
    # exercised through the shared _popcount_u32 path of the XLA variant
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU kernel requires TPU backend")
    a = rand_desc(rng, 256)
    b = rand_desc(rng, 256)
    ref = np_hamming(np.asarray(a), np.asarray(b))
    got = np.asarray(hamming.hamming_matrix_pallas(a, b))
    np.testing.assert_array_equal(got, ref)


def test_nnr_mutual_identity_match(rng):
    # identical descriptor sets must match i <-> i
    d = rand_desc(rng, 32)
    dist = hamming.hamming_matrix_xla(d, d)
    cand = jnp.ones((32, 32), bool)
    res = matching.nnr_mutual_match(dist, cand, nnr=0.9)
    # self-distance 0; second best > 0 with overwhelming probability
    assert np.asarray(res.valid).all()
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(32))


def test_nnr_ratio_rejects_ambiguous():
    # two identical candidates -> ratio test must reject
    dist = jnp.asarray([[1, 1, 50]], jnp.int32)
    cand = jnp.ones((1, 3), bool)
    res = matching.nnr_mutual_match(dist, cand, nnr=0.9, mutual=False)
    assert not bool(res.valid[0])


def test_mutual_rejects_stolen():
    # rows 0 and 1 both prefer column 0; only the closer row keeps it
    dist = jnp.asarray([[1, 40, 50], [2, 45, 55], [60, 3, 70]], jnp.int32)
    cand = jnp.ones((3, 3), bool)
    res = matching.nnr_mutual_match(dist, cand, nnr=0.9)
    assert bool(res.valid[0]) and int(res.idx[0]) == 0
    assert not bool(res.valid[1])
    assert bool(res.valid[2]) and int(res.idx[2]) == 1


def test_candidate_mask_respected(rng):
    d1 = rand_desc(rng, 8)
    dist = hamming.hamming_matrix_xla(d1, d1)
    cand = jnp.zeros((8, 8), bool)  # nothing allowed
    res = matching.nnr_mutual_match(dist, cand, nnr=0.9)
    assert not np.asarray(res.valid).any()
    assert (np.asarray(res.idx) == -1).all()


def test_stereo_window_mask():
    # left point at x=100 (cell 5 with inv_w = 0.05): right candidates must
    # be in cells [5 - ws, 5], same row
    uv_l = jnp.asarray([[100.0, 40.0]])
    uv_r = jnp.asarray([[100.0, 40.0],   # same cell -> yes
                        [60.0, 40.0],    # cell 3, dx=2 <= 3 -> yes
                        [20.0, 40.0],    # cell 1, dx=4 > 3 -> no
                        [120.0, 40.0],   # cell 6, dx=-1 -> no (right of left)
                        [100.0, 90.0]])  # different row -> no
    m = matching.stereo_point_window_mask(uv_l, uv_r, 0.05, 0.05, ws=3)
    np.testing.assert_array_equal(np.asarray(m)[0],
                                  [True, True, False, False, False])


def test_line_direction_mask():
    d1 = jnp.asarray([[1.0, 0.0]])
    d2 = jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0],
                      [0.8, 0.6]])
    m = matching.line_direction_mask(d1, d2, 0.75)
    np.testing.assert_array_equal(np.asarray(m)[0],
                                  [True, True, False, True])
