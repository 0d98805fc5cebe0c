"""binary_matcher vs a numpy brute-force oracle (reference semantics:
3rdparty/line_descriptor/src/binary_descriptor_matcher.cpp match/knnMatch/
radiusMatch over a multi-image descriptor dataset)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.ops import binary_matcher as bm


def _rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)


def _oracle_dist(q, d):
    x = q[:, None, :] ^ d[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=2).sum(2).astype(np.int32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    imgs = [_rand_desc(rng, n) for n in (40, 25, 60)]
    # image 1 has some invalid rows
    valids = [np.ones(40, bool), np.arange(25) < 20, np.ones(60, bool)]
    q = _rand_desc(rng, 30)
    # plant exact duplicates so distance-0 matches exist
    q[3] = imgs[0][7]
    q[11] = imgs[2][42]
    idx = bm.build_index([jnp.asarray(d) for d in imgs],
                         [jnp.asarray(v) for v in valids])
    dall = np.concatenate(imgs)
    vall = np.concatenate(valids)
    od = _oracle_dist(q, dall)
    od[:, ~vall] = 10 ** 6
    return q, idx, od, np.concatenate(
        [np.full(len(d), i) for i, d in enumerate(imgs)])


def test_index_layout(setup):
    q, idx, od, img_of = setup
    assert int(idx.valid.sum()) == 40 + 20 + 60
    assert np.array_equal(np.asarray(idx.image_id[:40]), np.zeros(40))
    assert int(idx.local_id[40]) == 0 and int(idx.image_id[40]) == 1


def test_match_best(setup):
    q, idx, od, img_of = setup
    res = bm.match(jnp.asarray(q), idx)
    best = od.argmin(1)
    assert np.array_equal(np.asarray(res.idx[:, 0]), best)
    assert np.array_equal(np.asarray(res.dist[:, 0]), od.min(1))
    assert np.array_equal(np.asarray(res.image_id[:, 0]), img_of[best])
    assert int(res.dist[3, 0]) == 0 and int(res.dist[11, 0]) == 0


def test_knn_distances_sorted_and_exact(setup):
    q, idx, od, img_of = setup
    k = 5
    res = bm.knn_match(jnp.asarray(q), idx, k)
    d = np.asarray(res.dist)
    assert (np.diff(d, axis=1) >= 0).all()
    expected = np.sort(od, axis=1)[:, :k]
    assert np.array_equal(d, expected)


def test_radius(setup):
    q, idx, od, img_of = setup
    r, cap = 100, 8
    res = bm.radius_match(jnp.asarray(q), idx, max_distance=r,
                          max_results=cap)
    got = np.asarray(res.dist)
    for i in range(q.shape[0]):
        within = np.sort(od[i][od[i] <= r])[:cap]
        valid = got[i][got[i] <= r]
        assert np.array_equal(valid, within)
    assert (np.asarray(res.idx)[got > r] == -1).all()


def test_query_mask(setup):
    q, idx, od, img_of = setup
    qv = np.arange(q.shape[0]) % 2 == 0
    res = bm.match(jnp.asarray(q), idx, q_valid=jnp.asarray(qv))
    assert (np.asarray(res.idx)[~qv, 0] == -1).all()
    assert (np.asarray(res.idx)[qv, 0] == od[qv].argmin(1)).all()
