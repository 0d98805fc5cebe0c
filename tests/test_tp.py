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


def test_sharded_vo_step_with_tp_matches_dense():
    """DP x TP: the batched VO step on a (data, model) mesh with TP
    matching auto-engaged (tp_min_features below the budgets) must equal
    the dense single-device step bit for bit (VERDICT r3 item 6)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.parallel import batched

    cfg = VOConfig(orb_nfeatures=128, orb_nlevels=1, lsd_nfeatures=16,
                   lsd_n_dirs=4, min_features=8, tp_min_features=16)
    cam = cam_ops.StereoCamera(fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                               b=0.2, width=128, height=96)
    rng = np.random.default_rng(3)
    B = 2
    il = jnp.asarray(rng.uniform(0, 255, (B, 96, 128)).astype(np.float32))
    ir = jnp.asarray(np.roll(np.asarray(il), -2, axis=2))

    s_ref, t_ref = batched.vo_step_batched(
        batched.init_batched_state(cfg, B), il, ir, cam, cfg)

    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    step, place = batched.make_sharded_vo_step(mesh, cam, cfg)
    s_sh, il_s, ir_s = place(batched.init_batched_state(cfg, B), il, ir)
    s2, t2 = step(s_sh, il_s, ir_s)

    np.testing.assert_array_equal(np.asarray(t2.Tfw), np.asarray(t_ref.Tfw))
    np.testing.assert_array_equal(np.asarray(s2.prev_points.valid),
                                  np.asarray(s_ref.prev_points.valid))
    np.testing.assert_array_equal(np.asarray(s2.prev_lines.valid),
                                  np.asarray(s_ref.prev_lines.valid))


def test_match_auto_threshold_gates_tp():
    """Below tp_min_features match_auto must NOT emit collectives (the
    dense path compiles outside any mesh); above, inside a shard_map, it
    must equal the dense result."""
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.ops.matching import match_auto

    rng = np.random.default_rng(1)
    N = 64
    d1 = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
    cand = jnp.ones((N, N), bool)
    cfg = VOConfig(tp_min_features=4096)
    # tp tuple present but budget below threshold -> dense path, no mesh
    # required (would crash if the TP path were taken outside shard_map)
    res = match_auto(d1, d2, cand, 0.8, cfg, tp=("model", 2))
    ref = match_auto(d1, d2, cand, 0.8, cfg, tp=None)
    np.testing.assert_array_equal(np.asarray(res.idx), np.asarray(ref.idx))
