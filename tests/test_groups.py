"""Heterogeneous config groups on device sub-meshes (the EP analogue,
SURVEY.md §2.4): two groups with different configs advance concurrently on
disjoint device sets, each staying local to its group."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import groups as groups_mod
from stvo_pl_tpu.utils import synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG_PL = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=48,
                  lsd_n_dirs=8, min_features=8, fast_feat_th=20,
                  # single-octave detector: this test's subject is group
                  # placement, and the tiny 240x180 / 48-line scene is
                  # below the octave default's useful size (the canvas
                  # splits a 48-slot pool over 3 octaves and the
                  # capacity-sized right pool leaves too few stereo
                  # candidates — 1 match vs 6 single-octave, measured)
                  lsd_octaves=1)
CFG_P = dataclasses.replace(CFG_PL, has_lines=False)


def _sequence(n):
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(key, n_points=220, n_lines=20,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(n, speed=0.25)
    return synthetic.render_sequence(scene, poses, CAM)


def test_two_config_groups_run_disjoint_and_good():
    devs = jax.devices()[:8]
    ga = groups_mod.ConfigGroup("pt+ls", CFG_PL, CAM, batch=4)
    gb = groups_mod.ConfigGroup("pt-only", CFG_P, CAM, batch=4)
    runner = groups_mod.GroupRunner([ga, gb], devices=devs)

    # device partition is disjoint and covers the fleet
    da = {d for d in runner.meshes[0].devices.flat}
    db = {d for d in runner.meshes[1].devices.flat}
    assert da.isdisjoint(db) and len(da) == len(db) == 4

    n = 4
    seq_l, seq_r = _sequence(n)
    states = [runner.init_state(0), runner.init_state(1)]
    nlines = [[], []]
    for i in range(n):
        il = jnp.broadcast_to(seq_l[i], (4,) + seq_l[i].shape)
        ir = jnp.broadcast_to(seq_r[i], (4,) + seq_r[i].shape)
        placed = [runner.place(g, states[g], il, ir) for g in range(2)]
        states, telems = runner.step_all(
            [p[0] for p in placed],
            [p[1] for p in placed],
            [p[2] for p in placed])
        for g in range(2):
            nlines[g].append(int(np.asarray(telems[g].n_lines).max()))

    for g, t in enumerate(telems):
        assert bool(np.all(np.asarray(t.good))), f"group {g} lost tracking"
    # outputs live on each group's own devices
    for g in range(2):
        got = {d for d in states[g].Tfw.sharding.device_set}
        assert got <= (da if g == 0 else db)
    # point-only group really ran without lines
    assert max(nlines[1]) == 0
    assert max(nlines[0]) > 0, f"pt+ls group matched no lines: {nlines[0]}"


def test_group_validation():
    import pytest
    g = groups_mod.ConfigGroup("a", CFG_P, CAM, batch=3)
    with pytest.raises(ValueError):
        groups_mod.GroupRunner([g], devices=jax.devices()[:4])  # 3 % 4 != 0
