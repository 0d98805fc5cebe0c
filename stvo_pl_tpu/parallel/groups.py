"""Heterogeneous config groups over device sub-meshes — the EP analogue.

The reference has no expert parallelism (SURVEY.md §2.4: no experts exist in
classical geometry VO); the nearest TPU-native analogue is dispatching
*different pipeline configurations* (different feature budgets, robust
kernels, point-only vs point+line) to disjoint device groups that advance
concurrently.  Each group gets its own single-axis data mesh and its own
compiled sharded step (configs are jit-static, so each group is one XLA
program); dispatch is async, so groups overlap on the device fleet exactly
like experts under a sparse dispatch.

Typical use: run KITTI sequences with config_kitti on half the slice and
EuRoC sequences with config_euroc on the other half, one process.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import batched
from stvo_pl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


@dataclass(frozen=True)
class ConfigGroup:
    """One expert: a VO configuration + camera bound to a device group."""
    name: str
    cfg: VOConfig
    cam: cam_ops.StereoCamera
    batch: int  # sequences in this group (multiple of its device count)


class GroupRunner:
    """Partition devices into len(groups) contiguous sub-meshes and build a
    sharded VO step per group.

    `step(i, state, imgs_l, imgs_r)` runs group i's step on group i's
    devices; calls for different groups overlap (async dispatch), giving
    expert-style concurrency without any cross-group collective (there is
    nothing to exchange — groups are independent by construction, the same
    reason the reference could run its configs as separate processes).
    """

    def __init__(self, groups: Sequence[ConfigGroup], devices=None):
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) % len(groups) != 0:
            raise ValueError(
                f"{len(devices)} devices do not split into {len(groups)} "
                "equal groups")
        per = len(devices) // len(groups)
        self.groups = list(groups)
        self.meshes = []
        self.steps = []
        self.places = []
        for i, g in enumerate(groups):
            if g.batch % per != 0:
                raise ValueError(
                    f"group {g.name}: batch {g.batch} not a multiple of its "
                    f"{per} devices")
            dev = np.asarray(devices[i * per:(i + 1) * per]).reshape(per, 1)
            mesh = Mesh(dev, (DATA_AXIS, MODEL_AXIS))
            step, place = batched.make_sharded_vo_step(mesh, g.cam, g.cfg)
            self.meshes.append(mesh)
            self.steps.append(step)
            self.places.append(place)

    def init_state(self, i: int):
        """Group i's batched VOState, placed on its sub-mesh."""
        g = self.groups[i]
        state = batched.init_batched_state(g.cfg, g.batch)
        state, _, _ = self.places[i](
            state,
            jax.numpy.zeros((g.batch, g.cam.height, g.cam.width),
                            jax.numpy.float32),
            jax.numpy.zeros((g.batch, g.cam.height, g.cam.width),
                            jax.numpy.float32))
        return state

    def place(self, i: int, state, imgs_l, imgs_r):
        return self.places[i](state, imgs_l, imgs_r)

    def step(self, i: int, state, imgs_l, imgs_r):
        """One VO step for group i (async; overlap by calling all groups
        before blocking on any result)."""
        return self.steps[i](state, imgs_l, imgs_r)

    def step_all(self, states, imgs_l_per_group, imgs_r_per_group):
        """Advance every group one frame; dispatches all groups before any
        blocking so the sub-meshes run concurrently."""
        out = [self.steps[i](states[i], imgs_l_per_group[i],
                             imgs_r_per_group[i])
               for i in range(len(self.groups))]
        states = [o[0] for o in out]
        telems = [o[1] for o in out]
        return states, telems
