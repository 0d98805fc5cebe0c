"""Checkpoint / resume of VO state (SURVEY.md §5: absent in the reference —
its closest capability is dataset offset restart, src/dataset.cpp:133-140).

Saves the full tracking state pytree (pose, covariance, feature sets,
adaptive-FAST state, keyframe bookkeeping) with orbax, so long runs and
multi-host windowed-BA jobs can resume mid-sequence.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_state(path: str, state, frame_idx: int, extra: dict | None = None):
    """Write a checkpoint directory (orbax for the state pytree, JSON
    sidecar for scalars/metadata)."""
    import json
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "state"),
              jax.tree_util.tree_map(np.asarray, state), force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"frame_idx": int(frame_idx), "extra": extra or {}}, f)


def load_state(path: str, template):
    """Restore (state, frame_idx, extra); `template` is an example VOState
    pytree (e.g. frontend.init_state(cfg)) fixing structure and dtypes —
    orbax restores into the template's own tree structure, so NamedTuple
    leaf order is preserved."""
    import json
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    tmpl = jax.tree_util.tree_map(np.asarray, template)
    restored = ckpt.restore(os.path.join(path, "state"), item=tmpl)
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_r = jax.tree_util.tree_leaves(restored)
    state = jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(r, dtype=t.dtype)
                  for r, t in zip(flat_r, flat_t)])
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta["frame_idx"], meta.get("extra", {})
