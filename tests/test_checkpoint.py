"""Checkpoint round trip: a resumed run must produce identical poses."""

import numpy as np
import jax

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models import frontend
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import checkpoint, synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
CFG = VOConfig(orb_nfeatures=200, orb_nlevels=2, lsd_nfeatures=24,
               lsd_n_dirs=8, min_features=8)


def test_checkpoint_resume_identical(tmp_path):
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(key, n_points=220, n_lines=16,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(6, speed=0.25)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)

    # straight run
    st = frontend.init_state(CFG)
    ref = []
    for i in range(6):
        st, t = frontend.vo_step(st, seq_l[i], seq_r[i], CAM, CFG)
        ref.append(np.asarray(t.Tfw))

    # run 3, checkpoint, restore, run 3 more
    st = frontend.init_state(CFG)
    for i in range(3):
        st, t = frontend.vo_step(st, seq_l[i], seq_r[i], CAM, CFG)
    checkpoint.save_state(str(tmp_path / "ck"), st, 3, {"note": "t"})

    st2, idx, extra = checkpoint.load_state(str(tmp_path / "ck"),
                                            frontend.init_state(CFG))
    assert idx == 3 and extra["note"] == "t"
    out = []
    for i in range(3, 6):
        st2, t = frontend.vo_step(st2, seq_l[i], seq_r[i], CAM, CFG)
        out.append(np.asarray(t.Tfw))

    np.testing.assert_allclose(np.stack(out), np.stack(ref[3:]),
                               rtol=1e-5, atol=1e-5)
