"""EDLine-style detector: planted-segment recovery, rotation equivariance
of the fit, and the e2e VO A/B against the dense detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.ops import edline


def _img_with_lines(lines, shape=(180, 240), bg=40.0, fg=210.0):
    cv2 = pytest.importorskip("cv2")
    img = np.full(shape, bg, np.float32)
    for (a, b) in lines:
        cv2.line(img, a, b, fg, 2)
    return img


def test_planted_segments_recovered():
    lines = [((30, 40), (200, 60)), ((60, 150), (80, 30)),
             ((120, 100), (190, 160))]
    img = _img_with_lines(lines)
    segs = edline.detect_edlines(jnp.asarray(img), jnp.float32(20.0),
                                 capacity=32)
    v = np.asarray(segs.valid)
    sp = np.asarray(segs.sp)[v]
    ep = np.asarray(segs.ep)[v]
    assert v.sum() >= 3
    # every planted line has a substantial detection lying ON it with the
    # right angle (junction crossings legitimately split chains, so match
    # by line-distance rather than full-segment midpoint)
    for (a, b) in lines:
        a = np.array(a, float)
        b = np.array(b, float)
        ang = np.arctan2(b[1] - a[1], b[0] - a[0]) % np.pi
        u = (b - a) / np.linalg.norm(b - a)
        n_vec = np.array([-u[1], u[0]])
        mids = 0.5 * (sp + ep)
        d_line = np.abs((mids - a) @ n_vec)
        angs = np.arctan2((ep - sp)[:, 1], (ep - sp)[:, 0]) % np.pi
        d_ang = np.minimum(np.abs(angs - ang), np.pi - np.abs(angs - ang))
        length = np.linalg.norm(ep - sp, axis=1)
        hit = (d_line < 4.0) & (d_ang < 0.12) & (length > 30)
        assert hit.any(), (a, b)


def test_angle_continuous_no_quantization():
    """Fitted angles track the true angle to ~1 deg at arbitrary
    orientations (no direction-bin quantization)."""
    cv2 = pytest.importorskip("cv2")
    for deg in [7.0, 23.0, 41.0, 68.0, 83.0]:
        th = np.deg2rad(deg)
        c = np.array([120, 90])
        d = np.array([np.cos(th), np.sin(th)])
        a = (c - 70 * d).astype(int)
        b = (c + 70 * d).astype(int)
        img = _img_with_lines([(tuple(a), tuple(b))])
        segs = edline.detect_edlines(jnp.asarray(img), jnp.float32(30.0),
                                     capacity=8)
        v = np.asarray(segs.valid)
        assert v.any(), deg
        angs = np.asarray(segs.angle)[v] % np.pi
        err = np.min(np.minimum(np.abs(angs - th), np.pi - np.abs(angs - th)))
        assert np.degrees(err) < 2.0, (deg, np.degrees(err))


def test_empty_image():
    img = jnp.full((120, 160), 77.0)
    segs = edline.detect_edlines(img, jnp.float32(15.0), capacity=16)
    assert not bool(np.asarray(segs.valid).any())


def test_e2e_vo_with_edlines():
    """use_edlines=True runs the full pipeline and tracks the canyon."""
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.models import frontend
    from stvo_pl_tpu.ops import camera as cam_ops
    from stvo_pl_tpu.utils import metrics, world

    cam = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                               b=0.3, width=240, height=180)
    cfg = VOConfig(orb_nfeatures=300, orb_nlevels=2, lsd_nfeatures=48,
                   min_features=8, fast_feat_th=20, use_edlines=True)
    w = world.make_world(seed=31, length=40.0)
    poses = np.tile(np.eye(4), (8, 1, 1))
    poses[:, 2, 3] = 0.3 * np.arange(8)
    seq_l, seq_r = world.render_sequence(w, poses, cam)
    state = frontend.init_state(cfg)
    est, nls = [], []
    for i in range(8):
        state, t = frontend.vo_step(state, jnp.asarray(seq_l[i]),
                                    jnp.asarray(seq_r[i]), cam, cfg)
        est.append(np.asarray(t.Tfw))
        nls.append(int(t.n_lines))
    est = np.stack(est)
    assert max(nls[1:]) > 0   # line features actually flowed
    ate = metrics.ate_rmse(est, poses)
    assert ate < 0.15, ate
