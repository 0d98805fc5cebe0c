"""End-to-end on a DISTORTED synthetic dataset: raw images rendered through
radtan / equidistant lens models + a reference-schema dataset_params.yaml
(Kl/Kr/Dl/Dr/R/t) -> CLI -> rectification maps -> VO -> ATE.

Covers utils/dataset.py:calib_from_yaml + ops/camera.py:build_rectify_maps
as ONE path (reference pinholeStereoCamera.cpp:48-121 EuRoC ctor), i.e. the
Kl/Kr/R/t parsing and sign conventions that would otherwise only break
silently at runtime.  The renderer here projects points through the
distortion model DIRECTLY (forward model only — independent of the
library's map inversion), so a convention bug cannot cancel out.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.ops import se3
from stvo_pl_tpu.utils import synthetic

H_IMG, W_IMG = 180, 240
N_FRAMES = 5
BASELINE = 0.25

# left/right intrinsics deliberately unequal; principal point off-center
K_L = np.array([[165.0, 0.0, 123.0], [0.0, 163.0, 88.0], [0.0, 0.0, 1.0]])
K_R = np.array([[161.0, 0.0, 117.0], [0.0, 162.5, 92.0], [0.0, 0.0, 1.0]])

DIST = {
    "radtan": (np.array([-0.22, 0.06, 5e-4, -4e-4, 0.0]),
               np.array([-0.20, 0.05, -3e-4, 6e-4, 0.0])),
    "equidistant": (np.array([0.035, 0.004, -0.002, 0.001]),
                    np.array([0.030, 0.005, -0.001, 0.0015])),
}


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


# right camera pose in the left frame: baseline along +x plus a small
# verging rotation (what real rigs have; forces real rectification work)
R_LR = _rot_y(np.deg2rad(0.8)) @ _rot_y(np.deg2rad(-0.3)).T
T_LR = np.array([BASELINE, 0.004, -0.006])


def _project_distorted(Pc, K, d, model):
    """Forward distorted projection [N,3] camera points -> [N,2] pixels."""
    z = np.maximum(Pc[:, 2], 1e-6)
    xn = Pc[:, 0] / z
    yn = Pc[:, 1] / z
    fn = (cam_ops._distort_radtan if model == "radtan"
          else cam_ops._distort_equidistant)
    xd, yd = fn(xn, yn, d)
    return np.stack([K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]],
                    axis=-1)


def _render_distorted(scene, poses, model, d_l, d_r):
    """Render the sequence through the two DISTORTED cameras."""
    seq_l, seq_r = [], []
    P = np.asarray(scene.P, np.float64)
    sA = np.asarray(scene.sA, np.float64)
    sB = np.asarray(scene.sB, np.float64)
    for T_wc in np.asarray(poses, np.float64):
        T_cw = np.linalg.inv(T_wc)
        for eye, out in (("l", seq_l), ("r", seq_r)):
            Pc = P @ T_cw[:3, :3].T + T_cw[:3, 3]
            Ac = sA @ T_cw[:3, :3].T + T_cw[:3, 3]
            Bc = sB @ T_cw[:3, :3].T + T_cw[:3, 3]
            if eye == "r":
                # point in right cam = R_lr^T (Pc_left - t_lr)
                Pc = (Pc - T_LR) @ R_LR
                Ac = (Ac - T_LR) @ R_LR
                Bc = (Bc - T_LR) @ R_LR
            K, d = (K_L, d_l) if eye == "l" else (K_R, d_r)
            safe = lambda X: np.where(X[:, 2:3] > 0.5, X,
                                      np.array([0.0, 0.0, 1e3]))
            uv = _project_distorted(safe(Pc), K, d, model)
            uva = _project_distorted(safe(Ac), K, d, model)
            uvb = _project_distorted(safe(Bc), K, d, model)
            yy = np.arange(H_IMG, dtype=np.float32)[:, None]
            xx = np.arange(W_IMG, dtype=np.float32)[None, :]
            img = jnp.asarray(40.0 + 10.0 * (xx / W_IMG) + 6.0 * (yy / H_IMG))
            img = synthetic._splat_points(
                img, jnp.asarray(uv, jnp.float32),
                jnp.asarray(Pc[:, 2], jnp.float32), scene.tex,
                scene.brightness, H_IMG, W_IMG)
            vis = jnp.asarray((Ac[:, 2] > 0.5) & (Bc[:, 2] > 0.5))
            img = synthetic._draw_lines(
                img, jnp.asarray(uva, jnp.float32),
                jnp.asarray(uvb, jnp.float32), vis, scene.line_w,
                H_IMG, W_IMG)
            out.append(np.clip(np.asarray(img), 0, 255).astype(np.uint8))
    return seq_l, seq_r


def _write_dataset(root, model, d_l, d_r, seq_l, seq_r, poses):
    from PIL import Image
    from stvo_pl_tpu.utils import metrics
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()
    for i in range(N_FRAMES):
        Image.fromarray(seq_l[i]).save(root / "image_0" / f"{i:06d}.png")
        Image.fromarray(seq_r[i]).save(root / "image_1" / f"{i:06d}.png")
    # reference EuRoC-style schema: R, t map cam0 -> cam1
    R01 = R_LR.T
    t01 = -R_LR.T @ T_LR
    yam = [
        "images_subfolder_l: image_0/",
        "images_subfolder_r: image_1/",
        "cam0:",
        f"  cam_model: {'fisheye' if model == 'equidistant' else 'Pinhole'}",
        f"  cam_width: {W_IMG}",
        f"  cam_height: {H_IMG}",
        f"  Kl: [{K_L[0,0]}, {K_L[1,1]}, {K_L[0,2]}, {K_L[1,2]}]",
        f"  Kr: [{K_R[0,0]}, {K_R[1,1]}, {K_R[0,2]}, {K_R[1,2]}]",
        f"  Dl: [{', '.join(str(v) for v in d_l)}]",
        f"  Dr: [{', '.join(str(v) for v in d_r)}]",
        f"  R: [{', '.join(str(v) for v in R01.reshape(-1))}]",
        f"  t: [{', '.join(str(v) for v in t01)}]",
    ]
    (root / "dataset_params.yaml").write_text("\n".join(yam) + "\n")
    (root / "cfg.yaml").write_text(
        "orb_nfeatures: 300\norb_nlevels: 2\nlsd_nfeatures: 48\n"
        "min_features: 8\nfast_feat_th: 20\nlsd_n_dirs: 8\n")
    metrics.write_kitti(str(root / "gt.txt"), np.asarray(poses))


@pytest.mark.parametrize("model", ["radtan", "equidistant"])
def test_distorted_dataset_cli_e2e(model, tmp_path, capsys):
    d_l, d_r = DIST[model]
    key = jax.random.PRNGKey(11)
    scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(N_FRAMES, speed=0.25)
    seq_l, seq_r = _render_distorted(scene, poses, model, d_l, d_r)
    # sanity: distortion actually moved pixels (several px at the border)
    und = _project_distorted(np.array([[0.55, 0.35, 1.0]]), K_L,
                             np.zeros(5), "radtan")
    dis = _project_distorted(np.array([[0.55, 0.35, 1.0]]), K_L, d_l, model)
    assert np.linalg.norm(und - dis) > 2.0, (und, dis)

    root = tmp_path / model
    root.mkdir()
    _write_dataset(root, model, d_l, d_r, seq_l, seq_r, poses)

    from stvo_pl_tpu import cli
    est = cli.main([str(root), "-c", str(root / "cfg.yaml"), "--quiet",
                    "--gt", str(root / "gt.txt")])
    out = capsys.readouterr().out
    ate_lines = [l for l in out.splitlines() if "ATE" in l]
    assert len(ate_lines) == 1, out
    ate = float(ate_lines[0].split()[2])
    # rectified VO must track; alignment absorbs the rectifying rotation
    assert ate < 0.15, (model, ate_lines[0])
    assert np.isfinite(est).all()
    assert np.linalg.norm(est[-1][:3, 3]) > 0.05


def test_rectified_pair_is_row_aligned():
    """After build_rectify_maps + remap, corresponding scene points must
    land on (nearly) the same row in both rectified images — the epipolar
    property the VO's 1-D disparity search depends on."""
    model = "radtan"
    d_l, d_r = DIST[model]
    map_l, map_r, cam = cam_ops.build_rectify_maps(
        K_L, d_l, K_R, d_r, R_LR, T_LR, W_IMG, H_IMG, model=model)
    # world points in the left camera frame
    rng = np.random.default_rng(5)
    Pw = np.stack([rng.uniform(-2, 2, 40), rng.uniform(-1.5, 1.5, 40),
                   rng.uniform(4.0, 12.0, 40)], axis=-1)
    # project through the RECTIFIED left/right cameras analytically:
    # rectified frames are the original frames rotated by R_l / R_r
    R_l, R_r = cam_ops._rectifying_rotations(R_LR, T_LR)
    P_lrect = Pw @ R_l.T
    P_r = (Pw - T_LR) @ R_LR      # right-camera frame
    P_rrect = P_r @ R_r.T
    ul = cam.fx * P_lrect[:, 0] / P_lrect[:, 2] + cam.cx
    vl = cam.fy * P_lrect[:, 1] / P_lrect[:, 2] + cam.cy
    vr = cam.fy * P_rrect[:, 1] / P_rrect[:, 2] + cam.cy
    keep = (np.abs(ul - cam.cx) < W_IMG / 2) & (np.abs(vl - cam.cy) < H_IMG / 2)
    assert keep.sum() > 10
    np.testing.assert_allclose(vl[keep], vr[keep], atol=0.05)
