"""CLI end-to-end on an on-disk dataset: images + dataset_params.yaml ->
trajectory files + plot.  Exercises the whole reference app surface
(app/imagesStVO.cpp:39-136): dataset discovery, numeric sort, decimation,
config loading, per-frame telemetry, trajectory output."""

import os

import numpy as np
import pytest
import jax

from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.utils import synthetic

CAM = cam_ops.StereoCamera(fx=160.0, fy=160.0, cx=120.0, cy=90.0,
                           b=0.3, width=240, height=180)
N_FRAMES = 5


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("kitti_like")
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()

    key = jax.random.PRNGKey(3)
    scene = synthetic.make_scene(key, n_points=260, n_lines=24,
                                 extent=(14.0, 8.0, 40.0), z_near=3.0)
    poses = synthetic.smooth_trajectory(N_FRAMES, speed=0.25)
    seq_l, seq_r = synthetic.render_sequence(scene, poses, CAM)
    for i in range(N_FRAMES):
        for sub, seq in (("image_0", seq_l), ("image_1", seq_r)):
            arr = np.clip(np.asarray(seq[i]), 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(root / sub / f"{i:06d}.png")

    (root / "dataset_params.yaml").write_text(
        "images_subfolder_l: image_0/\n"
        "images_subfolder_r: image_1/\n"
        "cam0:\n"
        "  cam_model: Pinhole\n"
        f"  cam_width: {CAM.width}\n"
        f"  cam_height: {CAM.height}\n"
        f"  cam_fx: {CAM.fx}\n"
        f"  cam_fy: {CAM.fy}\n"
        f"  cam_cx: {CAM.cx}\n"
        f"  cam_cy: {CAM.cy}\n"
        "  cam_d0: 0.0\n  cam_d1: 0.0\n  cam_d2: 0.0\n  cam_d3: 0.0\n"
        f"  cam_bl: {CAM.b}\n")

    (root / "cfg.yaml").write_text(
        "orb_nfeatures: 300\norb_nlevels: 2\nlsd_nfeatures: 48\n"
        "min_features: 8\nfast_feat_th: 20\nlsd_n_dirs: 8\n")

    from stvo_pl_tpu.utils import metrics
    metrics.write_kitti(str(root / "gt.txt"), np.asarray(poses))
    return root


def test_cli_full_run(dataset_dir, tmp_path, capsys):
    from stvo_pl_tpu import cli
    traj = tmp_path / "traj_tum.txt"
    kitti = tmp_path / "traj_kitti.txt"
    plot = tmp_path / "run.png"
    poses = cli.main([str(dataset_dir), "-c", str(dataset_dir / "cfg.yaml"),
                      "-t", str(traj), "--kitti-out", str(kitti),
                      "--plot", str(plot), "--quiet",
                      "--gt", str(dataset_dir / "gt.txt")])
    # GT evaluation printed an ATE line with a sane value
    out = capsys.readouterr().out
    ate_lines = [l for l in out.splitlines() if "ATE" in l]
    assert len(ate_lines) == 1, out
    ate = float(ate_lines[0].split()[2])
    assert ate < 0.2, ate_lines[0]
    assert poses.shape == (N_FRAMES, 4, 4)
    assert np.isfinite(poses).all()
    # some actual motion was estimated
    assert np.linalg.norm(poses[-1][:3, 3]) > 0.05
    # TUM: one line of 8 floats per frame
    lines = traj.read_text().strip().splitlines()
    assert len(lines) == N_FRAMES and len(lines[0].split()) == 8
    # KITTI: 12 floats per frame
    klines = kitti.read_text().strip().splitlines()
    assert len(klines) == N_FRAMES and len(klines[0].split()) == 12
    assert plot.stat().st_size > 0


def test_prefetch_matches_python_path(dataset_dir):
    from stvo_pl_tpu.utils.dataset import ImageSequence
    seq = ImageSequence(str(dataset_dir))
    py = list(seq)
    nat = list(seq.prefetch())
    assert len(py) == len(nat) == N_FRAMES
    for (pl, pr), (ql, qr) in zip(py, nat):
        np.testing.assert_allclose(pl, ql, atol=1.0)
        np.testing.assert_allclose(pr, qr, atol=1.0)


def test_cli_decimation(dataset_dir):
    from stvo_pl_tpu import cli
    poses = cli.main([str(dataset_dir), "-c", str(dataset_dir / "cfg.yaml"),
                      "-o", "1", "-s", "2", "--quiet"])
    # frames 1, 3 of 5
    assert poses.shape[0] == 2


def test_cli_ba_window(dataset_dir, tmp_path, capsys):
    """--ba-window drives the windowed-BA back end from the CLI and emits
    a refined trajectory + second ATE line."""
    from stvo_pl_tpu import cli
    traj = tmp_path / "traj_ba.txt"
    cli.main([str(dataset_dir), "-c", str(dataset_dir / "cfg.yaml"),
              "-t", str(traj), "--quiet", "--gt", str(dataset_dir / "gt.txt"),
              "--ba-window", "4", "--ba-kf-every", "1"])
    out = capsys.readouterr().out
    assert "BA:" in out and "window(s) refined" in out
    ate_lines = [l for l in out.splitlines() if "ATE" in l]
    assert len(ate_lines) == 2, out
    ate_ref = float(ate_lines[1].split()[-2])
    assert np.isfinite(ate_ref) and ate_ref < 0.5
    refined = (tmp_path / "traj_ba.txt.refined")
    assert refined.exists()
    assert len(refined.read_text().strip().splitlines()) == N_FRAMES


def test_cli_scene_html(dataset_dir, tmp_path):
    """--scene writes a self-contained interactive HTML (MRPT scene
    parity: trajectory + frustums + KF markers + cov ellipsoid + image
    viewport, sceneRepresentation.cpp:263-504)."""
    from stvo_pl_tpu import cli
    out = tmp_path / "scene.html"
    cli.main([str(dataset_dir), "-c", str(dataset_dir / "cfg.yaml"),
              "--quiet", "--gt", str(dataset_dir / "gt.txt"),
              "--scene", str(out)])
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    for token in ["frustum", "ellipsoid", "data:image/png;base64,",
                  '"kf"', '"gt"', "orbit"]:
        assert token in html, token
    # embedded data parses back as JSON
    import json, re
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert len(data["pos"]) == N_FRAMES
    assert data["gt"] is not None and len(data["imgs"]) >= 1


def test_cli_scene_live_updates(dataset_dir, tmp_path):
    """--scene-every rewrites the scene DURING the run (the headless
    analogue of the reference's live MRPT scene): the mid-run file must
    exist with a partial trajectory before the final write lands."""
    import json
    import re
    from stvo_pl_tpu import cli
    out = tmp_path / "live.html"
    # patch write_scene_html to snapshot intermediate trajectory lengths
    from stvo_pl_tpu.utils import scene_html
    lengths = []
    orig = scene_html.write_scene_html

    def spy(path, poses, *a, **kw):
        lengths.append(len(poses))
        return orig(path, poses, *a, **kw)

    scene_html.write_scene_html = spy
    try:
        cli.main([str(dataset_dir), "-c", str(dataset_dir / "cfg.yaml"),
                  "--quiet", "--scene", str(out), "--scene-every", "2"])
    finally:
        scene_html.write_scene_html = orig
    # live rewrites happened with growing partial trajectories, final last
    assert len(lengths) >= 2, lengths
    assert lengths[:-1] == sorted(lengths[:-1]) and lengths[0] < N_FRAMES
    assert lengths[-1] == N_FRAMES
    m = re.search(r"const D = (\{.*?\});\n", out.read_text(), re.S)
    assert len(json.loads(m.group(1))["pos"]) == N_FRAMES
