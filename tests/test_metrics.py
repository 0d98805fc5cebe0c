"""Unit tests for trajectory metrics (utils/metrics.py).

The reference ships no evaluation code (SURVEY.md §6); these pin the
standard KITTI/TUM ATE/RPE definitions our benchmarks depend on.
"""

import numpy as np
import pytest

from stvo_pl_tpu.utils import metrics


def _traj(n=40, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4), (n, 1, 1))
    t = np.cumsum(rng.normal(0, 0.3, (n, 3)), axis=0)
    poses[:, :3, 3] = t
    # small random rotations composed along the path
    ang = np.cumsum(rng.normal(0, 0.02, n))
    for i in range(n):
        c, s = np.cos(ang[i]), np.sin(ang[i])
        poses[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return poses


def _rigid(seed=1, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(0, 5.0, 3)
    return scale * Q, t, Q


def test_umeyama_recovers_rigid_transform():
    X = np.random.default_rng(2).normal(size=(50, 3))
    sR, t, R = _rigid(seed=3)
    Y = X @ R.T + t
    s_est, R_est, t_est = metrics.umeyama_alignment(X, Y)
    assert s_est == 1.0
    np.testing.assert_allclose(R_est, R, atol=1e-9)
    np.testing.assert_allclose(t_est, t, atol=1e-9)


def test_umeyama_with_scale():
    X = np.random.default_rng(4).normal(size=(50, 3))
    _, t, R = _rigid(seed=5)
    Y = 2.5 * X @ R.T + t
    s, R_est, t_est = metrics.umeyama_alignment(X, Y, with_scale=True)
    assert abs(s - 2.5) < 1e-9
    np.testing.assert_allclose((s * (R_est @ X.T)).T + t_est, Y, atol=1e-8)


def test_ate_zero_for_identical_and_invariant_to_rigid_offset():
    poses = _traj()
    assert metrics.ate_rmse(poses, poses) < 1e-12
    # a rigidly transformed estimate aligns back to zero error
    _, t, R = _rigid(seed=6)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    est = np.einsum("ij,njk->nik", T, poses)
    assert metrics.ate_rmse(est, poses, align=True) < 1e-9
    assert metrics.ate_rmse(est, poses, align=False) > 1.0


def test_ate_known_magnitude_without_alignment():
    poses = _traj()
    est = poses.copy()
    est[:, 0, 3] += 0.5  # constant 0.5 m offset -> RMSE exactly 0.5
    assert abs(metrics.ate_rmse(est, poses, align=False) - 0.5) < 1e-12


def test_rpe_perfect_and_perturbed():
    poses = _traj()
    t_rmse, r_rmse = metrics.rpe(poses, poses)
    assert t_rmse < 1e-12 and r_rmse < 1e-6
    # pure-translation trajectory with an extra 10 mm z step per frame:
    # every relative pose is off by exactly 10 mm
    straight = np.tile(np.eye(4), (20, 1, 1))
    straight[:, 2, 3] = np.arange(20) * 0.5
    est = straight.copy()
    est[:, 2, 3] += np.arange(20) * 0.01
    t_rmse, _ = metrics.rpe(est, straight, delta=1)
    assert abs(t_rmse - 0.01) < 1e-12


def test_trajectory_length_straight_line():
    poses = np.tile(np.eye(4), (11, 1, 1))
    poses[:, 2, 3] = np.linspace(0, 10, 11)
    assert abs(metrics.trajectory_length(poses) - 10.0) < 1e-12


def test_write_kitti_roundtrip(tmp_path):
    poses = _traj(n=7)
    p = tmp_path / "traj.txt"
    metrics.write_kitti(str(p), poses)
    rows = np.loadtxt(p).reshape(-1, 3, 4)
    np.testing.assert_allclose(rows, poses[:, :3, :4], rtol=1e-8)


def test_read_trajectory_autodetect(tmp_path):
    pytest.importorskip("scipy")
    poses = _traj(n=6)
    pk = tmp_path / "k.txt"
    pt = tmp_path / "t.txt"
    metrics.write_kitti(str(pk), poses)
    metrics.write_tum(str(pt), poses)
    np.testing.assert_allclose(metrics.read_trajectory(str(pk)), poses,
                               atol=1e-8)
    np.testing.assert_allclose(metrics.read_trajectory(str(pt)), poses,
                               atol=1e-9)
    bad = tmp_path / "bad.txt"
    bad.write_text("1 2 3\n")
    with pytest.raises(ValueError, match="12 .* or 8"):
        metrics.read_trajectory(str(bad))


def test_write_tum_roundtrip(tmp_path):
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation
    poses = _traj(n=7)
    p = tmp_path / "traj_tum.txt"
    metrics.write_tum(str(p), poses)
    rows = np.loadtxt(p)
    assert rows.shape == (7, 8)
    np.testing.assert_allclose(rows[:, 1:4], poses[:, :3, 3], atol=1e-9)
    for i in range(7):
        R = Rotation.from_quat(rows[i, 4:8]).as_matrix()
        np.testing.assert_allclose(R, poses[i, :3, :3], atol=1e-9)


def test_associate_by_stamps_nearest_neighbor():
    # 100 Hz GT vs 30 Hz frames (real TUM groundtruth.txt geometry)
    gt_stamps = 1000.0 + np.arange(500) * 0.01
    frame_stamps = 1000.05 + np.arange(60) / 30.0
    idx = metrics.associate_by_stamps(gt_stamps, frame_stamps)
    assert idx.shape == (60,)
    assert np.all(np.abs(gt_stamps[idx] - frame_stamps) <= 0.005 + 1e-9)


def test_associate_by_stamps_rejects_unit_mismatch():
    gt_stamps = 1.4e9 + np.arange(100) * 1e7     # ns-style
    frame_stamps = 1000.0 + np.arange(10) / 30.0  # seconds
    with pytest.raises(ValueError, match="overlap"):
        metrics.associate_by_stamps(gt_stamps, frame_stamps)


def test_associate_by_stamps_rejects_loose_match():
    gt_stamps = np.arange(10) * 10.0   # one row every 10 s
    frame_stamps = 2.0 + np.arange(5)  # frames fall far from GT rows
    with pytest.raises(ValueError, match="too loose"):
        metrics.associate_by_stamps(gt_stamps, frame_stamps)


def test_read_tum_stamps_and_quat_normalization(tmp_path):
    pytest.importorskip("scipy")
    poses = _traj(n=5)
    p = tmp_path / "t.txt"
    stamps = 1000.0 + np.arange(5) * 0.05
    metrics.write_tum(str(p), poses, stamps=stamps)
    # denormalize the quaternions in place to mimic mocap rounding drift
    rows = np.loadtxt(p)
    rows[:, 4:8] *= 1.02
    np.savetxt(p, rows)
    out, got = metrics.read_tum(str(p), return_stamps=True)
    np.testing.assert_allclose(got, stamps, atol=1e-6)
    np.testing.assert_allclose(out, poses, atol=1e-6)
    # read_trajectory passes stamps through; KITTI has none
    _, s2 = metrics.read_trajectory(str(p), return_stamps=True)
    np.testing.assert_allclose(s2, stamps, atol=1e-6)
    pk = tmp_path / "k.txt"
    metrics.write_kitti(str(pk), poses)
    _, s3 = metrics.read_trajectory(str(pk), return_stamps=True)
    assert s3 is None
