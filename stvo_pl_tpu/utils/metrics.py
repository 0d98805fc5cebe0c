"""Trajectory evaluation: ATE / RPE, the parity metrics of BASELINE.json.

The reference repo ships no evaluation code (SURVEY.md §6); these are the
standard KITTI/TUM definitions implemented in numpy (host-side, tiny data).
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(X: np.ndarray, Y: np.ndarray, with_scale=False):
    """Least-squares similarity/rigid transform aligning X -> Y.

    X, Y: [N, 3].  Returns (s, R, t) with Y ~ s R X + t.
    """
    mx = X.mean(0)
    my = Y.mean(0)
    Xc = X - mx
    Yc = Y - my
    C = Yc.T @ Xc / len(X)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (Xc ** 2).sum() / len(X)
        s = float(np.trace(np.diag(D) @ S) / var)
    else:
        s = 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray,
             align: bool = True) -> float:
    """Absolute trajectory error (RMSE of translation) after rigid alignment.

    est_poses, gt_poses: [T, 4, 4] camera-to-world.
    """
    Xe = est_poses[:, :3, 3]
    Xg = gt_poses[:, :3, 3]
    if align:
        s, R, t = umeyama_alignment(Xe, Xg)
        Xa = (s * (R @ Xe.T)).T + t
    else:
        Xa = Xe
    return float(np.sqrt(np.mean(np.sum((Xa - Xg) ** 2, axis=-1))))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over a frame delta: (trans_rmse [m],
    rot_rmse [deg])."""
    t_errs, r_errs = [], []
    for i in range(len(est_poses) - delta):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        err = np.linalg.inv(dg) @ de
        t_errs.append(np.linalg.norm(err[:3, 3]))
        c = np.clip((np.trace(err[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        r_errs.append(np.degrees(np.arccos(c)))
    return (float(np.sqrt(np.mean(np.square(t_errs)))),
            float(np.sqrt(np.mean(np.square(r_errs)))))


def trajectory_length(poses: np.ndarray) -> float:
    d = np.diff(poses[:, :3, 3], axis=0)
    return float(np.linalg.norm(d, axis=-1).sum())


def write_tum(path: str, poses: np.ndarray, stamps=None):
    """TUM trajectory format: t x y z qx qy qz qw."""
    from scipy.spatial.transform import Rotation
    with open(path, "w") as f:
        for i, T in enumerate(poses):
            q = Rotation.from_matrix(T[:3, :3]).as_quat()
            ts = i if stamps is None else stamps[i]
            f.write(f"{ts} {T[0,3]} {T[1,3]} {T[2,3]} "
                    f"{q[0]} {q[1]} {q[2]} {q[3]}\n")


def write_kitti(path: str, poses: np.ndarray):
    """KITTI trajectory format: 12 floats per row (3x4 row-major)."""
    with open(path, "w") as f:
        for T in poses:
            f.write(" ".join(f"{v:.9e}" for v in T[:3, :4].reshape(-1))
                    + "\n")


def read_kitti(path: str) -> np.ndarray:
    """KITTI trajectory file (12 floats per row) -> [T, 4, 4]."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, :4] = rows
    return poses


def read_tum(path: str) -> np.ndarray:
    """TUM trajectory file (t x y z qx qy qz qw) -> [T, 4, 4]."""
    from scipy.spatial.transform import Rotation
    rows = np.loadtxt(path).reshape(-1, 8)
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, 3] = rows[:, 1:4]
    poses[:, :3, :3] = Rotation.from_quat(rows[:, 4:8]).as_matrix()
    return poses


def read_trajectory(path: str) -> np.ndarray:
    """Load a trajectory file, auto-detecting KITTI (12 cols) vs TUM
    (8 cols) layout."""
    first = np.loadtxt(path, max_rows=1)
    n = first.size
    if n == 12:
        return read_kitti(path)
    if n == 8:
        return read_tum(path)
    raise ValueError(f"{path}: expected 12 (KITTI) or 8 (TUM) columns, "
                     f"got {n}")
