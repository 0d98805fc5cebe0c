"""Offline visualization: trajectory, covariance, feature overlays.

Capability replacement for the reference's optional MRPT live scene
(src/sceneRepresentation.cpp:263-504 — trajectory line, covariance
ellipsoid, camera frustum, image + feature overlay) as offline matplotlib
renders; no GUI dependency.
"""

from __future__ import annotations

import numpy as np


def plot_run(path: str, poses: np.ndarray, stats: list[dict] | None = None,
             gt_poses: np.ndarray | None = None):
    """Trajectory top-down + stats panel (the MRPT scene, offline)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3 if stats else 1, figsize=(15, 5))
    axes = np.atleast_1d(axes)

    ax = axes[0]
    xyz = poses[:, :3, 3]
    ax.plot(xyz[:, 0], xyz[:, 2], "-", lw=1.5, label="estimate")
    if gt_poses is not None:
        g = gt_poses[:, :3, 3]
        ax.plot(g[:, 0], g[:, 2], "--", lw=1.0, label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.axis("equal")
    ax.legend()
    ax.set_title("trajectory (top-down)")

    if stats:
        errs = [s["err"] for s in stats]
        ms = [s["ms"] for s in stats]
        npt = [s["npt"] for s in stats]
        nls = [s["nls"] for s in stats]
        axes[1].plot(errs, lw=0.8)
        axes[1].set_title("residual norm")
        axes[1].set_xlabel("frame")
        axes[2].plot(npt, lw=0.8, label="pt inliers")
        axes[2].plot(nls, lw=0.8, label="ls inliers")
        axes[2].set_title("inlier counts")
        axes[2].set_xlabel("frame")
        axes[2].legend()

    fig.tight_layout()
    fig.savefig(path, dpi=110)
    import matplotlib.pyplot as plt
    plt.close(fig)


def plot_frame_features(path: str, img: np.ndarray, points=None, lines=None):
    """Feature overlay on one image (reference plotStereoFrame,
    src/stereoFrame.cpp:618-663)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(img, cmap="gray", vmin=0, vmax=255)
    if points is not None:
        uv = np.asarray(points.uv)[np.asarray(points.valid)]
        ax.plot(uv[:, 0], uv[:, 1], "o", ms=2.5, mfc="none", mec="lime",
                mew=0.8)
    if lines is not None:
        v = np.asarray(lines.valid)
        sp = np.asarray(lines.spl)[v]
        ep = np.asarray(lines.epl)[v]
        for a, b in zip(sp, ep):
            ax.plot([a[0], b[0]], [a[1], b[1]], "-", color="red", lw=1.0)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
