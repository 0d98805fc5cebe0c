"""Windowed-BA back end driven by the live VO loop.

The reference exposes keyframe hooks (needNewKF/currFrameIsKF,
src/stereoFrameHandler.cpp:1136-1218) so an external SLAM layer can refine
the trajectory; here the back end is in-process: a keyframe ring collects
(pose, stereo-point snapshot) pairs whenever the front end flags a KF, and
every full window is jointly refined with the Schur-complement BA
(parallel/window.py + parallel/ba.py).  Windows are CHAINED — the last
(refined) keyframe of one window anchors the next (gauge holds pose 0
fixed) — so drift corrections compose along the trajectory.

Use from the CLI via --ba-window K, or directly:

    backend = WindowedBA(cam, cfg, window=4)
    for each frame: backend.observe(i, telem.Tfw, telem.is_kf, state.prev_points)
    refined = backend.apply(np.stack(raw_poses))
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from stvo_pl_tpu.config import VOConfig
from stvo_pl_tpu.models.features import PointSet
from stvo_pl_tpu.ops import camera as cam_ops
from stvo_pl_tpu.parallel import window as window_mod


class WindowedBA:
    """Keyframe ring + chained window refinement.

    force_kf_every > 0 additionally promotes every Nth frame to a keyframe
    (useful when the entropy-ratio policy fires rarely on short runs).
    """

    def __init__(self, cam: cam_ops.StereoCamera, cfg: VOConfig,
                 window: int = 4, n_iters: int = 8,
                 force_kf_every: int = 0, multi_anchor: bool = True,
                 use_lines: bool = True, max_correction: float = 1.0,
                 max_rot_correction: float = 15.0, auto_lines: bool = True,
                 chi2_tol: float = 1.10, max_disagree_t: float = 0.25,
                 max_disagree_r: float = 1.0):
        self.cam = cam
        self.cfg = cfg
        self.window = window
        self.n_iters = n_iters
        self.force_kf_every = force_kf_every
        self.multi_anchor = multi_anchor
        self.use_lines = use_lines
        # automatic per-window line trust (window.refine_window_auto):
        # solve points-only AND points+lines, accept lines only when the
        # point-residual chi-square does not degrade — the window-level
        # isGoodSolution analogue.  auto_lines=False forces the joint
        # solve unconditionally (pre-round-5 behavior, A/B escape hatch).
        self.auto_lines = auto_lines
        self.chi2_tol = chi2_tol
        self.max_disagree_t = max_disagree_t
        self.max_disagree_r = max_disagree_r
        self.n_lines_rejected = 0
        # per-window trust gate: the largest translation / rotation any
        # window may move a keyframe.  The VO front end drifts ~1% of
        # path, so a legitimate within-window correction is centimeters
        # and fractions of a degree; a refinement asking for more is
        # being dragged by corrupted tracks (the adversarial
        # exposure-swing scene produces exactly this).  Such windows are
        # SKIPPED — raw poses kept, chain undisturbed.  The rotation gate
        # exists because a rotation-only corruption passes a
        # translation-only gate yet pollutes the cumulative chain.
        # Sizing (round 5): jittery-but-legitimate VO rotation error runs
        # ~1 deg/frame on the textured 1000-frame scene, so a 40-frame
        # window legitimately asks for multi-degree rotation fixes — a
        # 5-deg gate skipped 40/67 windows there and LOST 6 m of refined
        # drift (8.88 vs 2.8 m); corrupted line-track windows request
        # tens of degrees.  15 deg separates the two populations; the
        # line-specific corruption is caught earlier by the auto_lines
        # points-vs-joint disagreement test anyway.
        self.max_correction = max_correction
        self.max_rot_correction = max_rot_correction
        self.n_skipped = 0
        # wall-clock seconds per _refine call; [0] includes the jit compile
        self.refine_times: list[float] = []
        # ring entries: (frame_idx, T_corrected [4,4] np, T_raw, PointSet,
        #                LineSet | None)
        self._ring: list[tuple] = []
        # refinement events: (kf_indices, corrections C_k [K,4,4])
        self.events: list[tuple[list[int], np.ndarray]] = []
        self._frames_since_kf = 0
        self._n_frames = 0
        self._C = np.eye(4)     # cumulative correction for incoming poses

    def observe(self, frame_idx: int, Tfw, is_kf, points: PointSet,
                lines=None):
        """Feed one frame's outcome; returns (kf_indices, refined_poses)
        when a window was just refined, else None.  Pass the frame's
        LineSet to include line-endpoint landmarks in the refinement
        (use_lines=False drops them for A/B comparison)."""
        self._n_frames = max(self._n_frames, frame_idx + 1)
        take = frame_idx == 0 or bool(is_kf)
        if self.force_kf_every > 0:
            take = take or self._frames_since_kf + 1 >= self.force_kf_every
        self._frames_since_kf = 0 if take else self._frames_since_kf + 1
        if not take:
            return None
        T_raw = np.asarray(Tfw, dtype=np.float64)
        T_in = self._C @ T_raw
        snap = jax.tree_util.tree_map(jnp.asarray, points)
        lsnap = None
        if self.use_lines and lines is not None:
            lsnap = jax.tree_util.tree_map(jnp.asarray, lines)
        self._ring.append((frame_idx, T_in, T_raw, snap, lsnap))
        if len(self._ring) == self.window:
            return self._refine()
        return None

    def _refine(self):
        import time
        t0 = time.perf_counter()
        kfs = [(jnp.asarray(T_in), pts, ls)
               for _, T_in, _, pts, ls in self._ring]
        win = window_mod.stack_keyframes(kfs)
        if win.lines is not None and self.auto_lines:
            Tfw_new, _, costs, used_lines = window_mod.refine_window_auto(
                win, self.cam, self.cfg, n_iters=self.n_iters,
                multi_anchor=self.multi_anchor, chi2_tol=self.chi2_tol,
                max_disagree_t=self.max_disagree_t,
                max_disagree_r=self.max_disagree_r)
            if not bool(used_lines):
                self.n_lines_rejected += 1
        else:
            Tfw_new, _, costs = window_mod.refine_window(
                win, self.cam, self.cfg, n_iters=self.n_iters,
                multi_anchor=self.multi_anchor)
        Tfw_new = np.asarray(Tfw_new, dtype=np.float64)
        self.refine_times.append(time.perf_counter() - t0)
        idxs = [i for i, *_ in self._ring]
        # trust gate on the WITHIN-WINDOW increment (refined vs the
        # window's own input poses — cumulative chain corrections are
        # excluded); oversized requests mean corrupted tracks
        incs = [Tfw_new[k] @ np.linalg.inv(self._ring[k][1])
                for k in range(len(idxs))]
        inc_t = max(np.linalg.norm(M[:3, 3]) for M in incs)
        inc_r = max(np.degrees(np.arccos(np.clip(
            (np.trace(M[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))) for M in incs)
        if inc_t > self.max_correction or inc_r > self.max_rot_correction:
            self.n_skipped += 1
            last = self._ring[-1]
            self._ring = [last]
            return None
        # per-KF output correction vs the RAW trajectory
        C = np.stack([Tfw_new[k] @ np.linalg.inv(self._ring[k][2])
                      for k in range(len(idxs))])
        self.events.append((idxs, C))
        # chain: refined last KF anchors the next window
        last_idx, _, last_raw, last_pts, last_ls = self._ring[-1]
        self._C = Tfw_new[-1] @ np.linalg.inv(last_raw)
        self._ring = [(last_idx, Tfw_new[-1], last_raw, last_pts, last_ls)]
        return idxs, Tfw_new

    def apply(self, poses: np.ndarray) -> np.ndarray:
        """Correct a raw trajectory [T, 4, 4].  Keyframe corrections are
        interpolated along se(3) between consecutive KFs (piecewise-constant
        corrections would kink the trajectory at every KF); the last
        correction extends unchanged to the end of the run."""
        from stvo_pl_tpu.ops import se3 as se3_ops
        import jax.numpy as jnp

        out = np.array(poses, dtype=np.float64, copy=True)
        # flatten events into ordered (kf_frame, C) knots
        segs: list[tuple[int, np.ndarray]] = []
        for idxs, C in self.events:
            for k, i0 in enumerate(idxs):
                if segs and segs[-1][0] == i0:
                    segs[-1] = (i0, C[k])   # shared anchor: same correction
                else:
                    segs.append((i0, C[k]))
        for s, (i0, C0) in enumerate(segs):
            if s + 1 < len(segs):
                i1, C1 = segs[s + 1]
                d = np.asarray(se3_ops.logmap_se3(jnp.asarray(
                    (C1 @ np.linalg.inv(C0)).astype(np.float32))))
                for i in range(i0, i1):
                    a = (i - i0) / float(i1 - i0)
                    Ci = np.asarray(se3_ops.expmap_se3(
                        jnp.asarray(a * d, jnp.float32)),
                        dtype=np.float64) @ C0
                    out[i] = Ci @ out[i]
            else:
                out[i0:] = C0[None] @ out[i0:]
        return out
