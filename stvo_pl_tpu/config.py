"""Frozen, hashable VO configuration.

The reference keeps a process-wide mutable singleton with ~50 tunables read
through static accessors at every use site (reference `src/config.cpp:36-113`,
`include/config.h:34-105`).  Under XLA everything inside `jit` is traced once,
so instead we freeze the configuration into an immutable dataclass that is
passed as a *static* argument: every parameter becomes a compile-time constant
and XLA constant-folds all gates (has_points/has_lines, thresholds, budgets).

Defaults replicate the reference defaults at `src/config.cpp:36-113`.
YAML override-with-fallback mirrors `Config::loadFromFile`
(`src/config.cpp:123-206`): unknown keys are ignored, missing keys keep
defaults.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Mapping


@dataclass(frozen=True)
class VOConfig:
    # ---- keyframe decision (SLAM hooks) --------------------------------
    min_entropy_ratio: float = 0.85
    max_kf_t_dist: float = 5.0
    max_kf_r_dist: float = 15.0

    # ---- StVO-PL options ----------------------------------------------
    has_points: bool = True
    has_lines: bool = True
    use_fld_lines: bool = False      # alt line-detector path (kept for parity)
    # lr_in_parallel / pl_in_parallel: the reference forks std::async tasks
    # (src/stereoFrame.cpp:62-92).  Here L/R are a batch axis and points/lines
    # are independent subgraphs of one XLA program, so the flags are moot; we
    # keep them for config-file compatibility but they change nothing.
    lr_in_parallel: bool = True
    pl_in_parallel: bool = True
    best_lr_matches: bool = True     # mutual-consistency check in matching
    adaptative_fast: bool = True     # adaptive FAST threshold controller
    use_motion_model: bool = False   # constant-velocity motion prior

    # ---- tracking: point features -------------------------------------
    max_dist_epip: float = 1.0       # max epipolar distance [px]
    min_disp: float = 1.0            # min disparity
    min_ratio_12_p: float = 0.9      # NN ratio test for points

    # ---- tracking: line features --------------------------------------
    line_sim_th: float = 0.75        # cosine direction-similarity threshold
    stereo_overlap_th: float = 0.75
    f2f_overlap_th: float = 0.75
    min_line_length: float = 0.025   # relative to min(img_w, img_h)
    line_horiz_th: float = 0.1       # reject near-horizontal lines [px]
    min_ratio_12_l: float = 0.9      # NN ratio test for lines
    ls_min_disp_ratio: float = 0.7   # min(disp_s,disp_e)/max(...) consistency

    # ---- adaptive FAST ------------------------------------------------
    fast_min_th: int = 5
    fast_max_th: int = 50
    fast_inc_th: int = 5
    fast_feat_th: int = 50
    fast_err_th: float = 0.5

    # ---- rgbd ---------------------------------------------------------
    rgbd_min_depth: float = 0.3
    rgbd_max_depth: float = 10.0

    # ---- optimization -------------------------------------------------
    homog_th: float = 1e-7
    min_features: int = 10
    max_iters: int = 5
    max_iters_ref: int = 10
    min_error: float = 1e-7
    min_error_change: float = 1e-7
    inlier_k: float = 4.0
    # solver mode: 0 = GN, 1 = robust GN (MAD-scaled Cauchy), 2 = LM
    # (hardcoded `mode` at reference src/stereoFrameHandler.cpp:329)
    optim_mode: int = 0
    # robust kernel: "cauchy" (reference default) | "tukey" | "huber" |
    # "welsch" | "parabola" (variants kept commented in src/auxiliar.cpp:556-583)
    robust_kernel: str = "cauchy"

    # ---- matching windows ---------------------------------------------
    matching_strategy: int = 0
    # feature count at/above which the brute-force matchers auto-switch to
    # the model-axis-sharded TP path when the step runs on a mesh with a
    # model axis (parallel/tp.py tp_match_inner).  4096 ~ where the O(N*M)
    # distance matrix outweighs the duplicated per-device front end.
    tp_min_features: int = 4096
    matching_s_ws: int = 10          # stereo search window [grid cells]
    matching_f2f_ws: int = 3         # f2f search window [grid cells]

    # ---- ORB-equivalent point detector --------------------------------
    orb_nfeatures: int = 1200
    orb_scale_factor: float = 1.2
    orb_nlevels: int = 4
    orb_edge_th: int = 19
    orb_wta_k: int = 2
    orb_score: int = 1               # 0 = Harris, 1 = FAST score
    orb_patch_size: int = 31
    orb_fast_th: int = 20

    # ---- LSD-equivalent line detector ---------------------------------
    lsd_nfeatures: int = 300
    lsd_refine: int = 0
    # lsd_scale is HONORED (cv::LSD semantics: detect on a resampled image,
    # map endpoints back — models/frame.py detect_lines_scaled) but defaults
    # to 1.0 here, diverging from the reference's 1.2: upsampled detection
    # exists in cv to recover sub-pixel geometry, which this detector gets
    # natively from its least-squares refinement; measured with 1.2 active
    # the TPU bench LOSES both speed and accuracy (293.7 fps / ATE 0.0429
    # vs 313-317 / 0.0371 — BASELINE.md round-3 log).
    lsd_scale: float = 1.0
    lsd_sigma_scale: float = 0.6
    # multi-octave detection (LSDDetectorC::detect numOctaves,
    # 3rdparty/.../LSDDetector_custom.cpp:56-73,259-308): Gaussian pyramid
    # with ratio 2, per-octave detect + per-octave LBD gradients, endpoints
    # rescaled to octave 0.  The reference StVO always calls octaves=1
    # (src/stereoFrame.cpp:230); >1 runs the one-pass ATLAS formulation
    # (models/frame.py detect_lines_octaves) that detects the long
    # off-bin lines the full-res dense detector fragments.
    #
    # DEFAULT 3 since round 5 — the single shipping config now holds the
    # reference-parity north star on BOTH headline scenes at once
    # (stamps 0.0384 vs reference 0.0417; textured60 0.016-0.018 vs
    # reference 0.0121 where the dense TPU path degrades to 0.17) at
    # 222 fps/chip, bench ATE 0.0255 with clean lanes.  Set 1 for the
    # 315-fps single-octave speed mode (EVAL.md §1 documents its
    # accuracy trade).
    lsd_octaves: int = 3
    lsd_quant: float = 2.0
    lsd_ang_th: float = 22.5         # gradient angle tolerance [deg]
    lsd_log_eps: float = 1.0
    lsd_density_th: float = 0.6
    lsd_n_bins: int = 1024
    # TPU-native asymmetric sampling: the RIGHT eye's segments feed only
    # stereo matching + the endpoint-disparity intersection (never the f2f
    # residual), so its LSQ refine can sample 8 instead of 16 along-line
    # points.  OFF by default pending the bench accuracy A/B.
    lsd_right_lite: bool = False

    # EDLine-style alternative line detector (ops/edline.py) — the
    # reference vendors EDLineDetector but never reaches it from StVO;
    # here it is the selectable QUALITY mode (TPU-native addition,
    # repeatability A/B in EVAL.md §2).  Knob semantics follow EDLineParam
    # (3rdparty/.../descriptor_custom.hpp: gradienThreshold,
    # anchorThreshold, ...); split rounds are the dense analogue of
    # EDLine's walk-and-refit segment splitting (LeastSquaresLineFit_,
    # binary_descriptor_custom.cpp:2484-2643).
    use_edlines: bool = False
    edline_grad_th: float = 20.0
    edline_anchor_th: float = 8.0
    # chaining orientation gate: 20 deg measured optimal for repeatability
    # (45 deg let chains wander across junctions non-deterministically —
    # rot15 repeatability 0.24 vs 0.50 at 20 deg, EVAL.md §2)
    edline_ang_tol: float = 20.0
    edline_min_support: int = 10     # min pixels per segment
    edline_straight_tol: float = 0.1 # max minor/major eigenvalue ratio
    edline_density_th: float = 0.4   # min support pixels per unit length
    edline_split_rounds: int = 2     # curvature-break splitting depth
    # detection-resolution divisor: 2 runs the whole EDLine graph on an
    # antialiased half-resolution image (endpoints mapped back by the
    # exact half-pixel-center map; min_support/min_length rescaled; the
    # sigma-1 pre-smooth is skipped — the AA resize already low-passes).
    # Measured round 4 (EVAL.md §2): at scale 2 repeatability still beats
    # cv2 LSD on all four warps while the node graph shrinks ~4x — the
    # whole labeling cost rides the scalar unit, so this is the knob that
    # makes the quality detector affordable in the batched step.
    edline_scale: int = 1

    # ---- TPU-native additions -----------------------------------------
    # spatial grid (reference GRID_ROWS/GRID_COLS, include/stereoFrame.h:51-52)
    grid_rows: int = 48
    grid_cols: int = 64
    # two-bucket length-adaptive LBD: the reference integrates EVERY pixel
    # of the rotated support region (binary_descriptor_custom.cpp:
    # 1142-1241); the fixed 8-sample grid under-samples long lines on
    # high-resolution frames.  Static shapes don't forbid TWO capacities:
    # the longer half of line_capacity gets lbd_long_samples along-line
    # samples, the shorter half keeps 8.  MEASURED round 5
    # (tools/eval_lbd.py, 2x-resolution photo warps, 16 vs 8): match
    # precision rot15 0.14 -> 0.22, scale0.8 0.14 -> 0.21, persp
    # 0.43 -> 0.38, bright 0.71 -> 0.64; TPU bench 313.7 -> 294.2 fps
    # (-6.2%, bench ATE unchanged 0.028).  The geometric-warp gain does
    # not cover the fps cost at bench budgets, so the default stays 8
    # (single-pass); raise to 16 for high-resolution / strong-rotation
    # sequences where long-line distinctiveness matters.
    lbd_long_samples: int = 8
    # number of discrete line orientations scanned by the dense detector
    lsd_n_dirs: int = 12
    # multi-octave (lsd_octaves > 1) tuning — models/frame.py
    # detect_lines_octaves.  oct_pool oversizes the canvas detection pool
    # (pool = round(line_capacity * oct_pool)) so MORE candidates pass
    # refine + NFA validation before the final capacity is selected by
    # LEVEL-0 length; 1.5 is the stamps-parity lever (head-to-head matrix
    # in BASELINE.md round 5: 1.0x pool 0.0458, 1.5x 0.0384 vs reference
    # 0.0417).  oct_l0_samples is the along-line sample count of the
    # level-0 precision re-refine of coarse-octave survivors (the pass
    # that cleans the mapped-back 2^o-px position noise off the bench ATE
    # lanes).
    lsd_oct_pool: float = 1.5
    lsd_oct_l0_samples: int = 16
    # right-eye detection pool factor (0 = same as lsd_oct_pool).  The
    # right eye's lines only feed stereo matching + the disparity
    # intersection (never the f2f residual or BA).  DEFAULT 1.0 (round
    # 5): beyond the +16 fps from halving the right refine/NFA/merge
    # work, a capacity-sized right pool is an ACCURACY feature on
    # repetitive natural texture — an oversized right pool offers every
    # left line more aliased stereo candidates, and the wrong-but-
    # plausible disparities they produce poisoned the textured60
    # head-to-head 10x (rpool 1.5: ATE 0.149-0.164; rpool 1.0: 0.0158
    # vs reference 0.0121).  Stamps pays 0.0384 -> 0.0419 (reference
    # 0.0417); the textured win dominates.  Set 0 to mirror the left
    # pool for stamps-like clean-line scenes.
    lsd_oct_pool_right: float = 1.0
    # direction-bin count for the CANVAS detector in octave mode (the
    # single-octave dense path keeps lsd_n_dirs); 0 = inherit lsd_n_dirs.
    # DEFAULT 8 (round 5): +10 fps at equal bench ATE, and MORE
    # repeatable than 12 on photo warps (scale0.8 0.427 vs 0.194, persp
    # 0.38 vs 0.245, bright 0.558 vs 0.335 — fewer cross-bin duplicate
    # runs leave pool room for more distinct physical lines).  At the
    # default right pool (lsd_oct_pool_right 1.0) stamps is dirs-
    # insensitive (0.0419 at both 8 and 12); only the rpool-1.5 variant
    # prefers 12 (0.0384 vs 0.0421).
    lsd_oct_n_dirs: int = 8
    # sub-pixel point localization (ops/subpix.py): Foerstner/cornerSubPix
    # corner refinement on the ORB patches, and photometric parabola
    # refinement of the matched stereo disparity.  The reference has no
    # point-side equivalent (cv::ORB reports integer*scale coords); both
    # reuse already-gathered patches so they are nearly free.
    subpix_points: bool = True
    subpix_disp: bool = True
    # compute dtype for the geometry/optimizer path ("float32" on TPU;
    # "float64" available on CPU for parity studies)
    dtype: str = "float32"
    # use the MXU (+/-1 matmul) Hamming kernel instead of XOR+popcount
    hamming_use_mxu: bool = True

    # ------------------------------------------------------------------
    def replace(self, **kw: Any) -> "VOConfig":
        return dataclasses.replace(self, **kw)

    @property
    def point_capacity(self) -> int:
        """Static per-image feature capacity for points."""
        return self.orb_nfeatures

    @property
    def line_capacity(self) -> int:
        """Static per-image feature capacity for line segments."""
        return self.lsd_nfeatures if self.lsd_nfeatures > 0 else 512


_FIELD_NAMES = {f.name for f in dataclasses.fields(VOConfig)}


def config_from_mapping(mapping: Mapping[str, Any],
                        base: VOConfig | None = None) -> VOConfig:
    """Build a VOConfig from a dict, ignoring unknown keys (safe-load
    semantics of reference `loadSafe`, src/config.cpp:123-130)."""
    base = base or VOConfig()
    known = {k: v for k, v in mapping.items() if k in _FIELD_NAMES}
    # coerce to the declared field types so YAML "1" / "1.0" round-trip
    coerced = {}
    types = {f.name: f.type for f in dataclasses.fields(VOConfig)}
    for k, v in known.items():
        t = types[k]
        if t in ("int", int):
            coerced[k] = int(v)
        elif t in ("float", float):
            coerced[k] = float(v)
        elif t in ("bool", bool):
            coerced[k] = bool(v)
        else:
            coerced[k] = v
    cfg = base.replace(**coerced)
    _warn_inert_keys(cfg)
    return cfg


def _warn_inert_keys(cfg: VOConfig) -> None:
    """Warn when a reference knob is parsed but cannot take effect here
    (documented in PARITY.md; silent acceptance would be dishonest)."""
    import warnings
    if cfg.orb_wta_k not in (2, 3, 4):
        raise ValueError(
            f"orb_wta_k={cfg.orb_wta_k}: cv::ORB supports WTA_K of 2 "
            "(256 binary tests, HAMMING) or 3/4 (128 2-bit argmax cells, "
            "HAMMING2) — see ops/orb.py describe/describe_wta")
    if cfg.orb_patch_size > 33:
        warnings.warn(
            f"orb_patch_size={cfg.orb_patch_size} exceeds the gathered "
            "33x33 patch; test points are clipped to a 13 px radius "
            "(see ops/orb.py:_make_pattern)", stacklevel=3)
    if cfg.lsd_right_lite and (cfg.lsd_octaves > 1 or cfg.use_edlines):
        warnings.warn(
            "lsd_right_lite has no effect when lsd_octaves > 1 or "
            "use_edlines is set: the multi-octave and EDLine detection "
            "branches use full sampling for both eyes (see "
            "models/frame.py detect_one)", stacklevel=3)
    if cfg.lsd_n_bins != 1024:
        warnings.warn(
            f"lsd_n_bins={cfg.lsd_n_bins} is parsed for config parity but "
            "has no analogue here: cv::LSD uses n_bins to pseudo-order its "
            "sequential region-growing seeds, and the dense detector has "
            "no seed ordering (all runs are found in parallel; see "
            "PARITY.md)", stacklevel=3)


def load_config(path: str | None, base: VOConfig | None = None) -> VOConfig:
    """Load a YAML config file with per-key fallback to defaults.

    Mirrors reference Config::loadFromFile (src/config.cpp:132-206): an
    invalid/missing file keeps defaults rather than erroring.
    """
    base = base or VOConfig()
    if path is None:
        return base
    try:
        import yaml
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
    except (OSError, ValueError):
        return base
    if not isinstance(data, dict):
        return base
    return config_from_mapping(data, base)
