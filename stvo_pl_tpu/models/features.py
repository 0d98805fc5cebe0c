"""Feature-set pytrees: the struct-of-arrays replacement for the reference's
pointer-linked PointFeature/LineFeature lists (include/stereoFeatures.h:30-121).

Every set has *static capacity* and a validity mask; "erasing" a feature
clears its mask bit.  Per-level measurement variance follows the reference:
sigma2 = 1 / scale^(2*level) (src/stereoFeatures.cpp:41-47 for points with
orb_scale_factor, :107-115 for lines with lsd_scale).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PointSet(NamedTuple):
    """Stereo-matched point features of one frame (capacity Np, aligned with
    the left-image detections)."""
    uv: jnp.ndarray       # [Np, 2] left pixel coords (level-0 frame)
    disp: jnp.ndarray     # [Np] disparity
    P: jnp.ndarray        # [Np, 3] camera-frame 3-D point
    desc: jnp.ndarray     # [Np, 8] uint32 (256-bit binary descriptor)
    level: jnp.ndarray    # [Np] int32 pyramid level
    sigma2: jnp.ndarray   # [Np] per-level variance factor
    valid: jnp.ndarray    # [Np] bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[-2]


class LineSet(NamedTuple):
    """Stereo-matched line-segment features of one frame (capacity Nl)."""
    spl: jnp.ndarray      # [Nl, 2] start point (left)
    epl: jnp.ndarray      # [Nl, 2] end point (left)
    sdisp: jnp.ndarray    # [Nl]
    edisp: jnp.ndarray    # [Nl]
    sP: jnp.ndarray       # [Nl, 3]
    eP: jnp.ndarray       # [Nl, 3]
    le: jnp.ndarray       # [Nl, 3] infinite-line coeffs, |(a,b)| = 1
    angle: jnp.ndarray    # [Nl]
    desc: jnp.ndarray     # [Nl, 8] uint32
    level: jnp.ndarray    # [Nl] int32
    sigma2: jnp.ndarray   # [Nl]
    valid: jnp.ndarray    # [Nl] bool

    @property
    def capacity(self) -> int:
        return self.spl.shape[-2]


class PointMatches(NamedTuple):
    """Frame-to-frame matched points, aligned with the *previous* frame's
    PointSet (reference matched_pt, built in matchF2FPoints,
    src/stereoFrameHandler.cpp:131-153)."""
    P: jnp.ndarray        # [Np, 3] 3-D from previous frame
    obs: jnp.ndarray      # [Np, 2] observation in current frame
    sigma2: jnp.ndarray   # [Np]
    valid: jnp.ndarray    # [Np] matched mask
    inlier: jnp.ndarray   # [Np] survives outlier rejection

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid & self.inlier, axis=-1)


class LineMatches(NamedTuple):
    """Frame-to-frame matched lines, aligned with the previous frame's
    LineSet (reference matched_ls, src/stereoFrameHandler.cpp:155-180)."""
    sP: jnp.ndarray       # [Nl, 3] previous-frame 3-D endpoints
    eP: jnp.ndarray       # [Nl, 3]
    spl: jnp.ndarray      # [Nl, 2] previous-frame 2-D endpoints (overlap wgt)
    epl: jnp.ndarray      # [Nl, 2]
    le_obs: jnp.ndarray   # [Nl, 3] observed infinite line (current frame)
    sigma2: jnp.ndarray   # [Nl]
    valid: jnp.ndarray    # [Nl]
    inlier: jnp.ndarray   # [Nl]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid & self.inlier, axis=-1)


def empty_points(capacity: int, dtype=jnp.float32) -> PointSet:
    return PointSet(
        uv=jnp.zeros((capacity, 2), dtype),
        disp=jnp.zeros((capacity,), dtype),
        P=jnp.zeros((capacity, 3), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        level=jnp.zeros((capacity,), jnp.int32),
        sigma2=jnp.ones((capacity,), dtype),
        valid=jnp.zeros((capacity,), bool),
    )


def empty_lines(capacity: int, dtype=jnp.float32) -> LineSet:
    return LineSet(
        spl=jnp.zeros((capacity, 2), dtype),
        epl=jnp.zeros((capacity, 2), dtype),
        sdisp=jnp.zeros((capacity,), dtype),
        edisp=jnp.zeros((capacity,), dtype),
        sP=jnp.zeros((capacity, 3), dtype),
        eP=jnp.zeros((capacity, 3), dtype),
        le=jnp.zeros((capacity, 3), dtype),
        angle=jnp.zeros((capacity,), dtype),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        level=jnp.zeros((capacity,), jnp.int32),
        sigma2=jnp.ones((capacity,), dtype),
        valid=jnp.zeros((capacity,), bool),
    )
