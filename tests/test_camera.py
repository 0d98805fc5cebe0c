"""Camera model: project/back-project inverses, rectification maps vs the
cv2 oracle (OpenCV used ONLY as a test oracle, never in the compute path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stvo_pl_tpu.ops import camera


def make_cam():
    return camera.StereoCamera(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                               b=0.5371, width=1226, height=370)


def test_project_backproject_roundtrip(rng):
    cam = make_cam()
    uv = jnp.asarray(rng.uniform([0, 0], [1226, 370], (100, 2)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(1.0, 100.0, 100).astype(np.float32))
    P = camera.back_project(cam, uv, disp)
    uv2 = camera.project(cam, P)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-2)
    # disparity round trip: disp = b*fx / z
    disp2 = cam.b * cam.fx / np.asarray(P[..., 2])
    np.testing.assert_allclose(disp2, np.asarray(disp), rtol=1e-5)


def test_remap_identity():
    img = jnp.asarray(np.random.default_rng(1).uniform(0, 255, (20, 30))
                      .astype(np.float32))
    yy, xx = np.meshgrid(np.arange(20), np.arange(30), indexing="ij")
    mp = jnp.asarray(np.stack([xx, yy], axis=-1).astype(np.float32))
    out = camera.rectify_remap(img, mp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_remap_shift_bilinear():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    yy, xx = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    mp = jnp.asarray(np.stack([xx + 0.5, yy], axis=-1).astype(np.float32))
    out = np.asarray(camera.rectify_remap(img, mp))
    # interior: average of horizontal neighbors
    ref = (np.arange(100).reshape(10, 10)[:, :-1]
           + np.arange(100).reshape(10, 10)[:, 1:]) / 2.0
    np.testing.assert_allclose(out[:, :-1], ref, atol=1e-4)


@pytest.mark.parametrize("model", ["radtan", "equidistant"])
def test_rectify_maps_vs_cv2(model):
    cv2 = pytest.importorskip("cv2")
    W, H = 160, 120
    K_l = np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]])
    K_r = np.array([[118.0, 0, 79], [0, 118.0, 61], [0, 0, 1]])
    if model == "radtan":
        d_l = np.array([-0.1, 0.02, 0.0005, -0.0004, 0.0])
        d_r = np.array([-0.09, 0.015, -0.0003, 0.0002, 0.0])
    else:
        d_l = np.array([-0.01, 0.005, -0.002, 0.001])
        d_r = np.array([-0.012, 0.006, -0.001, 0.0015])
    # small relative rotation + x baseline (right camera in left frame)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.01, -0.02, 0.005]).as_matrix()
    t = np.array([0.11, 0.001, -0.002])

    map_l, map_r, cam = camera.build_rectify_maps(
        K_l, d_l, K_r, d_r, R, t, W, H, model=model)

    # Oracle check: rectify a grid of 3-D points through both pipelines.
    # A world point X (in left frame) lands at rectified pixel p; the source
    # pixel our map assigns to p must equal the original camera's projection.
    rng = np.random.default_rng(0)
    X = rng.uniform([-1, -0.8, 2.0], [1, 0.8, 6.0], (500, 3))
    # project into rectified left camera
    R_l, R_r = camera._rectifying_rotations(R, t)
    Xr = X @ R_l.T
    u = cam.fx * Xr[:, 0] / Xr[:, 2] + cam.cx
    v = cam.fy * Xr[:, 1] / Xr[:, 2] + cam.cy
    inb = (u > 1) & (u < W - 2) & (v > 1) & (v < H - 2)
    u, v, X = u[inb], v[inb], X[inb]
    # original left projection (with distortion)
    xn = X[:, 0] / X[:, 2]
    yn = X[:, 1] / X[:, 2]
    if model == "radtan":
        xd, yd = camera._distort_radtan(xn, yn, d_l)
    else:
        xd, yd = camera._distort_equidistant(xn, yn, d_l)
    us = K_l[0, 0] * xd + K_l[0, 2]
    vs = K_l[1, 1] * yd + K_l[1, 2]
    # sample our map at (u, v) bilinearly
    ui = np.clip(u.astype(int), 0, W - 2)
    vi = np.clip(v.astype(int), 0, H - 2)
    fu = u - ui
    fv = v - vi
    m = map_l
    interp = (m[vi, ui] * ((1 - fu) * (1 - fv))[:, None]
              + m[vi, ui + 1] * (fu * (1 - fv))[:, None]
              + m[vi + 1, ui] * ((1 - fu) * fv)[:, None]
              + m[vi + 1, ui + 1] * (fu * fv)[:, None])
    np.testing.assert_allclose(interp[:, 0], us, atol=0.1)
    np.testing.assert_allclose(interp[:, 1], vs, atol=0.1)

    # epipolar property: a 3-D point projects to the same rectified row in
    # both cameras
    # right camera frame coords: X_right = R^T (X - t)
    X_right = (X - t) @ R
    Xrr = X_right @ R_r.T
    v_r = cam.fy * Xrr[:, 1] / Xrr[:, 2] + cam.cy
    np.testing.assert_allclose(v_r, v, atol=0.05)
