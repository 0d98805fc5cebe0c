"""Native C++ loader: decode parity with PIL, remap parity with the JAX
path, prefetch ordering."""

import os

import numpy as np
import pytest

from stvo_pl_tpu.native import loader as nl


@pytest.fixture(scope="module")
def lib():
    try:
        return nl.get_lib()
    except nl.NativeUnavailable as e:
        pytest.skip(str(e))


def write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def write_pgm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.astype(np.uint8).tobytes())


def test_decode_pgm(tmp_path, lib, rng):
    arr = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    p = str(tmp_path / "img.pgm")
    write_pgm(p, arr)
    out = nl.decode_image(p)
    np.testing.assert_allclose(out, arr.astype(np.float32), atol=0)


def test_decode_png_gray(tmp_path, lib, rng):
    arr = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    write_png(p, arr)
    out = nl.decode_image(p)
    np.testing.assert_allclose(out, arr.astype(np.float32), atol=0)


def test_decode_png_rgb(tmp_path, lib, rng):
    arr = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    write_png(p, arr)
    out = nl.decode_image(p)
    ref = (0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2])
    np.testing.assert_allclose(out, ref, atol=1.0)


def test_prefetching_loader_order_and_remap(tmp_path, lib, rng):
    H, W = 24, 32
    paths_l, paths_r = [], []
    frames = []
    for i in range(6):
        al = rng.integers(0, 256, (H, W), dtype=np.uint8)
        ar = rng.integers(0, 256, (H, W), dtype=np.uint8)
        pl = str(tmp_path / f"l_{i:03d}.png")
        pr = str(tmp_path / f"r_{i:03d}.png")
        write_png(pl, al)
        write_png(pr, ar)
        paths_l.append(pl)
        paths_r.append(pr)
        frames.append((al, ar))

    # identity maps -> remap == decode
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    mp = np.stack([xx, yy], axis=-1).astype(np.float32)

    ld = nl.PrefetchingLoader(paths_l, paths_r, W, H, mp, mp, n_threads=3)
    got = list(ld)
    ld.close()
    assert len(got) == 6
    for (gl, gr), (al, ar) in zip(got, frames):
        np.testing.assert_allclose(gl, al.astype(np.float32), atol=1e-3)
        np.testing.assert_allclose(gr, ar.astype(np.float32), atol=1e-3)


def test_remap_matches_jax_path(tmp_path, lib, rng):
    import jax.numpy as jnp
    from stvo_pl_tpu.ops.camera import rectify_remap
    H, W = 20, 30
    img = rng.integers(0, 256, (H, W)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    mp = np.stack(np.meshgrid(np.arange(W), np.arange(H))[::1], axis=-1)
    mp = (np.stack([np.tile(np.arange(W), (H, 1)) * 0.97 + 0.3,
                    np.tile(np.arange(H)[:, None], (1, W)) * 0.95 + 0.7],
                   axis=-1).astype(np.float32))
    ld = nl.PrefetchingLoader([p], [p], W, H, mp, mp)
    (gl, gr), = list(ld)
    ld.close()
    ref = np.asarray(rectify_remap(jnp.asarray(img.astype(np.float32)),
                                   jnp.asarray(mp)))
    np.testing.assert_allclose(gl, ref, atol=1e-2)
