"""LBD descriptor P/R at 2x photo resolution: single-sample-grid vs
two-bucket length-adaptive sampling (VERDICT round-5 item 5).

The reference LBD integrates EVERY pixel of the rotated line-support
region (binary_descriptor_custom.cpp:1142-1241); ops/lbd.py samples a
fixed 8-along x 7-perpendicular grid.  On 2x-resolution frames lines are
twice as long in pixels, so the fixed grid under-samples them most — this
probe measures whether giving the LONG half of the capacity 16 along-line
samples (config.lbd_long_samples, models/frame._lbd_two_bucket) closes
descriptor quality measurably.

Protocol: real photos upscaled 2x, warped by the same homographies as
tools/eval_descriptors.py; lines detected ONCE per image pair (shared
across descriptor variants); LBD variants matched A->B with NNR(0.9) +
mutual; a match is CORRECT when the matched segment's endpoints lie
within tol of the homography-mapped segment (either orientation).

Run:  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/eval_lbd.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL_PX = 6.0     # endpoint tolerance at 2x resolution
NNR = 0.9
CAP = 128


def main():
    import jax
    # force CPU under the axon site hook (env JAX_PLATFORMS is ignored
    # once the hook pre-imports jax); this eval must not touch the chip
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from stvo_pl_tpu.ops import hamming, lbd, lsd, matching
    from stvo_pl_tpu.ops.image import sobel
    from stvo_pl_tpu.utils.world import load_photos
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from eval_descriptors import warps, PHOTOMETRIC, apply_h

    def upscale2(img):
        # 2x nearest-ish bilinear upscale on host (numpy) keeps the probe
        # dependency-free; detection runs on the upscaled frames
        H, W = img.shape
        ys = (np.arange(2 * H) + 0.5) / 2.0 - 0.5
        xs = (np.arange(2 * W) + 0.5) / 2.0 - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, H - 2)
        x0 = np.clip(np.floor(xs).astype(int), 0, W - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        a = img[y0][:, x0]
        b = img[y0][:, x0 + 1]
        c = img[y0 + 1][:, x0]
        d = img[y0 + 1][:, x0 + 1]
        return ((1 - fy) * ((1 - fx) * a + fx * b)
                + fy * ((1 - fx) * c + fx * d)).astype(np.float32)

    def warp_image(img, Hh, gain=1.0, bias=0.0):
        Hi = np.linalg.inv(Hh)
        H_img, W_img = img.shape
        yy, xx = np.mgrid[0:H_img, 0:W_img]
        uv = np.stack([xx.ravel(), yy.ravel(), np.ones(xx.size)], axis=1)
        src = uv @ Hi.T
        sx = src[:, 0] / src[:, 2]
        sy = src[:, 1] / src[:, 2]
        sx = np.clip(sx, 0, W_img - 1.001)
        sy = np.clip(sy, 0, H_img - 1.001)
        x0, y0 = sx.astype(int), sy.astype(int)
        fx, fy = sx - x0, sy - y0
        flat = img
        v = ((1 - fy) * ((1 - fx) * flat[y0, x0] + fx * flat[y0, x0 + 1])
             + fy * ((1 - fx) * flat[y0 + 1, x0] + fx * flat[y0 + 1, x0 + 1]))
        return np.clip(v.reshape(H_img, W_img) * gain + bias,
                       0, 255).astype(np.float32)

    def detect(img):
        segs = lsd.detect_line_segments(
            jnp.asarray(img), 0.025 * min(img.shape), capacity=CAP,
            n_dirs=12, log_eps=0.0)
        return segs

    def describe(img, segs, mode):
        gx, gy = sobel(jnp.asarray(img))
        if mode == "fixed8":
            _, d = lbd.compute_lbd(gx, gy, segs.sp, segs.ep)
            return d
        if mode == "fixed16":
            _, d = lbd.compute_lbd(gx, gy, segs.sp, segs.ep, n_samples=16)
            return d
        # two-bucket (the shipping config)
        order = jnp.argsort(-jnp.where(segs.valid, segs.length, 0.0))
        half = CAP // 2
        li, si = order[:half], order[half:]
        _, dl = lbd.compute_lbd(gx, gy, segs.sp[li], segs.ep[li],
                                n_samples=16)
        _, ds = lbd.compute_lbd(gx, gy, segs.sp[si], segs.ep[si])
        return (jnp.zeros((CAP, 8), jnp.uint32)
                .at[li].set(dl).at[si].set(ds))

    def score(segs_a, segs_b, da, db, Hh):
        dist = hamming.hamming_matrix(da, db, use_mxu=False)
        cand = segs_a.valid[:, None] & segs_b.valid[None, :]
        res = matching.nnr_mutual_match(dist, cand, NNR, mutual=True)
        idx = np.asarray(res.idx)
        ok = np.asarray(res.valid)
        sp_a = np.asarray(segs_a.sp)
        ep_a = np.asarray(segs_a.ep)
        sp_b = np.asarray(segs_b.sp)
        ep_b = np.asarray(segs_b.ep)
        sp_m = apply_h(Hh, sp_a)
        ep_m = apply_h(Hh, ep_a)
        n_match = int(ok.sum())
        n_corr = 0
        for i in np.nonzero(ok)[0]:
            j = idx[i]
            d1 = max(np.linalg.norm(sp_m[i] - sp_b[j]),
                     np.linalg.norm(ep_m[i] - ep_b[j]))
            d2 = max(np.linalg.norm(sp_m[i] - ep_b[j]),
                     np.linalg.norm(ep_m[i] - sp_b[j]))
            if min(d1, d2) < TOL_PX:
                n_corr += 1
        return n_match, n_corr

    photos = [upscale2(p) for p in load_photos()]
    print(f"{len(photos)} photos at 2x:",
          [p.shape for p in photos], flush=True)
    results = {}
    for wname in ["rot15", "scale0.8", "persp", "bright"]:
        agg = {m: [0, 0] for m in ("fixed8", "two_bucket", "fixed16")}
        for img in photos:
            H_img, W_img = img.shape
            Hh = warps(H_img, W_img)[wname]
            gain, bias = PHOTOMETRIC.get(wname, (1.0, 0.0))
            img_b = warp_image(img, Hh, gain, bias)
            segs_a = detect(img)
            segs_b = detect(img_b)
            for m in agg:
                da = describe(img, segs_a, m)
                db = describe(img_b, segs_b, m)
                nm, nc = score(segs_a, segs_b, da, db, Hh)
                agg[m][0] += nm
                agg[m][1] += nc
        results[wname] = {
            m: {"matches": v[0], "correct": v[1],
                "precision": round(v[1] / max(v[0], 1), 3)}
            for m, v in agg.items()}
        print(wname, json.dumps(results[wname]), flush=True)


if __name__ == "__main__":
    main()
