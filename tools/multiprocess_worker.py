"""Worker for the multi-process `jax.distributed` exercise (SURVEY §4:
"multi-host collective tests runnable on CPU via jax.distributed").

Each process owns 4 virtual CPU devices; 2 processes form one 8-device
global mesh.  The worker runs (a) a psum smoke test across the process
boundary and (b) the distributed windowed BA (landmarks sharded over all
8 devices, reduced camera system psum-ed across processes) and checks the
result against the locally-computed single-device solution.

Spawned by tests/test_multiprocess.py and tools/run_multiprocess.py:

    python tools/multiprocess_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

PROC_ID = int(sys.argv[1])
NUM_PROCS = int(sys.argv[2])
PORT = int(sys.argv[3])
LOCAL_DEVICES = 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the axon site hook imports jax at interpreter startup and pins
# JAX_PLATFORMS; the config update still wins because no backend has been
# initialized yet (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stvo_pl_tpu.parallel import ba, mesh as mesh_mod


def main():
    # strict init: a worker that silently falls back to single-process
    # would fake the test green
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NUM_PROCS, process_id=PROC_ID)
    n_dev = len(jax.devices())
    assert n_dev == NUM_PROCS * LOCAL_DEVICES, \
        f"global devices {n_dev} != {NUM_PROCS} x {LOCAL_DEVICES}"
    mesh = mesh_mod.make_mesh(n_data=n_dev)

    # (a) psum across the process boundary
    sh = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))
    vals = np.arange(n_dev, dtype=np.float32)
    x = jax.make_array_from_callback(
        (n_dev,), sh, lambda idx: vals[idx])
    total = jax.jit(
        jax.shard_map(lambda v: jax.lax.psum(v[0], mesh_mod.DATA_AXIS),
                      mesh=mesh, in_specs=P(mesh_mod.DATA_AXIS),
                      out_specs=P()))(x)
    expect = float(vals.sum())
    got = float(np.asarray(total))
    assert got == expect, f"psum {got} != {expect}"

    # (b) distributed BA == single-device BA (same seeded problem built on
    # every process; global arrays assembled from local copies)
    rng = np.random.default_rng(0)
    K, N = 4, 64 * n_dev // 8 * 8  # divisible by the mesh
    X = rng.uniform([-5, -3, 4], [5, 3, 30], (N, 3)).astype(np.float32)
    poses_gt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        poses_gt[k, 2, 3] = -0.3 * k   # world->cam translation
    fx = fyv = 160.0
    cam_params = dict(fx=fx, fy=fyv, cx=120.0, cy=90.0, b=0.3,
                      width=240, height=180)
    from stvo_pl_tpu.ops import camera as cam_ops
    cam = cam_ops.StereoCamera(**cam_params)

    def project(T, Xw):
        Pc = (T[:3, :3] @ Xw.T).T + T[:3, 3]
        z = Pc[:, 2]
        u = cam.cx + cam.fx * Pc[:, 0] / z
        v = cam.cy + cam.fy * Pc[:, 1] / z
        ur = cam.cx + cam.fx * (Pc[:, 0] - cam.b) / z
        return np.stack([u, v, ur], -1)

    obs = np.stack([project(poses_gt[k], X) for k in range(K)], axis=1)
    obs += rng.normal(0, 0.3, obs.shape)
    mask = np.ones((N, K), bool)
    sigma2 = np.ones((N,), np.float32)
    # perturb initial poses (not pose 0: gauge)
    poses0 = poses_gt.copy()
    poses0[1:, :3, 3] += rng.normal(0, 0.05, (K - 1, 3)).astype(np.float32)

    # single-device solution (local, identical on every process)
    prob = ba.BAProblem(X=jnp.asarray(X), obs=jnp.asarray(obs, jnp.float32),
                        mask=jnp.asarray(mask), sigma2=jnp.asarray(sigma2))
    p_single, X_single, _, _ = ba.ba_solve(jnp.asarray(poses0), prob, cam,
                                           n_iters=5)

    # distributed solution over the global mesh
    solver = ba.make_sharded_ba(mesh, cam, n_iters=5)
    def g(a, spec):
        a = np.asarray(a)
        return jax.make_array_from_callback(
            a.shape, NamedSharding(mesh, spec), lambda idx: a[idx])
    p_dist, X_dist, _ = solver(
        g(poses0, P()), g(X, P(mesh_mod.DATA_AXIS)),
        g(obs.astype(np.float32), P(mesh_mod.DATA_AXIS)),
        g(mask, P(mesh_mod.DATA_AXIS)), g(sigma2, P(mesh_mod.DATA_AXIS)))

    # refined poses are replicated over the mesh: read the local copy
    p_dist_local = np.asarray(p_dist.addressable_data(0))
    err = float(np.max(np.abs(p_dist_local - np.asarray(p_single))))
    assert err < 1e-4, f"distributed != single: max err {err}"
    # the solve must actually have improved the perturbed poses
    e0 = float(np.abs(poses0 - poses_gt).max())
    e1 = float(np.abs(p_dist_local - poses_gt).max())
    assert e1 < 0.5 * e0, (e0, e1)
    # (c) FULL sharded VO step across the process boundary == the dense
    # single-process step, bit for bit (VERDICT r3 item 6).  Every process
    # builds the same seeded image batch; the sharded step runs over the
    # global 2-process mesh; each process checks its own addressable lanes.
    from stvo_pl_tpu.config import VOConfig
    from stvo_pl_tpu.parallel import batched

    cfg = VOConfig(orb_nfeatures=128, orb_nlevels=1, lsd_nfeatures=16,
                   lsd_n_dirs=4, min_features=8)
    cam2 = cam_ops.StereoCamera(fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                                b=0.2, width=128, height=96)
    rng_i = np.random.default_rng(7)
    B = n_dev
    il = rng_i.uniform(0, 255, (B, 96, 128)).astype(np.float32)
    ir = np.roll(il, -2, axis=2)          # crude stereo shift

    s_ref, t_ref = batched.vo_step_batched(
        batched.init_batched_state(cfg, B), jnp.asarray(il), jnp.asarray(ir),
        cam2, cfg)
    Tfw_ref = np.asarray(t_ref.Tfw)

    step, place = batched.make_sharded_vo_step(mesh, cam2, cfg)
    s_sh, il_s, ir_s = place(batched.init_batched_state(cfg, B),
                             jnp.asarray(il), jnp.asarray(ir))
    s2, t2 = step(s_sh, il_s, ir_s)
    jax.block_until_ready(s2.Tfw)
    max_step_err = 0.0
    for shard in t2.Tfw.addressable_shards:
        lane = shard.index[0]
        d = np.abs(np.asarray(shard.data) - Tfw_ref[lane])
        max_step_err = max(max_step_err, float(d.max()))
    assert max_step_err == 0.0, \
        f"cross-process sharded step != dense: {max_step_err}"

    if PROC_ID == 0:
        print(f"MULTIPROC_OK devices={n_dev} psum={got} ba_err={err:.2e} "
              f"pose_err {e0:.4f}->{e1:.4f} step_err={max_step_err}",
              flush=True)


if __name__ == "__main__":
    main()
