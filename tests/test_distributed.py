"""Multi-PROCESS jax.distributed validation on CPU.

VERDICT round-1 missing #1: everything previously validated was
single-process virtual devices; `initialize_distributed`
(parallel/mesh.py) had never run with num_processes > 1. This test
spawns two real OS processes, wires them into one cluster through a
localhost coordinator, and proves the DCN-analog paths are live code:

  * jax.process_count() == 2 with a 2x2-local global device mesh;
  * one data-parallel CSS train step whose gradient all-reduce crosses
    the process boundary (gloo CPU collectives), matching a
    single-process run of the same global batch;
  * process_frame_subset partitioning writing disjoint, complete,
    idempotent per-frame dumps to a shared directory — the reference's
    mpirun + shared-FS pattern (rotate_iou.py:10-14, refine_css.py:26,
    68-70).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    nprocs = 2
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(nprocs), str(pid),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    reports = []
    for pid in range(nprocs):
        with open(tmp_path / f"worker_{pid}.json") as f:
            reports.append(json.load(f))

    # cluster actually formed: 2 processes x 2 local = 4 global devices
    for r in reports:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2

    # cross-process dp step: all processes computed the identical global
    # loss (replicated outputs after the gloo all-reduce)
    np.testing.assert_allclose(reports[0]["losses"], reports[1]["losses"],
                               rtol=1e-6)

    # ... and it matches a single-process run of the same global batch on
    # a 4-device mesh (same shard count -> identical per-shard BN math)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod
    from sdflabel_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(devices=jax.devices()[:4])
    model = css_mod.CSSNet(use_running_average=False, width=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
    state = css_train.init_train_state(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, 1e-3)
    step = css_train.shard_train_step(
        css_train.make_train_step(1e-3, model=model), mesh)
    rng = np.random.RandomState(0)
    batch = {
        "rgb": rng.rand(4, 3, 64, 64).astype(np.float32),
        "uvw": rng.randint(0, 256, (4, 3, 64, 64)),
        "mask": rng.randint(0, 2, (4, 64, 64)),
        "latent": rng.randn(4, 3).astype(np.float32),
    }
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}
    single_losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        single_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(reports[0]["losses"], single_losses,
                               rtol=1e-5)

    # cross-process sharded_refine: both processes computed the identical
    # replicated trajectory (every stage-1/stage-2 all_gather, loss psum
    # and pmean-on-backward crossed the process boundary) ...
    sr0, sr1 = reports[0]["sharded_refine"], reports[1]["sharded_refine"]
    np.testing.assert_allclose(sr0["loss"], sr1["loss"], rtol=1e-6)
    assert np.isfinite(sr0["loss"]).all()
    for k in ("yaw", "trans", "scale"):
        np.testing.assert_allclose(sr0[k], sr1[k], rtol=1e-6, err_msg=k)

    # ... and the trajectory matches the same decomposition run
    # single-process on a 4-virtual-device mesh (same shard count, same
    # collectives — only the transport differs)
    from sdflabel_tpu.engine import refine as refine_mod
    from sdflabel_tpu.ops import grid as grid_ops
    from sdflabel_tpu.parallel import sharded_refine
    from sdflabel_tpu.renderer import rasterer as rast_mod

    def sphere_dec(latent, pts):
        return jnp.linalg.norm(pts, axis=-1) - (0.45 + 0.1 * latent[0])

    crop_hw = (16, 16)
    K = rast_mod.calibration_matrix(crop_hw)
    grid_pts = np.asarray(grid_ops.generate_point_grid(16))
    cfg = refine_mod.RefineConfig(iters=3, surface_capacity=256)
    mesh_r = mesh_mod.make_mesh(n_data=1, n_rays=4,
                                devices=jax.devices()[:4])
    fn = sharded_refine.make_sharded_refine_fn(
        sphere_dec, cfg, grid_pts, K, crop_hw, mesh_r, axis="rays")
    rngr = np.random.RandomState(1)
    nocs = rngr.rand(3, 16, 16).astype(np.float32) * 0.5
    fr = (rngr.randn(512, 3) * 0.4 + [0, 0, 8.0]).astype(np.float32)
    fm = np.ones(512, bool)
    init = refine_mod.init_refine_params(
        0.45, [0.05, -0.02, 4.05], 2.08, [0.0, 0.0, 0.0])
    _, hist_single = fn(init, jnp.asarray(nocs), jnp.asarray(fr),
                        jnp.asarray(fm))
    np.testing.assert_allclose(sr0["loss"], np.asarray(hist_single),
                               rtol=1e-5)

    # frame partition: disjoint, complete, each frame written exactly by
    # its owner
    all_frames = sorted(reports[0]["frames"] + reports[1]["frames"])
    assert all_frames == list(range(7))
    assert not (set(reports[0]["frames"]) & set(reports[1]["frames"]))
    import pickle

    for i in range(7):
        with open(tmp_path / f"frame_{i:03d}.pkl", "rb") as f:
            rec = pickle.load(f)
        owner = 0 if i in reports[0]["frames"] else 1
        assert rec == {"frame": i, "writer": owner}
