"""CSS training losses (torch parity), crops dataset, and mesh sharding."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.engine import css_train, refine
from sdflabel_tpu.models import css as css_mod
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.parallel import batched_refine, mesh as mesh_mod, rays
from sdflabel_tpu.renderer import rasterer as rast_mod

torch = pytest.importorskip("torch")


def test_ce_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 256, 8, 8).astype(np.float32)
    targets = rng.randint(0, 256, (2, 8, 8))
    ref = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    ours = css_train.cross_entropy_with_internal_softmax(
        jnp.asarray(logits), jnp.asarray(targets)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_css_losses_match_reference_formulas():
    """Reproduce train_css.py:70-80 in torch and compare."""
    rng = np.random.RandomState(1)
    b, h, w = 2, 8, 8
    pred = {
        "u": rng.randn(b, 256, h, w).astype(np.float32),
        "v": rng.randn(b, 256, h, w).astype(np.float32),
        "w": rng.randn(b, 256, h, w).astype(np.float32),
        "mask": rng.randn(b, 2, h, w).astype(np.float32),
        "latent": rng.randn(b, 3).astype(np.float32),
    }
    batch = {
        "uvw": rng.randint(0, 256, (b, 3, h, w)),
        "mask": rng.randint(0, 2, (b, h, w)),
        "latent": rng.randn(b, 3).astype(np.float32),
    }
    ours = css_losses = css_train.css_losses(
        {k: jnp.asarray(v) for k, v in pred.items()},
        {k: jnp.asarray(v) for k, v in batch.items()},
    )

    ce = torch.nn.CrossEntropyLoss()
    mse = torch.nn.MSELoss()
    mask_gt = torch.from_numpy(batch["mask"]).long()
    uvw_gt = torch.from_numpy(batch["uvw"]).long()
    losses_ref = []
    for i, key in enumerate("uvw"):
        p = torch.from_numpy(pred[key])
        mask_ext = mask_gt.unsqueeze(1).expand_as(p).float()
        losses_ref.append(ce(p * mask_ext, uvw_gt[:, i] * mask_gt))
    loss_uvw_ref = sum(losses_ref)
    loss_mask_ref = ce(torch.from_numpy(pred["mask"]), mask_gt) * 2
    loss_latent_ref = mse(
        torch.from_numpy(pred["latent"]), torch.from_numpy(batch["latent"])
    )
    np.testing.assert_allclose(float(ours["loss_uvw"]), float(loss_uvw_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ours["loss_mask"]), float(loss_mask_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ours["loss_latent"]),
                               float(loss_latent_ref), rtol=1e-5)


@pytest.fixture(scope="module")
def crops_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("crops")
    gt = {}
    rng = np.random.RandomState(0)
    for i in range(6):
        rgb = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        uvw = np.zeros((40, 48, 3), np.uint8)
        uvw[10:30, 10:40] = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(d / f"{i:05d}_rgb.png")
        Image.fromarray(uvw).save(d / f"{i:05d}_uvw.png")
        gt[str(i)] = [{
            "latent": [0.1, 0.2, 0.3],
            "extrinsics": np.eye(4).reshape(-1).tolist(),
            "intrinsics": np.eye(3).reshape(-1).tolist(),
        }]
    (d / "crops.json").write_text(json.dumps(gt))
    return str(d)


def test_crops_dataset(crops_dir):
    from sdflabel_tpu.data.crops import Crops, batch_iterator

    ds = Crops(crops_dir, augment=True, seed=0)
    assert len(ds) == 6
    s = ds[0]
    assert s["rgb"].shape == (3, 128, 128)
    assert s["uvw"].shape == (3, 128, 128)
    assert s["mask"].shape == (128, 128)
    assert s["mask"].max() == 1
    # mask == uvw.sum > 0 (crops.py:71)
    np.testing.assert_array_equal(s["mask"], (s["uvw"].sum(0) > 0))
    batches = list(batch_iterator(ds, 4, seed=0))
    assert batches[0]["rgb"].shape == (4, 3, 128, 128)


def test_train_step_decreases_loss(crops_dir):
    from sdflabel_tpu.data.crops import Crops, batch_iterator

    ds = Crops(crops_dir, augment=False)
    batch = next(batch_iterator(ds, 4, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("rgb", "uvw", "mask", "latent")}

    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, lr=1e-3)
    step = jax.jit(css_train.make_train_step(1e-3))
    state, m0 = step(state, batch)
    for _ in range(4):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    # frozen conv1 unchanged
    np.testing.assert_array_equal(
        np.asarray(state.variables["params"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["conv1"]["kernel"]),
    )


def test_data_parallel_train_step_matches_single(crops_dir):
    from sdflabel_tpu.data.crops import Crops, batch_iterator

    assert len(jax.devices()) == 8
    ds = Crops(crops_dir, augment=False)
    batch_np = next(batch_iterator(ds, 6, shuffle=False))
    # pad batch to 8 for even sharding
    batch_np = {k: np.concatenate([v, v[:2]]) for k, v in batch_np.items()
                if k in ("rgb", "uvw", "mask", "latent")}
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = css_mod.CSSNet(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, lr=1e-3)

    step = css_train.make_train_step(1e-3)
    _, m_single = jax.jit(step)(state, batch)

    mesh = mesh_mod.make_mesh(n_data=8, n_rays=1)
    sharded_step = css_train.shard_train_step(step, mesh)
    state2 = css_train.init_train_state(variables, lr=1e-3)
    _, m_shard = sharded_step(state2, batch)
    np.testing.assert_allclose(float(m_shard["loss"]), float(m_single["loss"]),
                               rtol=2e-4)


def _sphere_decoder(radius=0.45):
    def fn(latent, pts):
        return jnp.linalg.norm(pts, axis=-1) - (radius + 0.1 * latent[0])

    return fn


def test_batched_refine_sharded_runs():
    mesh = mesh_mod.make_mesh(n_data=4, n_rays=2)
    decoder = _sphere_decoder()
    cfg = refine.RefineConfig(iters=3, surface_capacity=512)
    grid_pts = grid_ops.generate_point_grid(16)
    crop_hw = (16, 16)
    K = jnp.asarray(rast_mod.calibration_matrix((16, 16)))

    b = 4
    params0 = refine.RefineParams(
        yaw=jnp.zeros((b, 1)), trans=jnp.tile(jnp.asarray([[0., 0., 4.]]), (b, 1)),
        scale=jnp.full((b, 1), 2.0), latent=jnp.zeros((b, 3)),
    )
    Kb = jnp.tile(K[None], (b, 1, 1))
    nocs = jnp.zeros((b, 3, 16, 16)).at[:, :, 6:10, 6:10].set(0.5)
    frustum = jnp.tile(jnp.asarray([[0., 0., 2.]]), (b, 64, 1))
    fmask = jnp.ones((b, 64), bool)

    # The data axis of the mesh has 4 devices; crop batch 4 shards 1:1.
    pmasks = jnp.ones((b,) + crop_hw, bool)
    fn = batched_refine.make_batched_refine(decoder, cfg, grid_pts, crop_hw,
                                            mesh=None)
    final, hist = fn(params0, Kb, nocs, frustum, fmask, pmasks)
    assert final.yaw.shape == (b, 1)
    assert np.isfinite(np.asarray(hist.loss)).all()

    fn_sharded = batched_refine.make_batched_refine(
        decoder, cfg, grid_pts, crop_hw, mesh=mesh_mod.make_mesh(4, 2)
    )
    final_s, hist_s = fn_sharded(params0, Kb, nocs, frustum, fmask, pmasks)
    np.testing.assert_allclose(np.asarray(final_s.trans),
                               np.asarray(final.trans), atol=1e-5)

    # coarse-to-fine through the vmapped path: identical trajectories for
    # a distance-like SDF (band fits budgets)
    import dataclasses

    cfg_c2f = dataclasses.replace(cfg, coarse_cells=128)
    fn_c2f = batched_refine.make_batched_refine(decoder, cfg_c2f, grid_pts,
                                                crop_hw, mesh=None)
    final_c, hist_c = fn_c2f(params0, Kb, nocs, frustum, fmask, pmasks)
    np.testing.assert_allclose(np.asarray(hist_c.loss),
                               np.asarray(hist.loss), rtol=1e-4, atol=1e-7)

    # warm-started band through the vmapped path (the refresh cond's
    # predicate is the unbatched scan counter, so vmap keeps real cond
    # semantics): refresh=1 matches the exact batched trajectory.
    cfg_warm = dataclasses.replace(cfg, warm_band=1024, warm_refresh=1)
    fn_warm = batched_refine.make_batched_refine(
        decoder, cfg_warm, grid_pts, crop_hw, mesh=None,
        select_decoder=decoder)
    final_w, hist_w = fn_warm(params0, Kb, nocs, frustum, fmask, pmasks)
    np.testing.assert_allclose(np.asarray(hist_w.loss),
                               np.asarray(hist.loss), rtol=1e-4, atol=1e-7)


def test_rays_sharded_render_matches_dense():
    mesh = mesh_mod.make_mesh(n_data=1, n_rays=8)
    res = (32, 16)
    K = jnp.asarray(rast_mod.calibration_matrix(res))
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (96, 3)).astype(np.float32)
    normals = rng.randn(96, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 5]
    mask = np.ones(96, bool)

    render_sharded = rays.make_rays_sharded_render(mesh, K, res)
    img_s = render_sharded(jnp.asarray(pts), jnp.asarray(normals),
                           jnp.asarray(pose), jnp.asarray(mask))

    rendering, _ = rast_mod.render(
        K, res, jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(normals),
        jnp.asarray(pose), point_mask=jnp.asarray(mask), rot="dcm",
        primitives="disc", output_nocs=True,
    )
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(rendering.color),
                               atol=1e-5)

    # gradient parity: psum of shard grads == dense grad
    def loss_sharded(p):
        return jnp.sum(render_sharded(jnp.asarray(pts), jnp.asarray(normals),
                                      p, jnp.asarray(mask)) ** 2)

    def loss_dense(p):
        r, _ = rast_mod.render(
            K, res, jnp.asarray(pts), jnp.asarray(normals),
            jnp.asarray(normals), p, point_mask=jnp.asarray(mask), rot="dcm",
            primitives="disc", output_nocs=True,
        )
        return jnp.sum(r.color ** 2)

    g_s = jax.grad(loss_sharded)(jnp.asarray(pose))
    g_d = jax.grad(loss_dense)(jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), atol=1e-4)

    # fused Pallas path per shard (interpret mode on CPU): same image and
    # pose gradient within the kernel's documented tolerance
    from jax.experimental.pallas import tpu as pltpu

    render_fused = rays.make_rays_sharded_render(mesh, K, res,
                                                 use_fused=True)
    with pltpu.force_tpu_interpret_mode():
        img_f = render_fused(jnp.asarray(pts), jnp.asarray(normals),
                             jnp.asarray(pose), jnp.asarray(mask))
        g_f = jax.grad(lambda p: jnp.sum(render_fused(
            jnp.asarray(pts), jnp.asarray(normals), p,
            jnp.asarray(mask)) ** 2))(jnp.asarray(pose))
    mism = np.abs(np.asarray(img_f) - np.asarray(rendering.color)).max(0)
    assert (mism < 2e-4).mean() > 0.99  # boundary-bit flips allowed
    scale = max(np.abs(np.asarray(g_d)).max(), 1e-9)
    np.testing.assert_allclose(np.asarray(g_f) / scale,
                               np.asarray(g_d) / scale, atol=5e-3)


@pytest.mark.slow
def test_train_css_orbax_resume_bit_identical(crops_dir, tmp_path):
    """Kill training after epoch 1, restart, and the trajectory continues
    bit-identically: full-TrainState orbax resume (params + opt state +
    epoch), exceeding the reference's params-only torch.save
    (train_css.py:100). VERDICT round-1 item 7."""
    import configparser

    from sdflabel_tpu.pipelines.train_css import train_css

    def make_cfg(log_dir):
        cfgp = configparser.ConfigParser()
        cfgp.read_string(
            "[input]\n"
            f"data_path = {crops_dir}\n"
            "css_path = /nonexistent\n"
            "[train]\nbatch_size = 6\nlr = 0.001\n"
            "[optimization]\nqueue_size = 2\ncpu_threads = 0\n"
            f"[log]\nanalyse_epoch = 1\nplot = False\ndir = {log_dir}\n"
        )
        return cfgp

    # uninterrupted 2-epoch run
    state_a = train_css(make_cfg(str(tmp_path / "a")), max_epochs=2)
    # interrupted run: 1 epoch, then restart to 2 (auto-resumes epoch 1)
    cfg_b = make_cfg(str(tmp_path / "b"))
    train_css(cfg_b, max_epochs=1)
    assert os.path.isdir(str(tmp_path / "b" / "ckpt"))
    state_b = train_css(cfg_b, max_epochs=2)

    assert int(state_a.step) == int(state_b.step)
    for pa, pb in zip(jax.tree.leaves(state_a.variables),
                      jax.tree.leaves(state_b.variables)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for oa, ob in zip(jax.tree.leaves(state_a.opt_state),
                      jax.tree.leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_direct_ce_mode():
    """Direct CE (css_losses(direct_ce=True)): standard torch CE on the
    RAW head logits. EXACTLY equal (values and gradients) to the parity
    default — the reference's formulation (train_css.py:70-74) feeds
    log-softmax outputs through CE's internal log_softmax, which is
    idempotent — while letting XLA eliminate the dead model-side
    log-softmax towers from the compiled step."""
    rng = np.random.RandomState(2)
    b, h, w = 2, 8, 8
    raw = {k: rng.randn(b, 256, h, w).astype(np.float32) for k in "uvw"}
    pred = {
        **{k: np.asarray(jax.nn.log_softmax(jnp.asarray(raw[k]), axis=1))
           for k in "uvw"},
        **{f"{k}_raw": raw[k] for k in "uvw"},
        "mask": rng.randn(b, 2, h, w).astype(np.float32),
        "latent": rng.randn(b, 3).astype(np.float32),
    }
    batch = {
        "uvw": rng.randint(0, 256, (b, 3, h, w)),
        "mask": rng.randint(0, 2, (b, h, w)),
        "latent": rng.randn(b, 3).astype(np.float32),
    }
    jpred = {k: jnp.asarray(v) for k, v in pred.items()}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    direct = css_train.css_losses(jpred, jbatch, direct_ce=True)
    parity = css_train.css_losses(jpred, jbatch)

    # direct == standard torch CE on raw logits with the same masking
    ce = torch.nn.CrossEntropyLoss()
    mask_gt = torch.from_numpy(batch["mask"]).long()
    uvw_gt = torch.from_numpy(batch["uvw"]).long()
    ref = 0.0
    for i, key in enumerate("uvw"):
        p = torch.from_numpy(raw[key])
        mask_ext = mask_gt.unsqueeze(1).expand_as(p).float()
        ref = ref + ce(p * mask_ext, uvw_gt[:, i] * mask_gt)
    np.testing.assert_allclose(float(direct["loss_uvw"]), float(ref),
                               rtol=1e-5)
    # the rewrite is EXACT: log_softmax is idempotent, so the reference's
    # double-log-softmax formulation computes the same loss (and, through
    # the shift-invariance of CE's internal log_softmax, the same
    # gradients) as standard CE on the raw logits
    np.testing.assert_allclose(float(direct["loss_uvw"]),
                               float(parity["loss_uvw"]), rtol=1e-6)
    g_d = jax.grad(lambda r: css_train.css_losses(
        {**jpred, "u_raw": r}, jbatch, direct_ce=True)["loss_uvw"])(
        jnp.asarray(raw["u"]))
    g_p = jax.grad(lambda r: css_train.css_losses(
        {**jpred, "u": jax.nn.log_softmax(r, axis=1)}, jbatch)["loss_uvw"])(
        jnp.asarray(raw["u"]))
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_p), atol=1e-8)
    # mask/latent terms are shared between modes
    np.testing.assert_allclose(float(direct["loss_mask"]),
                               float(parity["loss_mask"]), rtol=1e-6)

    # CSSNet emits the raw logits consistently: log_softmax(u_raw) == u
    model = css_mod.CSSNet(use_running_average=False, width=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 32, 32)))
    out = model.apply(variables, jnp.asarray(
        rng.rand(1, 3, 32, 32), jnp.float32), mutable=["batch_stats"])[0]
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(out["u_raw"], axis=1)),
        np.asarray(out["u"]), atol=1e-6)

    # the direct train step runs and optimizes
    step = jax.jit(css_train.make_train_step(1e-3, model=model,
                                             direct_ce=True))
    state = css_train.init_train_state(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, 1e-3)
    tb = {"rgb": jnp.asarray(rng.rand(2, 3, 32, 32), jnp.float32),
          "uvw": jnp.asarray(rng.randint(0, 256, (2, 3, 32, 32))),
          "mask": jnp.asarray(rng.randint(0, 2, (2, 32, 32))),
          "latent": jnp.asarray(rng.randn(2, 3), jnp.float32)}
    l0 = None
    for _ in range(8):
        state, metrics = step(state, tb)
        if l0 is None:
            l0 = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0
