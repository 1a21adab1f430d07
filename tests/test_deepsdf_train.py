"""DeepSDF decoder training: sampling, learning, export parity, resume,
and dp-sharded step parity.

The reference trains decoders externally and only loads the result
(sdfrenderer/deepsdf/workspace.py:38-72); these tests pin our in-framework
trainer end to end: it must learn analytic shapes, export checkpoints the
reference loader conventions accept, resume bit-identically, and shard
data-parallel without changing the step."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdflabel_tpu.data import sdf_samples
from sdflabel_tpu.engine import deepsdf_train
from sdflabel_tpu.models import deepsdf


TINY = deepsdf.DeepSDFConfig(
    latent_size=2, dims=(32, 32, 32), norm_layers=(0, 1, 2),
    latent_in=(2,), weight_norm=True,
)


def _sphere(radius):
    return lambda p: np.linalg.norm(np.asarray(p), axis=-1) - radius


def _make_pack(radii, n=1024, seed=0):
    rng = np.random.RandomState(seed)
    scenes = [sdf_samples.sample_analytic_sdf(_sphere(r), rng, n)
              for r in radii]
    return sdf_samples.pack_scenes(
        scenes, names=[f"sphere{r}" for r in radii],
        scales=[2.0 * r for r in radii])


def test_sample_rows_and_pack():
    pack = _make_pack([0.3, 0.5], n=400)
    # pos and neg have INDEPENDENT pad widths (unbalanced sample sets
    # must not tile the smaller array up to the larger's width)
    assert pack.pos.shape[0] == pack.neg.shape[0] == 2
    assert pack.pos.shape[2] == pack.neg.shape[2] == 4
    assert pack.pos.shape[1] == max(int(c) for c in pack.pos_count)
    assert pack.neg.shape[1] == max(int(c) for c in pack.neg_count)
    # pos rows have sdf >= 0, neg < 0 (true rows only)
    for i in range(2):
        assert (pack.pos[i, : pack.pos_count[i], 3] >= 0).all()
        assert (pack.neg[i, : pack.neg_count[i], 3] < 0).all()
    # padding repeats true rows (cyclic): every padded row appears among
    # the true rows
    i, c = 0, int(pack.pos_count[0])
    if c < pack.pos.shape[1]:
        padded = pack.pos[i, c]
        assert (padded == pack.pos[i, :c]).all(axis=1).any()
    # sample values match the analytic sdf
    rows = pack.neg[1, : pack.neg_count[1]]
    np.testing.assert_allclose(
        rows[:, 3], _sphere(0.5)(rows[:, :3]), atol=1e-6)


def test_split_roundtrip(tmp_path):
    split = {"ds": {"car": ["a", "b"]}}
    rng = np.random.RandomState(0)
    for inst in ("a", "b"):
        pos, neg = sdf_samples.sample_analytic_sdf(_sphere(0.4), rng, 300)
        sdf_samples.write_sdf_samples(
            str(tmp_path / "SdfSamples" / "ds" / "car" / f"{inst}.npz"),
            pos, neg)
    pack = sdf_samples.load_scene_pack(str(tmp_path), split,
                                       scales={"a": 1.5})
    assert pack.names == ("a", "b")
    assert pack.scales[0] == pytest.approx(1.5)
    assert np.isnan(pack.scales[1])


def _train(pack, tcfg, steps, cfg=TINY, seed=0, state=None, start_step=0):
    step_fn = jax.jit(deepsdf_train.make_train_step(cfg, tcfg,
                                                    steps_per_epoch=1))
    if state is None:
        state = deepsdf_train.init_train_state(
            cfg, tcfg, pack.num_scenes, 1, jax.random.PRNGKey(seed))
    args = tuple(jnp.asarray(a) for a in
                 (pack.pos, pack.neg, pack.pos_count, pack.neg_count,
                  pack.scales))
    idx = jnp.arange(pack.num_scenes, dtype=jnp.int32)
    metrics = None
    for s in range(start_step, steps):
        k = jax.random.fold_in(jax.random.PRNGKey(seed + 1), s)
        state, metrics = step_fn(state, *args, idx, k)
    return state, metrics


@pytest.fixture(scope="module")
def trained():
    radii = [0.3, 0.45, 0.6]
    pack = _make_pack(radii, n=1024)
    tcfg = deepsdf_train.DeepSDFTrainConfig(
        samples_per_scene=512, scenes_per_batch=3, lr_decoder=2e-3,
        lr_codes=4e-3, lr_interval=10_000, scale_weight=0.5)
    state, metrics = _train(pack, tcfg, steps=400)
    return radii, pack, tcfg, state, metrics


def test_learns_spheres(trained):
    radii, pack, tcfg, state, metrics = trained
    assert float(metrics["loss_l1"]) < 0.01
    # decoded SDF vanishes on each scene's true surface and has the right
    # sign off-surface, per scene code
    dirs = np.random.RandomState(1).randn(256, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for i, r in enumerate(radii):
        code = state.codes[i]
        on = np.asarray(deepsdf.decode(TINY, state.params, code,
                                       jnp.asarray(dirs * r, jnp.float32))[0])
        assert np.abs(on).mean() < 0.02, f"scene {i}"
        inside = np.asarray(deepsdf.decode(
            TINY, state.params, code,
            jnp.asarray(dirs * (r * 0.7), jnp.float32))[0])
        assert (inside < 0).mean() > 0.95, f"scene {i} inside sign"
    # scale head fits the supervision targets
    for i, r in enumerate(radii):
        sc = float(deepsdf.apply_scale(TINY, state.params,
                                       state.codes[i])[0])
        assert abs(sc - 2.0 * r) < 0.1, f"scene {i} scale"


def test_export_import_roundtrip(tmp_path, trained):
    _, pack, _, state, _ = trained
    from sdflabel_tpu.pipelines import train_deepsdf as tp
    from sdflabel_tpu.models import deepsdf_workspace as ws

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    tp.save_reference_checkpoints(exp, TINY, state, pack.names, "latest",
                                  epoch=7)
    # experiment-dir loader
    with open(os.path.join(exp, "specs.json"), "w") as f:
        json.dump(deepsdf.specs_from_config(TINY), f)
    cfg2, params2, epoch = ws.load_decoder(exp, "latest")
    assert epoch == 7 and cfg2 == TINY
    codes = ws.load_latent_vectors(exp, "latest")
    np.testing.assert_allclose(codes, np.asarray(state.codes), rtol=1e-6)
    # single-file loader (the refine pipeline's setup_dsdf path)
    cfg3, params3, latent_size = ws.setup_dsdf(os.path.join(exp, "deepsdf.pt"))
    assert latent_size == TINY.latent_size
    pts = jnp.asarray(np.random.RandomState(2).randn(64, 3) * 0.4,
                      jnp.float32)
    ref = deepsdf.decode(TINY, state.params, state.codes[0], pts)[0]
    for p in (params2, params3):
        got = deepsdf.decode(TINY, p, state.codes[0], pts)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_resume_bit_identical(tmp_path):
    pack = _make_pack([0.4, 0.55], n=512)
    tcfg = deepsdf_train.DeepSDFTrainConfig(
        samples_per_scene=256, scenes_per_batch=2, lr_interval=10_000)
    full, _ = _train(pack, tcfg, steps=6, seed=3)

    from sdflabel_tpu.pipelines import train_deepsdf as tp

    half, _ = _train(pack, tcfg, steps=3, seed=3)
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    path = tp.save_resume_state(exp, half)
    assert tp.latest_resume_state(exp) == path
    template = deepsdf_train.init_train_state(
        TINY, tcfg, pack.num_scenes, 1, jax.random.PRNGKey(99))
    restored = tp.restore_resume_state(path, template)
    assert int(restored.step) == 3
    resumed, _ = _train(pack, tcfg, steps=6, seed=3, state=restored,
                        start_step=3)
    for a, b in zip(jax.tree.leaves((full.params, full.codes)),
                    jax.tree.leaves((resumed.params, resumed.codes))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_step_matches_single():
    pack = _make_pack([0.3, 0.4, 0.5, 0.6], n=256, seed=5)
    tcfg = deepsdf_train.DeepSDFTrainConfig(
        samples_per_scene=128, scenes_per_batch=4, scale_weight=0.25,
        lr_interval=10_000)
    step = deepsdf_train.make_train_step(TINY, tcfg, steps_per_epoch=1)
    state0 = deepsdf_train.init_train_state(
        TINY, tcfg, pack.num_scenes, 1, jax.random.PRNGKey(7))
    args = tuple(jnp.asarray(a) for a in
                 (pack.pos, pack.neg, pack.pos_count, pack.neg_count,
                  pack.scales))
    idx = jnp.arange(4, dtype=jnp.int32)
    k = jax.random.PRNGKey(11)

    s_single, m_single = jax.jit(step)(state0, *args, idx, k)

    from sdflabel_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(devices=jax.devices()[:4])
    state0b = deepsdf_train.init_train_state(
        TINY, tcfg, pack.num_scenes, 1, jax.random.PRNGKey(7))
    sharded = deepsdf_train.shard_train_step(step, mesh)
    s_shard, m_shard = sharded(state0b, *args, idx, k)

    np.testing.assert_allclose(float(m_shard["loss"]),
                               float(m_single["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves((s_single.params, s_single.codes)),
                    jax.tree.leaves((s_shard.params, s_shard.codes))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-5,
                                   atol=1e-7)


def test_pipeline_end_to_end(tmp_path):
    """The CLI driver trains from a reference-layout experiment dir and
    writes loadable checkpoints."""
    from sdflabel_tpu.pipelines import train_deepsdf as tp
    from sdflabel_tpu.models import deepsdf_workspace as ws

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    rng = np.random.RandomState(0)
    split = {"ds": {"car": ["s03", "s05"]}}
    for name, r in (("s03", 0.3), ("s05", 0.5)):
        pos, neg = sdf_samples.sample_analytic_sdf(_sphere(r), rng, 400)
        sdf_samples.write_sdf_samples(
            str(tmp_path / "SdfSamples" / "ds" / "car" / f"{name}.npz"),
            pos, neg)
    with open(os.path.join(exp, "split.json"), "w") as f:
        json.dump(split, f)
    specs = deepsdf.specs_from_config(TINY)
    specs.update({
        "TrainSplit": "split.json", "DataSource": str(tmp_path),
        "NumEpochs": 4, "SnapshotFrequency": 2, "SamplesPerScene": 128,
        "ScenesPerBatch": 2, "LearningRateSchedule": [
            {"Type": "Step", "Initial": 1e-3, "Interval": 500,
             "Factor": 0.5},
            {"Type": "Step", "Initial": 2e-3, "Interval": 500,
             "Factor": 0.5},
        ],
    })
    with open(os.path.join(exp, "specs.json"), "w") as f:
        json.dump(specs, f)

    state = tp.train_deepsdf(exp, log_every=100)
    assert int(state.step) == 4  # 2 scenes / batch 2 = 1 step x 4 epochs
    cfg2, _, epoch = ws.load_decoder(exp, "latest")
    assert cfg2 == TINY and epoch == 4
    assert os.path.exists(os.path.join(exp, "deepsdf.pt"))
    assert os.path.exists(os.path.join(exp, "deepsdf.json"))
    # resume path: a fifth epoch continues from the orbax checkpoint
    state2 = tp.train_deepsdf(exp, num_epochs=5, log_every=100)
    assert int(state2.step) == 5


def test_code_reg_matches_external_trainer_form():
    """reg = lambda * min(1, epoch/100) * mean_scenes ||z|| — the external
    trainer's sum of per-ROW latent norms over B*S rows / num_sdf_samples
    (train_deep_sdf.py), NOT a squared norm and NOT divided by S."""
    pack = _make_pack([0.3, 0.5], n=256)
    lam = 1e-2
    tcfg = deepsdf_train.DeepSDFTrainConfig(
        samples_per_scene=64, scenes_per_batch=2, code_reg_lambda=lam,
        code_init_std=4.0)  # large codes so reg is visible
    state = deepsdf_train.init_train_state(
        TINY, tcfg, 2, 1, jax.random.PRNGKey(0))
    step_fn = jax.jit(deepsdf_train.make_train_step(TINY, tcfg,
                                                    steps_per_epoch=1))
    args = tuple(jnp.asarray(a) for a in
                 (pack.pos, pack.neg, pack.pos_count, pack.neg_count,
                  pack.scales))
    codes0 = np.asarray(state.codes)
    _, metrics = step_fn(state, *args,
                         jnp.arange(2, dtype=jnp.int32),
                         jax.random.PRNGKey(1))
    # epoch 0 -> warmup (0+1)/100
    expect = lam * 0.01 * np.mean(np.linalg.norm(codes0, axis=1))
    np.testing.assert_allclose(float(metrics["loss_reg"]), expect,
                               rtol=1e-5)


def test_lr_staircase_decays_at_reference_epoch():
    """The external trainer uses factor^(epoch // interval) with 1-BASED
    epochs applied at epoch start: 1-based epoch `interval` already runs
    decayed (a step-count staircase would decay one epoch late). Each
    group follows ITS OWN Interval/Factor."""
    tcfg = deepsdf_train.DeepSDFTrainConfig(
        lr_decoder=1.0, lr_interval=5, lr_factor=0.5,
        lr_codes=1.0, lr_interval_codes=3, lr_factor_codes=0.1)
    spe = 2  # steps per epoch
    opt = deepsdf_train.make_optimizer(tcfg, spe)
    # With CONSTANT unit gradients, bias-corrected adam's update is ~ -lr
    # at every step, so the per-step update magnitude traces the schedule.
    params = ({"lin0": {"w": jnp.zeros((1,))}}, jnp.zeros((2, 1)))
    st = opt.init(params)
    g = ({"lin0": {"w": jnp.ones((1,))}}, jnp.ones((2, 1)))
    lrs_dec, lrs_codes = [], []
    for _ in range(19):
        upd, st = opt.update(g, st, params)
        lrs_dec.append(-float(np.asarray(upd[0]["lin0"]["w"])[0]))
        lrs_codes.append(-float(np.asarray(upd[1])[0, 0]))
    # decoder (interval 5 epochs, spe 2): 1-based epoch 5 starts at count
    # 8 and must ALREADY be decayed (the reference applies the decayed lr
    # at the top of epoch `interval`); second decay at epoch 10 = count 18
    for count, want in ((0, 1.0), (7, 1.0), (8, 0.5), (17, 0.5),
                        (18, 0.25)):
        np.testing.assert_allclose(lrs_dec[count], want, rtol=1e-3,
                                   err_msg=f"decoder count {count}")
    # codes (interval 3 epochs): decays at counts 4 (epoch 3), 10, 16
    for count, want in ((0, 1.0), (3, 1.0), (4, 0.1), (10, 0.01),
                        (16, 0.001)):
        np.testing.assert_allclose(lrs_codes[count], want, rtol=1e-3,
                                   err_msg=f"codes count {count}")


def test_from_specs_parses_clip_and_codes_schedule():
    specs = deepsdf.specs_from_config(TINY)
    specs.update({
        "GradientNormClipping": 1.5,
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 5e-4, "Interval": 500,
             "Factor": 0.5},
            {"Type": "Step", "Initial": 1e-3, "Interval": 250,
             "Factor": 0.25},
        ],
    })
    tcfg = deepsdf_train.DeepSDFTrainConfig.from_specs(specs)
    assert tcfg.grad_clip == pytest.approx(1.5)
    assert tcfg.lr_interval_codes == 250
    assert tcfg.lr_factor_codes == pytest.approx(0.25)
    # clipping applies to the decoder group ONLY (the external trainer
    # clips decoder.parameters(); code grads are never clipped). Probe
    # behaviorally: run clip vs no-clip on a varying-magnitude gradient
    # sequence — decoder trajectories must diverge (adam's second moment
    # sees clipped values), codes trajectories must be identical.
    def run(grad_clip):
        tcfg2 = deepsdf_train.DeepSDFTrainConfig(
            lr_decoder=1.0, lr_codes=1.0, grad_clip=grad_clip,
            lr_interval=10**6, lr_interval_codes=10**6)
        opt = deepsdf_train.make_optimizer(tcfg2, 1)
        params = ({"lin0": {"w": jnp.zeros((4,))}}, jnp.zeros((1, 4)))
        st = opt.init(params)
        for mag in (1.0, 100.0):
            g = ({"lin0": {"w": jnp.full((4,), mag)}},
                 jnp.full((1, 4), mag))
            upd, st = opt.update(g, st, params)
            params = (jax.tree.map(lambda p, u: p + u, params[0], upd[0]),
                      params[1] + upd[1])
        return params

    clipped, unclipped = run(1e-3), run(None)
    assert not np.allclose(np.asarray(clipped[0]["lin0"]["w"]),
                           np.asarray(unclipped[0]["lin0"]["w"]))
    np.testing.assert_array_equal(np.asarray(clipped[1]),
                                  np.asarray(unclipped[1]))
