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
    assert pack.pos.shape == pack.neg.shape
    assert pack.pos.shape[0] == 2 and pack.pos.shape[2] == 4
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
