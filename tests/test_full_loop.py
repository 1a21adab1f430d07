"""Framework self-sufficiency: the entire data-production loop in-repo.

train_deepsdf (auto-decoder on SDF samples) -> reference-layout exports ->
make_crops (renders a crops DB from the TRAINED decoder + its LatentCodes
table) -> Crops reader -> CSS train step. The reference cannot run this
loop at all: it consumes an externally-trained decoder and an unreleased
crops database (workspace.py:38-72, datasets/crops.py:17).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from sdflabel_tpu.data import sdf_samples
from sdflabel_tpu.models import deepsdf


TINY = deepsdf.DeepSDFConfig(
    latent_size=2, dims=(32, 32, 32), norm_layers=(0, 1, 2),
    latent_in=(2,), weight_norm=True,
)


def _sphere(radius):
    return lambda p: np.linalg.norm(np.asarray(p), axis=-1) - radius


def test_train_decoder_then_crops_then_css(tmp_path):
    from sdflabel_tpu.pipelines import make_crops as mc
    from sdflabel_tpu.pipelines import train_deepsdf as tp
    from sdflabel_tpu.models import deepsdf_workspace as ws

    # -- 1) train a tiny decoder on analytic sphere scenes ------------
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    rng = np.random.RandomState(0)
    for name, r in (("s035", 0.35), ("s05", 0.5), ("s065", 0.65)):
        pos, neg = sdf_samples.sample_analytic_sdf(_sphere(r), rng, 600)
        sdf_samples.write_sdf_samples(
            str(tmp_path / "SdfSamples" / "ds" / "car" / f"{name}.npz"),
            pos, neg)
    with open(os.path.join(exp, "split.json"), "w") as f:
        json.dump({"ds": {"car": ["s035", "s05", "s065"]}}, f)
    specs = deepsdf.specs_from_config(TINY)
    specs.update({
        "TrainSplit": "split.json", "DataSource": str(tmp_path),
        "NumEpochs": 60, "SnapshotFrequency": 60, "SamplesPerScene": 256,
        "ScenesPerBatch": 3, "LearningRateSchedule": [
            {"Type": "Step", "Initial": 3e-3, "Interval": 500,
             "Factor": 0.5},
            {"Type": "Step", "Initial": 5e-3, "Interval": 500,
             "Factor": 0.5},
        ],
    })
    with open(os.path.join(exp, "specs.json"), "w") as f:
        json.dump(specs, f)
    tp.train_deepsdf(exp, log_every=1000, resume=False)

    # -- 2) crops DB from the trained decoder + its latent table ------
    cfg, params, latent_size = ws.setup_dsdf(os.path.join(exp, "deepsdf.pt"))
    latents = mc.load_latents(
        os.path.join(exp, "LatentCodes", "latest.pth"), latent_size)
    assert latents.shape == (3, 2)
    decoder_fn = deepsdf.sdf_fn(cfg, params)
    out = str(tmp_path / "crops")
    mc.make_crops(out, decoder_fn, latents, n_crops=4, crop_px=96,
                  grid_density=24, capacity=768, seed=0)

    # every crop renders a visible object from the trained shapes
    from sdflabel_tpu.data.crops import Crops, batch_iterator

    ds = Crops(out, augment=False)
    for i in range(4):
        s = ds[i]
        assert s["mask"].sum() > 50, f"crop {i} nearly empty"
        # stored latent is the TRAINED code for that scene
        np.testing.assert_allclose(s["latent"], latents[i % 3], atol=1e-5)

    # -- 3) the generated DB trains CSS ------------------------------
    from sdflabel_tpu.engine import css_train
    from sdflabel_tpu.models import css as css_mod

    batch = next(batch_iterator(ds, 4, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("rgb", "uvw", "mask", "latent")}
    model = css_mod.CSSNet(width=8, latent_size=2,
                           use_running_average=False)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    state = css_train.init_train_state(variables, lr=1e-3)
    step = jax.jit(css_train.make_train_step(1e-3, model=model))
    state, m0 = step(state, batch)
    state, m1 = step(state, batch)
    assert np.isfinite(float(m0["loss"]))
    assert float(m1["loss"]) < float(m0["loss"])
