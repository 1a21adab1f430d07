"""Fused-head CSS network: exact equivalence with the unfused model."""

import numpy as np
import jax
import jax.numpy as jnp

from sdflabel_tpu.models import css as css_mod
from sdflabel_tpu.models import css_fused


def test_fused_matches_unfused():
    model = css_mod.CSSNet(use_running_average=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 64, 64)))
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fused_vars = css_fused.fuse_css_variables(variables)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 64, 64), jnp.float32)

    out_ref = model.apply(variables, x)
    out_fused = css_fused.CSSNetFused(use_running_average=True).apply(
        fused_vars, x
    )
    for key in ("u", "v", "w", "mask", "latent", "uvw_sm", "mask_sm",
                "uvw_sm_masked"):
        np.testing.assert_allclose(
            np.asarray(out_fused[key]), np.asarray(out_ref[key]),
            atol=2e-4, err_msg=key,
        )


def test_fused_train_mode_runs():
    model = css_fused.CSSNetFused(use_running_average=False)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)))
    out, updates = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.zeros((2, 3, 64, 64)), mutable=["batch_stats"],
    )
    assert out["uvw_sm"].shape == (2, 3, 64, 64)
    assert "batch_stats" in updates
