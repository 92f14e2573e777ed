"""bf16 compute-precision path: params stay fp32, loss finite, grads flow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opticalflowdiffusion_tpu.config import Config
from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser


@pytest.mark.slow
def test_flow_diffuser_bf16(rng):
    cfg = Config(dict(
        name="flow_diffuser", image_size=16, latent_dim=16, flow_max=2,
        latent_max=2, lr=1e-5, flow_weight=0.0, weight_decay=1e-6,
        is_diffusion=True, latent=False, timesteps=4, target="joint",
        ae=None, noiser="image", zero_init=True, _precision="bf16",
    ))
    algo = FlowDiffuser(cfg)
    assert algo.dtype == jnp.bfloat16

    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    tgt = rng.random((2, 16, 16, 3)).astype(np.float32)
    flow = rng.random((2, 16, 16, 2)).astype(np.float32)
    batch = (img, tgt, flow)
    state = algo.init(jax.random.PRNGKey(0), batch)
    # params remain fp32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32, leaf.dtype

    (loss, _), grads = jax.value_and_grad(algo.loss_fn, has_aux=True)(
        state.params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    gmax = max(
        float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gmax) and gmax > 0
