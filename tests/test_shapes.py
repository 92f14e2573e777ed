"""Shape-level checks via jax.eval_shape (no FLOPs): full-res rectangular
Sintel config, multi-frame 256x256 video diffusion, remat path.

The reference's sampler hardcodes square images (denoising_diffusion.py:784
samples (B, C, image_size, image_size)), breaking on Sintel 512x256; this
framework derives sampling shapes from the conditioning, so rectangles work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowdiffusion_tpu.config import Config


def _fd_cfg(**kw):
    base = dict(
        name="flow_diffuser", image_size=128, latent_dim=16, flow_max=20,
        latent_max=2, lr=1e-5, flow_weight=0.0, weight_decay=1e-6,
        is_diffusion=True, latent=False, timesteps=1000, target="joint",
        ae=None, noiser="image", zero_init=True,
    )
    base.update(kw)
    return Config(base)


def test_flow_diffuser_sintel_fullres_shapes():
    """512x256 (W,H) flagship: loss + sampling shapes check out."""
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser

    algo = FlowDiffuser(_fd_cfg(_precision="bf16"))
    B, H, W = 2, 256, 512
    img = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    tgt = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    flow = jax.ShapeDtypeStruct((B, H, W, 2), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def init_and_loss(img, tgt, flow, rng):
        state = None
        # init params abstractly
        tgt_x, cond, flow_n = algo.preprocess(
            jax.random.PRNGKey(0), (img, tgt, flow), aug=False
        )
        return tgt_x, cond

    out = jax.eval_shape(
        lambda i, t, f: algo.preprocess(jax.random.PRNGKey(0), (i, t, f), aug=False),
        img, tgt, flow,
    )
    assert out[0].shape == (B, H, W, 5)  # joint target: warped(3) + flow(2)

    # full loss graph traces at rectangular full-res (abstract, no compute)
    params = jax.eval_shape(
        lambda i, t, f: algo.module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, H, W, 5)), jnp.zeros((B, H, W, 3)),
            jnp.zeros((B,), jnp.int32), None,
        )["params"],
        img, tgt, flow,
    )

    def loss(p, i, t, f):
        return algo.loss_fn(p, (i, t, f), jax.random.PRNGKey(0))

    shp = jax.eval_shape(loss, params, img, tgt, flow)
    assert shp[0].shape == ()


def test_flow_diffuser_remat_traces():
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser

    algo = FlowDiffuser(_fd_cfg(image_size=32, timesteps=4, _remat=True))
    B = 2
    img = jax.ShapeDtypeStruct((B, 32, 32, 3), jnp.float32)
    tgt = jax.ShapeDtypeStruct((B, 32, 32, 3), jnp.float32)
    flow = jax.ShapeDtypeStruct((B, 32, 32, 2), jnp.float32)
    params = jax.eval_shape(
        lambda: algo.module.init(
            jax.random.PRNGKey(0), jnp.zeros((B, 32, 32, 5)),
            jnp.zeros((B, 32, 32, 3)), jnp.zeros((B,), jnp.int32), None,
        )["params"]
    )

    def gloss(p, i, t, f):
        (l, _), g = jax.value_and_grad(algo.loss_fn, has_aux=True)(
            p, (i, t, f), jax.random.PRNGKey(0)
        )
        return l

    shp = jax.eval_shape(gloss, params, img, tgt, flow)
    assert shp.shape == ()


def test_frame_generator_256_mesh_shapes():
    """Multi-frame 256x256 video diffusion over the mesh (BASELINE cfg 5) —
    abstract trace of the sharded train step."""
    from opticalflowdiffusion_tpu.algorithms.animation import FrameGenerator
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib

    cfg = Config(dict(name="frame_generator", image_size=256, lr=7e-5,
                      weight_decay=2e-4))
    algo = FrameGenerator(cfg)
    B = 8
    x = jax.ShapeDtypeStruct((B, 256, 256, 8), jnp.float32)
    params = jax.eval_shape(
        lambda: algo.module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
            jnp.zeros((1, 256, 256, 5)), jnp.zeros((1,), jnp.int32),
        )["params"]
    )

    def loss(p, xb):
        return algo.loss_fn(p, (xb,), jax.random.PRNGKey(0))[0]

    shp = jax.eval_shape(loss, params, x)
    assert shp.shape == ()
