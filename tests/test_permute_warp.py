"""permute_warp + noise_space='flow' (reference warp.py:181-228 stub and
denoising_diffusion.py:686-696, 806-821 dead code — implemented here per
the documented intent; see models/diffusion.py parity note)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.models import diffusion as dm
from opticalflowdiffusion_tpu.ops.warp import permute_warp


def _img(rng, b=2, h=8, w=8, c=3):
    return jnp.asarray(rng.random((b, h, w, c), np.float32))


def test_zero_flow_is_identity(rng):
    x = _img(rng)
    out = permute_warp(x, jnp.zeros(x.shape[:-1] + (2,)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_output_is_exact_permutation(rng):
    x = _img(rng, b=3, h=16, w=16)
    flow = jnp.asarray(rng.normal(0, 0.3, (3, 16, 16, 2)).astype(np.float32))
    out = np.asarray(permute_warp(x, flow))
    xs = np.asarray(x)
    # every channel is the SAME permutation of source pixels: sorting the
    # flattened pixels must give identical multisets per channel
    for b in range(3):
        for c in range(3):
            np.testing.assert_allclose(
                np.sort(out[b, ..., c].ravel()),
                np.sort(xs[b, ..., c].ravel()),
            )


def test_channels_move_together(rng):
    """Pixels (RGB vectors) move as units — the map is one permutation
    applied to all channels, not per-channel shuffles."""
    b, h, w = 1, 12, 12
    # unique pixel ids in channel 0; channel 1 = id * 2
    ids = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
    x = jnp.asarray(np.concatenate([ids, ids * 2], axis=-1))
    flow = jnp.asarray(rng.normal(0, 0.5, (b, h, w, 2)).astype(np.float32))
    out = np.asarray(permute_warp(x, flow))
    np.testing.assert_allclose(out[..., 1], out[..., 0] * 2)


def test_integer_flow_wraps(rng):
    """Flow of exactly 1.0 (full image extent) wraps back to identity."""
    x = _img(rng, b=1)
    flow = jnp.ones(x.shape[:-1] + (2,))
    out = permute_warp(x, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_shuffle_grows_with_sigma(rng):
    x = _img(rng, b=1, h=32, w=32, c=1)
    key = jax.random.PRNGKey(0)
    moved = []
    for sigma in (0.01, 0.1, 1.0):
        flow = sigma * jax.random.normal(key, x.shape[:-1] + (2,))
        out = permute_warp(x, flow)
        moved.append(float(jnp.mean(jnp.abs(out - x) > 1e-12)))
    assert moved[0] < moved[1] < moved[2], moved
    assert moved[2] > 0.9  # sigma=1: essentially fully shuffled


def test_grad_flows_through_values(rng):
    x = _img(rng, b=1, h=8, w=8, c=2)
    flow = jnp.asarray(rng.normal(0, 0.2, (1, 8, 8, 2)).astype(np.float32))
    g = jax.grad(lambda im: jnp.sum(permute_warp(im, flow) ** 2))(x)
    # gradient is the permuted cotangent: same magnitude multiset as 2*x
    np.testing.assert_allclose(
        np.sort(np.asarray(g).ravel()), np.sort(2 * np.asarray(x).ravel()),
        rtol=1e-5,
    )


# --------------------------------------------------------- diffusion wiring
def _flow_sched(T=8):
    return dm.make_schedule(timesteps=T, objective="pred_x0",
                            noise_space="flow")


def test_flow_space_requires_pred_x0():
    with pytest.raises(NotImplementedError):
        dm.make_schedule(timesteps=8, objective="pred_noise",
                         noise_space="flow")


def test_q_sample_flow_space_monotone_corruption(rng):
    """t=0 is identity; corruption grows with t (on a smooth image, where
    displacement magnitude maps to error magnitude — iid-random pixels
    saturate mean|diff| at ~1px shuffle already); pixel histogram is always
    preserved (permutation, not additive noise)."""
    sched = _flow_sched(T=100)
    h = w = 16
    gy, gx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    smooth = (gy + gx)[None, ..., None].astype(np.float32) / 2
    x = jnp.asarray(np.repeat(smooth, 3, axis=-1))
    key = jax.random.PRNGKey(1)
    noise = jax.random.normal(key, (1, h, w, 2))
    errs = []
    for t in (0, 40, 70, 99):
        xt = dm.q_sample(sched, x, jnp.asarray([t]), noise)
        np.testing.assert_allclose(  # histogram preserved
            np.sort(np.asarray(xt).ravel()), np.sort(np.asarray(x).ravel()),
            rtol=1e-6,
        )
        errs.append(float(jnp.mean(jnp.abs(xt - x))))
    assert errs[0] == 0.0, errs  # NSR(0) ~ 0.06 px: below any bucket flip
    assert errs[0] < errs[1] < errs[2] < errs[3], errs


def test_p_losses_and_sampling_run_in_flow_space(rng):
    sched = _flow_sched(T=8)
    B, S, C = 2, 8, 3

    def model_fn(x, cond, t, self_cond=None):
        return x * 0.9  # any x-shaped function

    x0 = _img(rng, b=B, h=S, w=S, c=C) * 2 - 1
    loss = dm.p_losses(
        sched, model_fn, jax.random.PRNGKey(0), x0,
        jnp.zeros((B,), jnp.int32) + 3,
    )
    assert np.isfinite(float(loss))

    img, _ = dm.p_sample_loop(
        sched, model_fn, jax.random.PRNGKey(1), (B, S, S, C)
    )
    assert img.shape == (B, S, S, C)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_flow_diffuser_with_flow_noise_space(rng):
    """The flagship algorithm end-to-end with noiser=flow (the config key
    the reference exposes, flow_diffuser.yaml noise_space wiring)."""
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset
    from opticalflowdiffusion_tpu.data.loader import DataLoader

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_diffuser",
        "dataset.image_size=16", "dataset.size=16", "+dataset.seed=0",
        "algorithm.image_size=16", "algorithm.timesteps=8",
        "algorithm.flow_max=2", "algorithm.noiser=flow",
    ])
    ds = ArtificialDataset(cfg.dataset)
    loader = DataLoader(ds, batch_size=4, shuffle=False, seed=0)
    algo = FlowDiffuser(cfg.algorithm)
    batch = next(iter(loader))
    state = algo.init(jax.random.PRNGKey(0), batch, clip=100)

    (loss, _), grads = jax.jit(
        jax.value_and_grad(algo.loss_fn, has_aux=True)
    )(state.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(
        jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)
    ))
    assert float(gnorm) > 0.0
