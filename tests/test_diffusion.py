"""Diffusion core unit tests: schedule closed forms, prediction identities,
sampling loops, pyramid loss equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.models import diffusion as dm


def test_linear_schedule_closed_form():
    b = dm.linear_beta_schedule(1000)
    assert b[0] == pytest.approx(1e-4, rel=1e-6)
    assert b[-1] == pytest.approx(0.02, rel=1e-6)
    assert np.all(np.diff(b) > 0)


def test_cosine_schedule_properties():
    b = dm.cosine_beta_schedule(100)
    assert np.all(b >= 0) and np.all(b <= 0.999)


def test_sigmoid_schedule_matches_reference_formula():
    # independent recomputation of denoising_diffusion.py:448-461
    T = 50
    t = np.linspace(0, T, T + 1) / T
    start, end, tau = -3, 3, 1

    def sig(x):
        return 1 / (1 + np.exp(-x))

    ac = (-sig((t * (end - start) + start) / tau) + sig(end)) / (
        sig(end) - sig(start)
    )
    ac = ac / ac[0]
    want = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    got = dm.sigmoid_beta_schedule(T)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_schedule_tables_consistent():
    s = dm.make_schedule(100, objective="pred_x0", min_snr_loss_weight=True)
    ac = np.asarray(s.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod) ** 2, ac, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-4
    )
    # min-SNR clamp
    snr = ac / (1 - ac)
    np.testing.assert_allclose(
        np.asarray(s.loss_weight), np.minimum(snr, 5.0), rtol=1e-4
    )


def test_prediction_identities(rng):
    s = dm.make_schedule(64)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    t = jnp.asarray([5, 50])
    xt = dm.q_sample(s, x0, t, noise)
    # invert: predict x0 back from noise and vice versa
    x0_hat = dm.predict_start_from_noise(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    noise_hat = dm.predict_noise_from_start(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(noise_hat), np.asarray(noise), atol=1e-3)
    v = dm.predict_v(s, x0, t, noise)
    x0_hat2 = dm.predict_start_from_v(s, xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_hat2), np.asarray(x0), atol=1e-4)


def _perfect_model(x0):
    """Model that predicts x0 exactly (objective pred_x0)."""

    def fn(x, cond, t, self_cond=None):
        return x0

    return fn


def test_p_sample_loop_recovers_x0(rng):
    """With a perfect pred_x0 model, ancestral sampling must converge to x0."""
    s = dm.make_schedule(32)
    x0 = jnp.asarray(np.clip(rng.standard_normal((1, 4, 4, 2)), -1, 1), jnp.float32)
    out, _ = dm.p_sample_loop(s, _perfect_model(x0), jax.random.PRNGKey(0), x0.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_ddim_sample_recovers_x0(rng):
    s = dm.make_schedule(32, sampling_timesteps=8)
    assert s.is_ddim_sampling
    x0 = jnp.asarray(np.clip(rng.standard_normal((1, 4, 4, 2)), -1, 1), jnp.float32)
    out, _ = dm.sample(s, _perfect_model(x0), jax.random.PRNGKey(0), x0.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_trajectory_subsampling(rng):
    s = dm.make_schedule(20)
    x0 = jnp.zeros((1, 4, 4, 2))
    traj, _ = dm.p_sample_loop(
        s, _perfect_model(x0), jax.random.PRNGKey(0), x0.shape, return_every=5
    )
    assert traj.shape == (1, 5, 4, 4, 2)  # init + 4 chunks


def test_interpolate(rng):
    s = dm.make_schedule(16)
    x1 = jnp.zeros((1, 4, 4, 2))
    x2 = jnp.ones((1, 4, 4, 2))
    out = dm.interpolate(
        s, _perfect_model(0.5 * jnp.ones_like(x1)), jax.random.PRNGKey(0), x1, x2, t=8
    )
    assert np.isfinite(np.asarray(out)).all()


def test_pyramid_loss_matches_manual_concat_nanmean(rng):
    """The (sum, count) accumulation must equal the reference's concat+nanmean."""
    from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow

    B, S = 1, 8
    img_out = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    target = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    target[0, 0, 0, 0] = np.nan
    flow_tgt = rng.standard_normal((B, S, S, 2)).astype(np.float32)
    cond = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    flow_out = rng.standard_normal((B, S, S, 2)).astype(np.float32)

    def warp_fn(image, flow, scale=1):
        return warp_forward_flow(image, flow * 2.0, scale=scale)

    got = float(
        dm.pyramid_loss(
            jnp.asarray(img_out), jnp.asarray(target), jnp.asarray(flow_tgt),
            jnp.asarray(cond), jnp.asarray(flow_out), warp_fn, levels=(1, 2, 4),
        )
    )

    # manual concat + nanmean
    parts = [np.square(img_out - target).ravel()]
    for level in (2, 4):
        w = np.asarray(warp_fn(jnp.asarray(cond), jnp.asarray(flow_out), scale=level))
        td = np.asarray(
            warp_fn(jnp.asarray(target), jnp.zeros_like(jnp.asarray(flow_out)), scale=level)
        )
        parts.append((np.square(w - td) * level ** 4).ravel())
    allv = np.concatenate(parts)
    want = np.nanmean(allv)
    assert got == pytest.approx(want, rel=1e-5)


def test_pyramid_loss_flow_loss_weight_upgrade(rng):
    """``flow_loss_weight`` re-enables the reference's commented-out direct
    flow-MSE term (denoising_diffusion.py:966-974): default 0.0 is
    reference-exact; >0 adds weight*mse(flow_out, flow_tgt) into the same
    (sum, count) nanmean accumulation."""
    from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow

    B, S = 1, 8
    img_out = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    target = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    flow_tgt = rng.standard_normal((B, S, S, 2)).astype(np.float32)
    cond = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    flow_out = rng.standard_normal((B, S, S, 2)).astype(np.float32)

    def warp_fn(image, flow, scale=1):
        return warp_forward_flow(image, flow * 2.0, scale=scale)

    args = (jnp.asarray(img_out), jnp.asarray(target), jnp.asarray(flow_tgt),
            jnp.asarray(cond), jnp.asarray(flow_out), warp_fn)
    base = float(dm.pyramid_loss(*args, levels=(1, 2)))
    off = float(dm.pyramid_loss(*args, levels=(1, 2), flow_loss_weight=0.0))
    assert off == base  # default is reference-exact

    w = 3.0
    got = float(dm.pyramid_loss(*args, levels=(1, 2), flow_loss_weight=w))
    # manual: concat [img mse, level-2 term * 2^4, flow mse * w] -> nanmean
    parts = [np.square(img_out - target).ravel()]
    wrp = np.asarray(warp_fn(jnp.asarray(cond), jnp.asarray(flow_out), scale=2))
    td = np.asarray(
        warp_fn(jnp.asarray(target), jnp.zeros_like(jnp.asarray(flow_out)), scale=2)
    )
    parts.append((np.square(wrp - td) * 2 ** 4).ravel())
    parts.append((np.square(flow_out - flow_tgt) * w).ravel())
    want = np.nanmean(np.concatenate(parts))
    assert got == pytest.approx(want, rel=1e-5)
    assert got != base
