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


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) sampler (framework extension; models/diffusion.py)
# ---------------------------------------------------------------------------

def _const_model(c):
    def model_fn(x, cond, t, sc):
        return jnp.full_like(x, c)
    return model_fn


def test_dpmpp_exact_on_constant_model():
    # With a constant x0 prediction both DDIM (eta=0) and DPM-Solver++ are
    # EXACT integrators of the same probability-flow ODE (the exponential
    # update telescopes), and the 2M correction vanishes (x0 - prev_x0 = 0)
    # -> both finals equal the constant exactly, and every dpmpp mid-state
    # matches the closed-form solution x(l) = (s_l/s_T) x_T - a_l
    # expm1(l_T - l) c from the initial noise.
    shape = (2, 4, 4, 3)
    c = 0.37
    for S in (4, 16):
        sched = dm.make_schedule(timesteps=100, sampling_timesteps=S,
                                 objective="pred_x0", sampler="dpmpp")
        rng = jax.random.PRNGKey(0)
        out, _ = dm.dpmpp_sample(sched, _const_model(c), rng, shape)
        np.testing.assert_allclose(np.asarray(out), c, atol=2e-5)
        sched_d = dm.make_schedule(timesteps=100, sampling_timesteps=S,
                                   objective="pred_x0")
        out_d, _ = dm.ddim_sample(sched_d, _const_model(c), rng, shape)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out),
                                   atol=2e-5)
        # closed form along the dpmpp (trailing-spacing) grid
        traj, _ = dm.dpmpp_sample(sched, _const_model(c), rng, shape,
                                  return_every=1)
        traj = np.asarray(traj)
        ac = np.asarray(sched.alphas_cumprod)
        times = np.linspace(0, 99, S).astype(np.int32)[::-1]
        lam = lambda t: 0.5 * (np.log(ac[t]) - np.log1p(-ac[t]))
        x_T, l_T = traj[:, 0], lam(int(times[0]))
        s_T = np.sqrt(1 - ac[int(times[0])])
        for k in range(1, S):  # state after k steps sits at times[k]
            t = int(times[k])
            a_l, s_l = np.sqrt(ac[t]), np.sqrt(1 - ac[t])
            want = (s_l / s_T) * x_T - a_l * np.expm1(l_T - lam(t)) * c
            np.testing.assert_allclose(traj[:, k], want, atol=5e-5)


def _smooth_model():
    key = jax.random.PRNGKey(3)
    w = 0.35 * jax.random.normal(key, (3, 3), jnp.float32)

    def model_fn(x, cond, t, sc):
        # smooth, bounded (|x0| < 1 so clip_x_start never bites), t-varying
        tt = (t.astype(jnp.float32) / 100.0).reshape(-1, 1, 1, 1)
        return 0.8 * jnp.tanh(x @ w + 0.3 * tt)

    return model_fn


def test_dpmpp_matches_numpy_reference_transcription():
    # independent scalar NumPy transcription of the published 2M algorithm
    # (Lu et al. 2022, data-prediction multistep; diffusers' formula
    # x_t = (s_t/s_0) x - a_t expm1(-h) [m0 + (m0 - m1)/(2 r0)])
    shape = (2, 4, 4, 3)
    model = _smooth_model()
    rng = jax.random.PRNGKey(7)
    for S in (5, 8, 16):
        sched = dm.make_schedule(timesteps=1000, sampling_timesteps=S,
                                 objective="pred_x0", sampler="dpmpp")
        mine, _ = dm.dpmpp_sample(sched, model, rng, shape)

        ac = np.asarray(sched.alphas_cumprod)
        times = np.linspace(0, 999, S).astype(np.int32)[::-1]
        times = np.concatenate([times, [-1]])
        _, init_rng = jax.random.split(rng)
        x = np.asarray(jax.random.normal(init_rng, shape, jnp.float32))
        lam = lambda t: 0.5 * (np.log(ac[t]) - np.log1p(-ac[t]))
        prev_x0 = prev_l = None
        for i in range(S):
            t, t_next = int(times[i]), int(times[i + 1])
            bt = jnp.full((shape[0],), t, jnp.int32)
            x0 = np.clip(np.asarray(model(jnp.asarray(x), None, bt, None)), -1, 1)
            if t_next < 0:
                x = x0
                break
            h = lam(t_next) - lam(t)
            a_n = np.sqrt(ac[t_next])
            s_t, s_n = np.sqrt(1 - ac[t]), np.sqrt(1 - ac[t_next])
            if prev_x0 is None:
                D = x0
            else:
                r = (lam(t) - prev_l) / h
                D = x0 + (x0 - prev_x0) / (2 * r)
            x = (s_n / s_t) * x - a_n * np.expm1(-h) * D
            prev_x0, prev_l = x0, lam(t)
        np.testing.assert_allclose(np.asarray(mine), x, atol=5e-5)


def test_dpmpp_few_steps_match_many_step_ddim():
    # the serving claim: on a smooth model, dpmpp at S steps tracks the
    # converged ODE solution (ddim S=512) as well as ddim needs ~4x the
    # steps for.  Measured here: dpmpp-8 ~ ddim-32, dpmpp-12 < ddim-50.
    shape = (2, 4, 4, 3)
    model = _smooth_model()
    rng = jax.random.PRNGKey(7)
    ref = dm.make_schedule(timesteps=1000, sampling_timesteps=512,
                           objective="pred_x0")
    truth, _ = dm.ddim_sample(ref, model, rng, shape)

    def err(fn, S, sampler):
        sched = dm.make_schedule(timesteps=1000, sampling_timesteps=S,
                                 objective="pred_x0", sampler=sampler)
        out, _ = fn(sched, model, rng, shape)
        return float(jnp.sqrt(jnp.mean(jnp.square(out - truth))))

    e_dpmpp8 = err(dm.dpmpp_sample, 8, "dpmpp")
    e_ddim16 = err(dm.ddim_sample, 16, "auto")
    assert e_dpmpp8 < e_ddim16, (e_dpmpp8, e_ddim16)


def test_dpmpp_dispatch_and_flow_noise_guard():
    sched = dm.make_schedule(timesteps=50, sampling_timesteps=5,
                             objective="pred_x0", sampler="dpmpp")
    shape = (1, 4, 4, 2)
    out, _ = dm.sample(sched, _const_model(0.1), jax.random.PRNGKey(0), shape)
    assert out.shape == shape and bool(jnp.all(jnp.isfinite(out)))
    with pytest.raises(NotImplementedError):
        dm.make_schedule(timesteps=50, objective="pred_x0",
                         noise_space="flow", sampler="dpmpp")


def test_flow_diffuser_dpmpp_sampler_knob():
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_diffuser",
        "algorithm.image_size=16", "algorithm.timesteps=20",
        "algorithm.sampling_timesteps=4", "+algorithm.sampler=dpmpp",
        "algorithm.flow_max=4",
    ])
    algo = FlowDiffuser(cfg.algorithm)
    assert algo.sched.sampler == "dpmpp"
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.float32)
        for c in (3, 3, 2)
    )
    state = algo.init(jax.random.PRNGKey(0), batch)
    samples, flows = algo.sample(
        state.params, batch[0], jax.random.PRNGKey(1), return_every=2
    )
    assert samples.shape[0] == 2 and flows.shape[-1] == 2
    assert bool(jnp.all(jnp.isfinite(flows)))


def test_samplers_plumb_additional_channels():
    """ADVICE r2: ddim/dpmpp must strip + return the model's extra output
    channels like p_sample_loop (the reference ddim_sample can't even accept
    additional_tgt — denoising_diffusion.py:733)."""
    shape = (2, 8, 8, 3)

    def model(x, cond, t, sc=None):
        return jnp.concatenate(
            [x * 0.5, jnp.full(x.shape[:-1] + (2,), 0.25, x.dtype)], axis=-1
        )

    rng = jax.random.PRNGKey(3)
    for sampler in ("ddim", "dpmpp"):
        sched = dm.make_schedule(
            timesteps=20, sampling_timesteps=5, objective="pred_x0",
            sampler=sampler,
        )
        img, adds = dm.sample(sched, model, rng, shape, additional_channels=2)
        assert img.shape == shape
        assert adds.shape == shape[:-1] + (2,)
        assert bool(jnp.all(adds == 0.25))
        traj, adds_t = dm.sample(
            sched, model, rng, shape, additional_channels=2, return_every=2
        )
        assert traj.shape[1] == adds_t.shape[1]
        assert adds_t.shape[-1] == 2


def test_dpmpp_single_step_rejected():
    """ADVICE r2: S=1 dpmpp would make its only model call at t=0 on pure
    noise; the schedule constructor must reject it."""
    with pytest.raises(ValueError):
        dm.make_schedule(timesteps=20, sampling_timesteps=1,
                         objective="pred_x0", sampler="dpmpp")


def test_flow_diffuser_target_target_respects_sampler_knob():
    """ADVICE r2: target='target' must route through the sampler dispatcher
    (previously always full-T ancestral regardless of algorithm.sampler)."""
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import compose

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_diffuser",
        "algorithm.image_size=16", "algorithm.timesteps=20",
        "algorithm.sampling_timesteps=3", "+algorithm.sampler=ddim",
        "algorithm.target=target", "algorithm.flow_max=4",
    ])
    algo = FlowDiffuser(cfg.algorithm)
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.standard_normal((2, 16, 16, c)), jnp.float32)
        for c in (3, 3, 2)
    )
    state = algo.init(jax.random.PRNGKey(0), batch)
    samples, flows = algo.sample(
        state.params, batch[0], jax.random.PRNGKey(1), return_every=2
    )
    # DDIM trajectory is S+1=4 frames subsampled by 2 (+ forced final) = 3;
    # full-T ancestral would have been 20/re + 1 frames
    assert samples.shape[1] == flows.shape[1] == 3
    assert flows.shape[-1] == 2
