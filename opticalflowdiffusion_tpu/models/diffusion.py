"""Conditional DDPM/DDIM core, functional JAX.

TPU-native rebuild of the reference ``ConditionalDiffusion``
(reference: algorithms/diffusion_animation/denoising_diffusion.py:420-993).

Design: the schedule is a pytree of fp32 tables (:class:`Schedule`); the
model is passed as a closure ``model_fn(x, cond, t, self_cond) -> out`` bound
to parameters by the caller.  The full reverse loops (ancestral
``p_sample_loop`` :700-729 and ``ddim_sample`` :731-774) compile to single
XLA programs via ``lax.scan`` — the "north-star kernel" of the rebuild — with
``return_every`` subsampling of the trajectory so validation does not
materialize all 1001 frames in HBM.

Parity notes (runtime behavior of the reference, not its dead code):
 * min-SNR loss weighting is registered but NOT applied in ``_loss``
   (denoising_diffusion.py:975-981 — disabled with a print); we keep the
   table in the schedule for API parity and likewise do not apply it.
 * The pyramid ``_loss`` shifted-warp loop runs only the (0,0) shift
   (denoising_diffusion.py:930-931 ``range(0, 1)``) — reproduced.
 * ``noise_space='flow'`` is dead code upstream (``permute_warp`` is a pass
   stub, warp.py:181-228): any attempt to run it there crashes.  Here the
   documented intent IS implemented (q_sample :806-821, p_sample :686-696):
   the forward process permute-warps x0 by a scaled Gaussian flow field
   instead of adding pixel noise, and ancestral sampling perturbs the
   posterior mean the same way.  One deliberate fix: the dead code scales
   the flow noise by ``sqrt_alphas_cumprod`` — which DECREASES with t and
   would invert the forward process (maximum warp at t=0, clean data at
   t=T); we scale by ``sqrt_one_minus_alphas_cumprod`` so t=0 is (near-)
   identity and t=T is a full shuffle, as a forward process requires.
   Requires ``objective='pred_x0'`` (the flagship default) — noise-space
   targets are shape-incompatible with epsilon/v objectives.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import nan_mse_stats, permute_warp

Array = jax.Array
ModelFn = Callable[..., Array]


# ---------------------------------------------------------------------------
# Beta schedules (reference :427-461)
# ---------------------------------------------------------------------------

def linear_beta_schedule(timesteps: int) -> np.ndarray:
    # schedule tables computed host-side in float64 like the reference
    # (denoising_diffusion.py:427-434) then cast to fp32 device buffers
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    ac = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1
) -> np.ndarray:
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = _sigmoid(start / tau)
    v_end = _sigmoid(end / tau)
    ac = (-_sigmoid((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Diffusion schedule tables (reference buffers, :511-578), fp32."""

    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    log_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    loss_weight: Array

    num_timesteps: int = dataclasses.field(metadata=dict(static=True), default=1000)
    sampling_timesteps: int = dataclasses.field(metadata=dict(static=True), default=1000)
    objective: str = dataclasses.field(metadata=dict(static=True), default="pred_x0")
    ddim_sampling_eta: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    noise_space: str = dataclasses.field(metadata=dict(static=True), default="image")
    sampler: str = dataclasses.field(metadata=dict(static=True), default="auto")

    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.num_timesteps


def make_schedule(
    timesteps: int = 1000,
    sampling_timesteps: Optional[int] = None,
    objective: str = "pred_x0",
    beta_schedule: str = "sigmoid",
    ddim_sampling_eta: float = 0.0,
    min_snr_loss_weight: bool = False,
    min_snr_gamma: float = 5.0,
    noise_space: str = "image",
    sampler: str = "auto",
) -> Schedule:
    """Build all schedule tables in float64 then cast (reference :502-578)."""
    assert objective in ("pred_noise", "pred_x0", "pred_v")
    assert noise_space in ("image", "flow")
    assert sampler in ("auto", "ancestral", "ddim", "dpmpp")
    if sampler == "dpmpp" and noise_space != "image":
        raise NotImplementedError(
            "sampler='dpmpp' integrates the additive-noise probability-flow "
            "ODE; the permutation-warp forward process (noise_space='flow') "
            "has no such ODE — use the ancestral sampler."
        )
    if sampler == "dpmpp" and int(sampling_timesteps or timesteps) < 2:
        # with S=1 the trailing grid is times=[0]: the single model call
        # would evaluate at t=0 on pure N(0,1) input (worst-case
        # conditioning); DDIM's S=1 grid correctly calls at t=T-1 instead
        raise ValueError(
            "sampler='dpmpp' requires sampling_timesteps >= 2 "
            "(use sampler='ddim' for single-step sampling)"
        )
    if noise_space == "flow" and objective != "pred_x0":
        raise NotImplementedError(
            "noise_space='flow' requires objective='pred_x0': the flow-"
            "noise forward process has no epsilon/v target (see module "
            "docstring parity note)."
        )
    betas = _SCHEDULES[beta_schedule](timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([np.ones((1,), ac.dtype), ac[:-1]])

    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)

    snr = ac / (1 - ac)
    clipped_snr = np.minimum(snr, min_snr_gamma) if min_snr_loss_weight else snr
    if objective == "pred_noise":
        loss_weight = clipped_snr / snr
    elif objective == "pred_x0":
        loss_weight = clipped_snr
    else:
        loss_weight = clipped_snr / (snr + 1)

    f32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - ac)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - ac)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1)),
        posterior_variance=f32(post_var),
        posterior_log_variance_clipped=f32(np.log(np.clip(post_var, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(ac_prev) / (1.0 - ac)),
        posterior_mean_coef2=f32((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
        loss_weight=f32(loss_weight),
        num_timesteps=int(timesteps),
        sampling_timesteps=int(sampling_timesteps or timesteps),
        objective=objective,
        ddim_sampling_eta=float(ddim_sampling_eta),
        noise_space=noise_space,
        sampler=sampler,
    )


def extract(a: Array, t: Array, ndim: int) -> Array:
    """Gather per-timestep coefficients, broadcast to ndim (reference :422-425)."""
    out = a[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


# ---------------------------------------------------------------------------
# Forward process / predictions (reference :589-663, 806-821)
# ---------------------------------------------------------------------------

def _flow_sigma(sched: Schedule, t: Array, x: Array) -> Array:
    """Per-axis normalized flow-noise scale for noise_space='flow':
    NSR(t) = sqrt(1-a)/sqrt(a) pixels, converted to permute_warp's
    normalized units (1.0 = full extent) per axis."""
    H, W = x.shape[1], x.shape[2]
    nsr = extract(
        sched.sqrt_one_minus_alphas_cumprod
        / jnp.maximum(sched.sqrt_alphas_cumprod, 1e-6),
        t, x.ndim,
    )
    return nsr * jnp.asarray([1.0 / W, 1.0 / H], jnp.float32)


def q_sample(sched: Schedule, x_start: Array, t: Array, noise: Array) -> Array:
    nd = x_start.ndim
    if sched.noise_space == "flow":
        # forward process = permutation-warp x0 by scaled Gaussian flow
        # (reference :806-821 intent; coefficient fixed — module docstring).
        # Displacement sigma in PIXELS equals the additive process's
        # noise-to-signal ratio sqrt(1-a)/sqrt(a): ~0 px at t=0 (identity),
        # >> image size at t=T (full shuffle).  ``noise`` is (B, H, W, 2).
        return permute_warp(x_start, _flow_sigma(sched, t, x_start) * noise)
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(sched, x_t, t, noise):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(sched, x_t, t, x0):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_v(sched, x_start, t, noise):
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_start_from_v(sched, x_t, t, v):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def q_posterior(sched, x_start, x_t, t):
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def model_predictions(
    sched: Schedule,
    model_fn: ModelFn,
    x: Array,
    t: Array,
    x_self_cond: Optional[Array] = None,
    clip_x_start: bool = False,
    rederive_pred_noise: bool = False,
    external_cond: Optional[Array] = None,
    additional_channels: int = 0,
) -> Tuple[Array, Array, Optional[Array]]:
    """(pred_noise, pred_x_start, additional_out) — reference :634-664."""
    out = model_fn(x, external_cond, t, x_self_cond)
    additional = None
    if additional_channels:
        additional = out[..., -additional_channels:]
        out = out[..., :-additional_channels]

    clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)

    if sched.objective == "pred_noise":
        pred_noise = out
        x_start = clip(predict_start_from_noise(sched, x, t, pred_noise))
        if clip_x_start and rederive_pred_noise:
            pred_noise = predict_noise_from_start(sched, x, t, x_start)
    elif sched.objective == "pred_x0":
        x_start = clip(out)
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    else:  # pred_v
        x_start = clip(predict_start_from_v(sched, x, t, out))
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    return pred_noise, x_start, additional


# ---------------------------------------------------------------------------
# Training losses (reference :823-983)
# ---------------------------------------------------------------------------

def pyramid_loss(
    image_out: Array,
    target: Array,
    flow_tgt: Optional[Array] = None,
    external_cond: Optional[Array] = None,
    flow_out: Optional[Array] = None,
    warp_fn: Optional[Callable] = None,
    levels: Tuple[int, ...] = (1, 2, 4, 8, 16),
    flow_loss_weight: float = 0.0,
) -> Array:
    """The reference ``_loss`` (denoising_diffusion.py:893-983).

    Level 1 is a NaN-aware MSE between model image and target; higher levels
    compare the model-flow forward warp of the conditioning against the
    box-downsampled target (both via the fused scale splat), each scaled by
    ``level**4``.  The reference concatenates per-element losses of all terms
    and takes one global nanmean; accumulating (sum, count) pairs is exactly
    equivalent and jit-safe.

    ``flow_loss_weight`` re-enables the reference's commented-out direct
    flow-MSE term ("flow loss disabled", denoising_diffusion.py:966-974) as
    an opt-in: with only indirect photometric supervision the joint model's
    sampled flow channels collapse toward zero on weak-motion data.  Default
    0.0 = reference-exact.
    """
    s, n = nan_mse_stats(image_out, target)
    total_sum, total_cnt = s, n
    if flow_tgt is not None:
        for level in levels:
            if level == 1:
                continue
            warped = warp_fn(external_cond, flow_out, scale=level)
            tgt_ds = warp_fn(target, jnp.zeros_like(flow_out), scale=level)
            s, n = nan_mse_stats(warped, tgt_ds)
            total_sum = total_sum + s * (level ** 4)
            total_cnt = total_cnt + n
        if flow_loss_weight > 0.0 and flow_out is not None:
            s, n = nan_mse_stats(flow_out, flow_tgt)
            total_sum = total_sum + s * flow_loss_weight
            total_cnt = total_cnt + n
    return total_sum / jnp.maximum(total_cnt, 1)


def p_losses(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    x_start: Array,
    t: Array,
    external_cond: Optional[Array] = None,
    additional_tgt: Optional[Array] = None,
    warp_fn: Optional[Callable] = None,
    self_condition: bool = False,
    image_channels: int = 3,
    model_out_override: Optional[Tuple[Array, Optional[Array]]] = None,
    offset_noise_strength: float = 0.0,
    flow_loss_weight: float = 0.0,
    noise: Optional[Array] = None,
) -> Array:
    """Training loss (reference :823-891).  ``noise`` overrides the drawn
    forward-process noise (reference p_losses' ``noise=`` arg :825) — used by
    the weight-transplant equivalence tests to pin both frameworks to the
    same sample."""
    rng_noise, rng_sc, rng_off = jax.random.split(rng, 3)
    noise_shape = (
        x_start.shape[:-1] + (2,) if sched.noise_space == "flow"
        else x_start.shape
    )
    if noise is None:
        noise = jax.random.normal(rng_noise, noise_shape, x_start.dtype)
    if offset_noise_strength > 0.0:
        off = jax.random.normal(
            rng_off, x_start.shape[:1] + (1, 1) + x_start.shape[-1:], x_start.dtype
        )
        noise = noise + offset_noise_strength * off

    x = q_sample(sched, x_start, t, noise)

    x_self_cond = None
    if self_condition:
        def _sc(_):
            _, xs, _ = model_predictions(
                sched, model_fn, x, t, external_cond=external_cond
            )
            return jax.lax.stop_gradient(xs)

        use = jax.random.bernoulli(rng_sc)
        x_self_cond = jax.lax.cond(
            use, _sc, lambda _: jnp.zeros_like(x), operand=None
        )

    if model_out_override is not None:
        model_out, additional_out = model_out_override
    else:
        model_out = model_fn(x, external_cond, t, x_self_cond)
        additional_out = None
        if additional_tgt is not None:
            k = additional_tgt.shape[-1]
            additional_out = model_out[..., -k:]
            model_out = model_out[..., :-k]

    if sched.objective == "pred_noise":
        target = noise
    elif sched.objective == "pred_x0":
        target = x_start
    else:
        target = predict_v(sched, x_start, t, noise)

    if additional_tgt is not None:
        return pyramid_loss(
            model_out, target, additional_tgt, external_cond, additional_out,
            warp_fn, flow_loss_weight=flow_loss_weight,
        )
    if target.shape[-1] == image_channels + 2:  # joint target (image + flow)
        c = image_channels
        return pyramid_loss(
            model_out[..., :c], target[..., :c], target[..., c:],
            external_cond, model_out[..., c:], warp_fn,
            flow_loss_weight=flow_loss_weight,
        )
    return pyramid_loss(model_out, target)


# ---------------------------------------------------------------------------
# Sampling (reference :666-784)
# ---------------------------------------------------------------------------

def p_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    external_cond: Optional[Array] = None,
    additional_channels: int = 0,
    return_every: Optional[int] = None,
):
    """Ancestral sampling as one scanned XLA program (reference :700-729).

    Returns ``img`` or, with ``return_every=k``, a trajectory stacked on axis
    1 containing the initial noise plus the state after every k steps —
    matching the reference's ``return_all_timesteps`` + ``[:, ::k]`` pattern
    when k divides num_timesteps.
    """
    T = sched.num_timesteps
    rng, init_rng = jax.random.split(rng)
    img0 = jax.random.normal(init_rng, shape, jnp.float32)

    def step(carry, t):
        img, rng = carry
        rng, noise_rng = jax.random.split(rng)
        bt = jnp.full((shape[0],), t, jnp.int32)
        _, x_start, additional = model_predictions(
            sched, model_fn, img, bt,
            external_cond=external_cond, additional_channels=additional_channels,
        )
        x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_start, img, bt)
        if sched.noise_space == "flow":
            # perturb the posterior mean by a sigma-scaled permutation warp
            # instead of additive pixel noise (reference :686-696 intent)
            fnoise = jax.random.normal(
                noise_rng, shape[:-1] + (2,), jnp.float32
            )
            warped = permute_warp(mean, jnp.exp(0.5 * log_var) * fnoise)
            img = jnp.where(t > 0, warped, mean)
        else:
            noise = jax.random.normal(noise_rng, shape, jnp.float32)
            noise = jnp.where(t > 0, noise, 0.0)
            img = mean + jnp.exp(0.5 * log_var) * noise
        return (img, rng), additional

    if return_every is None:
        (img, _), last_additional = jax.lax.scan(
            step, (img0, rng), jnp.arange(T - 1, -1, -1)
        )
        additional = (
            None if additional_channels == 0
            else jax.tree_util.tree_map(lambda a: a[-1], last_additional)
        )
        return img, additional

    k = int(return_every)
    assert T % k == 0, "return_every must divide num_timesteps"
    ts = jnp.arange(T - 1, -1, -1).reshape(T // k, k)

    def chunk(carry, t_chunk):
        carry, adds = jax.lax.scan(step, carry, t_chunk)
        add_last = (
            None if additional_channels == 0
            else jax.tree_util.tree_map(lambda a: a[-1], adds)
        )
        return carry, (carry[0], add_last)

    (img, _), (traj, adds) = jax.lax.scan(chunk, (img0, rng), ts)
    traj = jnp.concatenate([img0[None], traj], axis=0)  # (T//k + 1, B, ...)
    traj = jnp.moveaxis(traj, 0, 1)  # (B, T//k+1, ...)
    if additional_channels:
        adds = jnp.moveaxis(adds, 0, 1)
    else:
        adds = None
    return traj, adds


def ddim_sample(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    external_cond: Optional[Array] = None,
    additional_channels: int = 0,
    return_every: Optional[int] = None,
):
    """DDIM sampling loop as one scanned XLA program (reference :731-774).

    ``additional_channels`` strips and returns the model's extra output
    channels (e.g. UnetWithWarp's flow) like :func:`p_sample_loop` does —
    an upgrade over the reference, whose ``ddim_sample`` does not accept
    ``additional_tgt`` at all and would raise a TypeError when dispatched
    for the 'target' target (denoising_diffusion.py:733, 781-784).
    """
    T, S, eta = sched.num_timesteps, sched.sampling_timesteps, sched.ddim_sampling_eta
    times = jnp.linspace(-1, T - 1, S + 1).astype(jnp.int32)
    times = times[::-1]
    pairs = jnp.stack([times[:-1], times[1:]], axis=1)  # (S, 2)

    rng, init_rng = jax.random.split(rng)
    img0 = jax.random.normal(init_rng, shape, jnp.float32)

    def step(carry, pair):
        img, rng = carry
        t, t_next = pair[0], pair[1]
        rng, noise_rng = jax.random.split(rng)
        bt = jnp.full((shape[0],), t, jnp.int32)
        pred_noise, x_start, additional = model_predictions(
            sched, model_fn, img, bt,
            clip_x_start=True, rederive_pred_noise=True, external_cond=external_cond,
            additional_channels=additional_channels,
        )
        alpha = sched.alphas_cumprod[t]
        alpha_next = jnp.where(t_next < 0, 1.0, sched.alphas_cumprod[t_next])
        sigma = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma ** 2, 0.0))
        out = x_start * jnp.sqrt(alpha_next) + c * pred_noise
        if eta != 0:
            # deterministic DDIM (eta=0, the reference default :758) never
            # adds noise — sigma is identically 0, but XLA cannot fold
            # sigma*normal() away (sqrt may be NaN), so the eta==0 program
            # would pay a full threefry pass per step for a zero term.
            # The rng split above stays either way so the key stream (and
            # thus every other draw) is identical across the two paths.
            noise = jax.random.normal(noise_rng, shape, jnp.float32)
            out = out + sigma * noise
        out = jnp.where(t_next < 0, x_start, out)
        return (out, rng), (out, additional)

    (img, _), (traj, adds) = jax.lax.scan(step, (img0, rng), pairs)
    if return_every is None:
        additional = (
            None if additional_channels == 0
            else jax.tree_util.tree_map(lambda a: a[-1], adds)
        )
        return img, additional
    traj = jnp.concatenate([img0[None], traj], axis=0)
    traj = jnp.moveaxis(traj, 0, 1)  # (B, S+1, ...)
    # subsample but ALWAYS keep the final state as the last frame
    idx = list(range(0, S + 1, max(1, int(return_every))))
    if idx[-1] != S:
        idx.append(S)
    if additional_channels:
        adds = jnp.moveaxis(adds, 0, 1)  # (B, S, ...) — no initial-noise frame
        adds = adds[:, jnp.asarray([max(i - 1, 0) for i in idx])]
    else:
        adds = None
    return traj[:, jnp.asarray(idx)], adds


def dpmpp_sample(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    external_cond: Optional[Array] = None,
    additional_channels: int = 0,
    return_every: Optional[int] = None,
):
    """DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095) as one scanned
    XLA program — a framework extension, not in the reference.

    A second-order multistep exponential integrator of the probability-flow
    ODE in data-prediction space: reuses the previous step's x0 estimate, so
    it costs the SAME one model call per step as DDIM but converges at
    ~2.5x fewer steps (the serving lever: DDIM-50-grade samples at ~20
    steps).  Deterministic (the eta=0 regime, like the reference's DDIM
    default).  Uses the same clipped-x0 model predictions as
    :func:`ddim_sample` but TRAILING timestep spacing (last model call at
    t=0): the reference's linspace(-1, T-1) grid ends with a first-order
    x0-jump from t~T/S that dominates the coarse-S error for ANY solver —
    measured on a smooth test model the 2M mid-trajectory error is 3-30x
    below DDIM's, but that shared final jump erases it.  Ending at t=0
    makes the final x0 substitution exact up to the schedule's t=0 noise
    level.  Falls back to first order on the first step and the final
    (t_next < 0) step — standard lower-order-final practice.
    """
    T, S = sched.num_timesteps, sched.sampling_timesteps
    times = jnp.linspace(0, T - 1, S).astype(jnp.int32)[::-1]
    times = jnp.concatenate([times, jnp.asarray([-1], jnp.int32)])
    pairs = jnp.stack([times[:-1], times[1:]], axis=1)  # (S, 2)

    rng, init_rng = jax.random.split(rng)
    img0 = jax.random.normal(init_rng, shape, jnp.float32)

    def lam(t):
        # log(alpha_t / sigma_t); schedule tables are fp32 but the half-log
        # SNR is well-conditioned over the sampled range
        a = sched.alphas_cumprod[t]
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def step(carry, pair):
        x, prev_x0, prev_lam, has_prev = carry
        t, t_next = pair[0], pair[1]
        bt = jnp.full((shape[0],), t, jnp.int32)
        _, x0, additional = model_predictions(
            sched, model_fn, x, bt, clip_x_start=True,
            external_cond=external_cond,
            additional_channels=additional_channels,
        )
        lam_t = lam(t)
        lam_next = jnp.where(t_next < 0, lam_t, lam(jnp.maximum(t_next, 0)))
        h = lam_next - lam_t
        alpha_next = jnp.sqrt(jnp.where(t_next < 0, 1.0, sched.alphas_cumprod[jnp.maximum(t_next, 0)]))
        sigma_t = jnp.sqrt(1.0 - sched.alphas_cumprod[t])
        sigma_next = jnp.sqrt(jnp.where(t_next < 0, 0.0, 1.0 - sched.alphas_cumprod[jnp.maximum(t_next, 0)]))
        # 2M correction: D = x0 + (x0 - prev_x0) / (2 r), r = h_prev / h
        h_prev = lam_t - prev_lam
        r = h_prev / jnp.where(h == 0, 1.0, h)
        d2 = x0 + (x0 - prev_x0) / jnp.maximum(2.0 * r, 1e-6)
        d = jnp.where(has_prev, d2, x0)
        out = (sigma_next / sigma_t) * x - alpha_next * jnp.expm1(-h) * d
        out = jnp.where(t_next < 0, x0, out)
        return (out, x0, lam_t, jnp.ones((), bool)), (out, additional)

    init = (img0, jnp.zeros(shape, jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), bool))
    (img, _, _, _), (traj, adds) = jax.lax.scan(step, init, pairs)
    if return_every is None:
        additional = (
            None if additional_channels == 0
            else jax.tree_util.tree_map(lambda a: a[-1], adds)
        )
        return img, additional
    traj = jnp.concatenate([img0[None], traj], axis=0)
    traj = jnp.moveaxis(traj, 0, 1)  # (B, S+1, ...)
    idx = list(range(0, S + 1, max(1, int(return_every))))
    if idx[-1] != S:
        idx.append(S)
    if additional_channels:
        adds = jnp.moveaxis(adds, 0, 1)  # (B, S, ...) — no initial-noise frame
        adds = adds[:, jnp.asarray([max(i - 1, 0) for i in idx])]
    else:
        adds = None
    return traj[:, jnp.asarray(idx)], adds


def sample(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    external_cond: Optional[Array] = None,
    additional_channels: int = 0,
    return_every: Optional[int] = None,
):
    """Dispatcher (reference :776-784): DDIM when sampling_timesteps < T.

    ``sched.sampler`` overrides the automatic choice: 'ancestral' / 'ddim'
    force the reference samplers; 'dpmpp' selects the DPM-Solver++(2M)
    few-step extension (same per-step cost as DDIM, fewer steps needed).
    """
    if sched.sampler == "dpmpp":
        return dpmpp_sample(
            sched, model_fn, rng, shape, external_cond,
            additional_channels, return_every,
        )
    if sched.sampler == "ddim" or (
        sched.sampler == "auto" and sched.is_ddim_sampling
    ):
        return ddim_sample(
            sched, model_fn, rng, shape, external_cond,
            additional_channels, return_every,
        )
    return p_sample_loop(
        sched, model_fn, rng, shape, external_cond, additional_channels, return_every
    )


def interpolate(
    sched: Schedule,
    model_fn: ModelFn,
    rng: jax.Array,
    x1: Array,
    x2: Array,
    t: Optional[int] = None,
    lam: float = 0.5,
    external_cond: Optional[Array] = None,
) -> Array:
    """Latent interpolation (reference :786-804)."""
    t = sched.num_timesteps - 1 if t is None else t
    rng, k1, k2 = jax.random.split(rng, 3)
    bt = jnp.full((x1.shape[0],), t, jnp.int32)
    nshape = x1.shape[:-1] + (2,) if sched.noise_space == "flow" else x1.shape
    xt1 = q_sample(sched, x1, bt, jax.random.normal(k1, nshape, x1.dtype))
    xt2 = q_sample(sched, x2, bt, jax.random.normal(k2, nshape, x2.dtype))
    img = (1 - lam) * xt1 + lam * xt2

    def step(carry, i):
        img, rng = carry
        rng, noise_rng = jax.random.split(rng)
        bt = jnp.full((x1.shape[0],), i, jnp.int32)
        _, x_start, _ = model_predictions(
            sched, model_fn, img, bt, external_cond=external_cond
        )
        x_start = jnp.clip(x_start, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_start, img, bt)
        if sched.noise_space == "flow":
            fnoise = jax.random.normal(
                noise_rng, img.shape[:-1] + (2,), img.dtype
            )
            warped = permute_warp(mean, jnp.exp(0.5 * log_var) * fnoise)
            return (jnp.where(i > 0, warped, mean), rng), None
        noise = jax.random.normal(noise_rng, img.shape, img.dtype)
        noise = jnp.where(i > 0, noise, 0.0)
        return (mean + jnp.exp(0.5 * log_var) * noise, rng), None

    (img, _), _ = jax.lax.scan(step, (img, rng), jnp.arange(t - 1, -1, -1))
    return img


__all__ = [
    "Schedule", "make_schedule", "extract", "q_sample", "q_posterior",
    "predict_start_from_noise", "predict_noise_from_start", "predict_v",
    "predict_start_from_v", "model_predictions", "p_losses", "pyramid_loss",
    "p_sample_loop", "ddim_sample", "dpmpp_sample", "sample", "interpolate",
    "linear_beta_schedule", "cosine_beta_schedule", "sigmoid_beta_schedule",
]
