"""FlowDiffuser: flow-conditioned DDPM over (warped frame, flow) targets.

The reference's primary algorithm (flow_diffuser.py:65-388): a conditional
diffusion model that, given frame1, denoises to the forward-warped frame and
its optical flow jointly (``target='joint'``), or to the warped frame with
the flow as an auxiliary head (``'target'``), or to the flow alone
(``'flow'``); optionally in a frozen-autoencoder latent space.

TPU-native design: ``UnetWithWarp`` is a flax module whose forward pass runs
the UNet and the differentiable splat warp in one XLA program; training and
the full reverse-diffusion sampler are pure functions jitted over the mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .augmentation import augment
from .base import Algorithm, pair_batch
from ..config import Config
from ..models import diffusion as dm
from ..models.autoencoder import Autoencoder
from ..models.unet import Unet
from ..ops.warp import warp_forward_flow
from ..parallel.train import TrainState
from ..utils import visualization as viz
from ..utils.grad_stats import tensor_stats

Array = jnp.ndarray


def make_warp_fn(flow_max: float, dim: int):
    """The UnetWithWarp._warp closure (reference flow_diffuser.py:35-36):
    forward-splat `image[..., :dim]` by `flow * flow_max`."""

    def _warp(image, flow, **kwargs):
        return warp_forward_flow(image[..., :dim], flow * flow_max, **kwargs)

    return _warp


class UnetWithWarp(nn.Module):
    """UNet that predicts flow and splats the conditioning by it
    (reference flow_diffuser.py:20-63).  Output channels: warped(dim)
    [+ flow(2) if full_output or additional_out]."""

    flow_max: float
    dim: int
    channels: int
    full_output: bool
    nan_safe: bool = True
    zero_init: bool = True
    time_in: bool = True
    out_dim: int = 2
    # UNet width; 64 = reference-exact (flow_diffuser.py:106).  Config knob
    # ``algorithm.unet_dim`` for small smoke/test models.
    unet_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.model = Unet(
            self.unet_dim,
            channels=self.channels,
            out_dim=self.out_dim,
            time_in=self.time_in,
            zero_init_final=self.zero_init,
            dtype=self.dtype,
        )

    def _warp(self, image, flow, **kwargs):
        # warp values in the model compute dtype: with bf16 the splat's MXU
        # contraction runs single-pass (ops/splat.py precision note);
        # coordinates (flow) stay f32, result cast back for the f32 caller
        src = image[..., : self.dim].astype(self.dtype)
        out = warp_forward_flow(src, flow * self.flow_max, **kwargs)
        return out.astype(image.dtype)

    def __call__(
        self,
        x: Array,
        external_cond: Optional[Array] = None,
        t: Optional[Array] = None,
        self_cond: Optional[Array] = None,
        additional_out: bool = False,
    ) -> Array:
        if self.nan_safe:
            # any(isnan(x), -1) expressed as a NaN-propagating max-reduce:
            # exactly equivalent (XLA maximum returns NaN if either operand
            # is), but an f32 reduce instead of a pred reduce — the pred
            # form cost 13 ms/denoise-step at native-res Sintel from layout
            # handling alone (PERF.md round-2 native profile)
            nan_ch = jnp.isnan(jnp.max(x, axis=-1, keepdims=True)).astype(x.dtype)
            x = jnp.where(jnp.isnan(x), 0.0, x)
            flow = self.model(
                jnp.concatenate([x, nan_ch], axis=-1), external_cond, t, self_cond
            )
        else:
            flow = self.model(x, external_cond, t, self_cond)

        src = external_cond if external_cond is not None else x[..., : self.dim]
        warped = self._warp(src, flow[..., :2])

        out = warped
        if self.full_output:
            out = jnp.concatenate([out, flow], axis=-1)
        if additional_out and not self.full_output:
            out = jnp.concatenate([out, flow], axis=-1)
        return out


class FlowDiffuser(Algorithm):
    name = "flow_diffuser"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.flow_max = float(cfg.flow_max)
        self.latent_max = float(cfg.get("latent_max", 1.0))
        self.is_diffusion = bool(cfg.is_diffusion)
        self.latent = bool(cfg.latent)
        self.target = cfg.target
        self.image_size = int(cfg.image_size)
        self.dim = int(cfg.latent_dim) if self.latent else 3

        if self.target == "target":
            unet_dims = self.dim + 1  # +1 nan channel
        elif self.target == "joint":
            unet_dims = self.dim + 3
        else:
            unet_dims = 2

        # diffusion-state channel count (reference flow_diffuser.py:120).
        # The reference sets channels=latent_dim for ALL latent targets,
        # which drops the 2 flow channels from the latent+joint sampling
        # shape (and makes latent+flow nonsensical) — a crash in the
        # reference itself; only latent+target worked there.  Fixed here:
        # the state is target-shaped in whatever space (pixel or latent)
        # the model runs in, so the formula is uniform with self.dim
        # already equal to latent_dim in latent mode.
        if self.target == "target":
            self.channels = self.dim          # warped image
        elif self.target == "joint":
            self.channels = self.dim + 2      # warped image + flow
        else:
            self.channels = 2                 # flow only

        unet_in = self.dim + unet_dims * int(self.is_diffusion)
        unet_dim = int(cfg.get("unet_dim", 64))
        self.module = UnetWithWarp(
            flow_max=self.flow_max,
            dim=self.dim,
            channels=unet_in,
            full_output=(self.target == "joint"),
            nan_safe=self.target in ("target", "joint"),
            zero_init=bool(cfg.get("zero_init", True)),
            time_in=self.is_diffusion,
            unet_dim=unet_dim,
            dtype=self.dtype,
        )
        self._plain_unet = self.target not in ("target", "joint")
        if self._plain_unet:
            self.module = Unet(
                unet_dim, channels=unet_in, out_dim=2,
                time_in=self.is_diffusion,
                zero_init_final=bool(cfg.get("zero_init", True)),
                dtype=self.dtype,
            )

        if self.is_diffusion:
            self.sched = dm.make_schedule(
                timesteps=int(cfg.timesteps),
                sampling_timesteps=(
                    int(cfg.sampling_timesteps)
                    if cfg.get("sampling_timesteps") else None
                ),
                objective="pred_x0",
                noise_space="image" if cfg.get("noiser", "image") == "image" else "flow",
                min_snr_loss_weight=True,
                # framework extension (default 'auto' = reference dispatch):
                # 'dpmpp' = DPM-Solver++(2M) few-step serving sampler
                sampler=str(cfg.get("sampler", "auto")),
            )

        self.ae = Autoencoder(latent_dim=int(cfg.get("latent_dim", 16)), dtype=self.dtype) if self.latent else None
        self.ae_params = None  # loaded/initialized in init()
        self.warp_fn = make_warp_fn(self.flow_max, self.dim)

    # -- setup ----------------------------------------------------------------
    def init(self, rng, batch, clip=None) -> TrainState:
        img, tgt, flow = batch = pair_batch(batch)
        B = img.shape[0]
        rng, ae_rng = jax.random.split(rng)

        if self.latent:
            if self.cfg.get("ae"):
                from ..utils.ckpt import load_params_from_run

                tmpl = jax.jit(self.ae.init)(
                    ae_rng, jnp.zeros_like(img), jnp.zeros_like(flow)
                )["params"]
                # template is the AE SUBTREE: load_params_from_run validates
                # after extracting ``prefix`` from the checkpoint tree
                self.ae_params = load_params_from_run(
                    self.cfg.ae, tmpl, prefix="ae"
                )
            else:
                self.ae_params = jax.jit(self.ae.init)(
                    ae_rng, jnp.zeros_like(img), jnp.zeros_like(flow)
                )["params"]

        tgt_x, cond, flow_n = self.preprocess(rng, batch, aug=False)
        t = jnp.zeros((B,), jnp.int32) if self.is_diffusion else None
        if self._plain_unet:
            variables = jax.jit(self.module.init)(rng, tgt_x, cond, t)
        else:
            variables = jax.jit(self.module.init)(rng, tgt_x, cond, t, None)
        tx = self.make_optimizer(clip)
        return TrainState.create(variables["params"], tx)

    def _encode(self, x):
        lat = self.ae.apply(
            {"params": self.ae_params}, x, method=Autoencoder.encode
        )
        return jnp.clip(lat / self.latent_max, -1.0, 1.0)

    def _decode(self, lat, img):
        return self.ae.apply(
            {"params": self.ae_params}, lat * self.latent_max, img,
            method=Autoencoder.decode,
        )

    # -- data -------------------------------------------------------------------
    def preprocess(self, rng, batch, aug: bool = True):
        """reference flow_diffuser.py:136-168."""
        img, tgt, flow = batch = pair_batch(batch)
        if aug:
            img, tgt, flow = augment(rng, img, tgt, flow)
        flow_n = jnp.clip(flow / self.flow_max, -1.0, 1.0)

        if self.latent:
            img = jax.lax.stop_gradient(self._encode(img))
            tgt = jax.lax.stop_gradient(self._encode(tgt))
        else:
            img = 2.0 * img - 1.0
            tgt = 2.0 * tgt - 1.0

        if self.target == "target":
            tgt_x = warp_forward_flow(img, flow_n * self.flow_max)
        elif self.target == "joint":
            tgt_x = jnp.concatenate(
                [warp_forward_flow(img, flow_n * self.flow_max), flow_n], axis=-1
            )
        else:
            tgt_x = flow_n
        return tgt_x, img, flow_n

    # -- model closures ------------------------------------------------------------
    def _model_fn(self, params, additional_out: bool = False):
        if self._plain_unet:
            def fn(x, cond, t, self_cond=None):
                return self.module.apply({"params": params}, x, cond, t)
        else:
            def fn(x, cond, t, self_cond=None):
                return self.module.apply(
                    {"params": params}, x, cond, t, self_cond,
                    additional_out=additional_out,
                )
        if self.cfg.get("_remat"):
            # rematerialize the UNet in the backward pass (trades FLOPs for
            # HBM; enables full-res Sintel training) — runtime.remat=true
            fn = jax.checkpoint(fn, static_argnums=())
        return fn

    def _diffusion_loss(self, params, tgt_x, cond, flow_n, rng, override=None):
        rng_t, rng_p = jax.random.split(rng)
        B = tgt_x.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, self.sched.num_timesteps)
        # opt-in re-enable of the reference's commented-out direct flow-MSE
        # ("flow loss disabled", denoising_diffusion.py:966-974); default
        # 0.0 keeps reference-exact behavior
        flw = float(self.cfg.get("diffusion_flow_weight", 0.0))
        if self.target == "target":
            return dm.p_losses(
                self.sched,
                self._model_fn(params, additional_out=True),
                rng_p, tgt_x, t,
                external_cond=cond, additional_tgt=flow_n,
                warp_fn=self.warp_fn, image_channels=self.dim,
                model_out_override=override, flow_loss_weight=flw,
            )
        return dm.p_losses(
            self.sched, self._model_fn(params), rng_p, tgt_x, t,
            external_cond=cond, warp_fn=self.warp_fn,
            image_channels=self.dim, model_out_override=override,
            flow_loss_weight=flw,
        )

    def loss(self, params, tgt_x, cond, flow_n, rng, override=None):
        """reference flow_diffuser.py:170-187."""
        if self.is_diffusion:
            return self._diffusion_loss(params, tgt_x, cond, flow_n, rng, override)
        out = self.module.apply(
            {"params": params}, cond,
            additional_out=self.target == "target",
        ) if not self._plain_unet else self.module.apply({"params": params}, cond, None, None)
        if self.target in ("target", "joint"):
            loss = jnp.mean(jnp.square(out[..., : self.dim] - tgt_x[..., : self.dim]))
            loss += self.cfg.flow_weight * jnp.mean(
                jnp.square(out[..., self.dim :] - flow_n)
            )
        else:
            loss = jnp.mean(jnp.square(out - flow_n))
        return loss

    # -- training ----------------------------------------------------------------
    def loss_fn(self, params, batch, rng):
        rng_aug, rng_loss = jax.random.split(rng)
        tgt_x, cond, flow_n = self.preprocess(rng_aug, batch, aug=True)
        loss = self.loss(params, tgt_x, cond, flow_n, rng_loss)
        metrics = {}
        metrics.update(tensor_stats("train/cond", cond))
        metrics.update(tensor_stats("train/flow", flow_n))
        return loss, metrics

    # -- sampling -----------------------------------------------------------------
    def sample(self, params, cond, rng, return_every: Optional[int] = 50):
        """reference flow_diffuser.py:189-215. Returns (samples_traj, flow_traj)."""
        B, H, W = cond.shape[0], cond.shape[1], cond.shape[2]
        shape = (B, H, W, self.channels)
        if self.is_diffusion and return_every is not None:
            ancestral = self.sched.sampler == "ancestral" or (
                self.sched.sampler == "auto" and not self.sched.is_ddim_sampling
            )
            if not ancestral:
                # stride over the (short) DDIM trajectory; final state is
                # always kept as the last frame (models/diffusion.py)
                return_every = max(
                    1, min(int(return_every), self.sched.sampling_timesteps)
                )
            else:
                # largest stride <= requested that divides T (parity: 50|1000)
                return_every = min(int(return_every), self.sched.num_timesteps)
                while self.sched.num_timesteps % return_every:
                    return_every -= 1
        if self.is_diffusion:
            if self.target == "target":
                # routed through the dispatcher so algorithm.sampler /
                # sampling_timesteps select DDIM/DPM++ here too (the
                # reference's ddim_sample cannot take additional_tgt and
                # would crash on this target; ours strips the flow
                # channels in all three samplers)
                traj, adds = dm.sample(
                    self.sched, self._model_fn(params, additional_out=True),
                    rng, shape, external_cond=cond,
                    additional_channels=2, return_every=return_every,
                )
                return traj, adds
            traj, _ = dm.sample(
                self.sched, self._model_fn(params), rng, shape,
                external_cond=cond, return_every=return_every,
            )
            if self.target == "joint":
                return traj[..., : self.dim], traj[..., self.dim :]
            # target == 'flow': traj is the flow trajectory; the sample is
            # the cond frame warped by the FINAL flow only (reference :199-202
            # ``samples = warp(img, None, flow[:, -1], mode='forward')``) —
            # returned with a singleton time axis so downstream trajectory
            # slicing ([:, -1]) is uniform across targets
            samples = warp_forward_flow(
                cond[..., : self.dim], traj[:, -1] * self.flow_max
            )
            return samples[:, None], traj
        # non-diffusion single forward
        if self.target in ("target", "joint"):
            out = self.module.apply(
                {"params": params}, cond, additional_out=True
            )
            return out[..., : self.dim], out[..., -2:]
        flow = self.module.apply({"params": params}, cond, None, None)
        samples = warp_forward_flow(cond[..., : self.dim], flow * self.flow_max)
        return samples, flow

    # -- validation -----------------------------------------------------------------
    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        """reference flow_diffuser.py:237-364 (metrics + artifacts)."""
        img, tgt, flow = batch = pair_batch(batch)
        rng_pre, rng_loss, rng_s, rng_i = jax.random.split(rng, 4)
        tgt_x, cond, flow_n = self.preprocess(rng_pre, batch, aug=False)

        loss = self.loss(params, tgt_x, cond, flow_n, rng_loss)

        samples_traj, flow_traj = self.sample(params, cond, rng_s)
        if self.is_diffusion:
            samples = samples_traj[:, -1]
            p_flows = flow_traj[:, -1] * self.flow_max
            mid_samples = samples_traj
            mid_flows = flow_traj * self.flow_max
        else:
            samples = samples_traj
            p_flows = flow_traj * self.flow_max
            mid_samples = samples[:, None]
            mid_flows = p_flows[:, None]

        tgt_cmp = tgt if not self.latent else self._encode(tgt)
        mse = jnp.mean(jnp.square(jnp.nan_to_num(samples) - tgt_cmp))

        # ideal loss: loss the model would get with gt flow substituted
        ideal_warp = warp_forward_flow(
            cond[..., : self.dim], flow_n * self.flow_max
        )
        if self.target == "target":
            ideal = self.loss(
                params, tgt_x, cond, flow_n, rng_loss,
                override=(ideal_warp, flow_n),
            )
        elif self.target == "joint":
            ideal = self.loss(
                params, tgt_x, cond, flow_n, rng_loss,
                override=(jnp.concatenate([ideal_warp, flow_n], axis=-1), None),
            )
        else:
            ideal = loss

        epe = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(flow - p_flows), axis=-1) + 1e-12)
        )
        metrics = {
            "val/loss": loss,
            "val/mse": mse,
            "val/ideal_loss": ideal,
            "val/epe": epe,
        }
        metrics.update(tensor_stats("val/cond", cond))
        metrics.update(tensor_stats("val/flow", flow))
        metrics.update(tensor_stats("val/samples", jnp.nan_to_num(samples)))
        metrics.update(tensor_stats("val/p_flow", p_flows))

        artifacts = {
            "samples": samples,
            "p_flows": p_flows,
            "mid_samples": mid_samples,
            "mid_flows": mid_flows,
            "cond": cond,
            "tgt_x": tgt_x,
            "flow_n": flow_n,
        }

        if self.is_diffusion and self.target in ("target", "joint"):
            # last-step probe (reference :340-349)
            B = img.shape[0]
            out = self._model_fn(params, additional_out=True)(
                tgt_x, cond, jnp.zeros((B,), jnp.int32)
            )
            last_step = out[..., -2:]
            metrics["val/last_step"] = jnp.mean(jnp.square(last_step - flow_n))
            # EPE of the t=0 probe flow: isolates "did the model learn flow"
            # from full-reverse-chain sampling quality (the probe feeds the
            # clean target, reference :340-349)
            metrics["val/last_step_epe"] = jnp.mean(
                jnp.sqrt(jnp.sum(
                    jnp.square(flow - last_step * self.flow_max), axis=-1
                ) + 1e-12)
            )
            artifacts["last_step_flow"] = last_step * self.flow_max

            # gradient-descent-direction flow image (reference :351-364)
            def probe(pf):
                warped = warp_forward_flow(cond, pf)
                return dm.pyramid_loss(
                    warped, tgt_x[..., : self.dim], flow_n, cond,
                    pf / self.flow_max, self.warp_fn,
                )

            grad_flow = -jax.grad(probe)(p_flows)
            artifacts["grad_flow"] = grad_flow

        return metrics, artifacts

    # -- host-side visualization ------------------------------------------------------
    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        img, tgt, flow = (np.asarray(x) for x in pair_batch(batch))
        out = {}
        p_flows = np.asarray(artifacts["p_flows"])
        flows_rgb = viz.flow_to_image(
            np.concatenate([flow, p_flows, flow - p_flows], axis=0)
        )
        B = img.shape[0]
        out["original"] = img
        out["target"] = tgt
        out["diffusion_tgt"] = (
            np.nan_to_num(np.asarray(artifacts["tgt_x"])[..., : self.dim]) + 1.0
        ) * 0.5
        out["gt_flow"] = flows_rgb[:B]
        out["target_p"] = flows_rgb[B : 2 * B]
        out["concat"] = np.concatenate([flows_rgb[:B], flows_rgb[B : 2 * B]], axis=2)
        out["difference"] = flows_rgb[2 * B :]
        samples = np.nan_to_num(np.asarray(artifacts["samples"]))
        if self.latent:
            dec = np.asarray(self._decode(jnp.asarray(samples), jnp.asarray(img)))
            out["samples"] = dec
            out["compare"] = np.concatenate([img, dec], axis=2)
        else:
            out["samples"] = np.clip((samples + 1.0) * 0.5, 0, 1)
        if "grad_flow" in artifacts:
            out["grad_flow"] = viz.flow_to_image(np.asarray(artifacts["grad_flow"]))
        if "last_step_flow" in artifacts:
            ls = viz.flow_to_image(np.asarray(artifacts["last_step_flow"]))
            out["last_step"] = np.concatenate([flows_rgb[:B], ls], axis=2)
        if self.is_diffusion:
            mid = np.nan_to_num(np.asarray(artifacts["mid_samples"]))
            out["mid_samples"] = np.clip(
                (np.concatenate(list(np.moveaxis(mid, 1, 0)), axis=2) + 1) * 0.5, 0, 1
            )
            midf = np.asarray(artifacts["mid_flows"])
            T = midf.shape[1]
            midf_rgb = viz.flow_to_image(midf.reshape((-1,) + midf.shape[2:]))
            midf_rgb = midf_rgb.reshape(midf.shape[:2] + midf_rgb.shape[1:])
            out["mid_flows"] = np.concatenate(list(np.moveaxis(midf_rgb, 1, 0)), axis=2)
        return out


__all__ = ["FlowDiffuser", "UnetWithWarp", "make_warp_fn"]
