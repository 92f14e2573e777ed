"""FlowLearner: unsupervised optical flow via multi-scale splat photometrics.

Rebuild of the reference FlowLearner (flow_learner.py:62-424): a UNet maps a
frame pair (6ch) to flow (2ch) + splat weight (1ch); the loss is the fused
multi-scale/offset photometric pyramid (ops/pyramid.py collapses the
reference's ~832 kernel launches per step into one XLA program per level)
plus edge-aware smoothness.  The filter representation (``cfg.radius``) maps
the pair to a per-pixel R x R gather filter with color columns, adding the
occlusion-masked no-color photometric term and a sparsity prior.

Parity note: the reference's filter-rep loss branch crashes as written
(flow_learner.py:137 passes ``additional_out=`` to FilterUnet.forward which
does not accept it) and then reads the last 3 channels of the packed filter
as (flow, weight) (flow_learner.py:140-142).  This rebuild implements the
documented intent instead: the filter's mean tap offset (filter_to_flow) is
the flow estimate driving the photometric pyramid, with uniform weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .augmentation import augment
from .base import Algorithm, pair_batch
from ..config import Config
from ..models.unet import Unet
from ..models.filter_codec import ConvToFilter
from ..ops import filters as fops
from ..ops.pyramid import photometric_pyramid_loss, DEFAULT_LEVELS
from ..ops.splat import softsplat
from ..ops.warp import edgeaware_smoothness1, fill_holes_nan
from ..parallel.train import TrainState
from ..utils import visualization as viz
from ..utils.grad_stats import tensor_stats

Array = jnp.ndarray


class FlowUnet(nn.Module):
    """UNet emitting (flow 2ch + splat weight 1ch) from a 6ch frame pair
    (the reference's UnetWithWarp(nan_safe=False) usage, flow_learner.py:84-89)."""

    zero_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Array) -> Array:
        return Unet(
            64, channels=6, out_dim=3, time_in=False,
            zero_init_final=self.zero_init, dtype=self.dtype,
        )(cond, None, None)


class FilterUnet(nn.Module):
    """UNet emitting a packed per-pixel filter [R^2, col(3), colw(1)]
    (reference flow_learner.py:23-59), optionally through the ConvToFilter
    coarse-to-fine codec."""

    radius: int
    c2f: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: Array) -> Array:
        dim = 81 if self.c2f else self.radius ** 2
        out = Unet(
            64, channels=6, out_dim=dim + 4, time_in=False, dtype=self.dtype
        )(cond, None, None)
        if self.c2f:
            cols = out[..., -4:]
            fil = ConvToFilter(self.radius, in_dim=81)(out[..., :-4])
            out = jnp.concatenate([fil, cols], axis=-1)
        # normalization (flow_learner.py:55-59)
        mean_val = jnp.full((self.radius ** 2 + 4,), self.radius ** 2 + 1, jnp.float32)
        mean_val = mean_val.at[-4:-1].set(2.0)
        return (out + 1.0) / mean_val


class FlowLearner(Algorithm):
    name = "flow_learner"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        if "radius" in dir(cfg) and cfg.get("radius") is not None:
            self.radius = int(cfg.radius)
            if "flow_max" in dir(cfg) and cfg.get("flow_max") is not None:
                raise ValueError("cannot specify both flow_max and radius")
            self.flow_max = self.radius // 2
            self.rep = "filter"
            self.module = FilterUnet(self.radius, c2f=bool(cfg.get("c2f", False)), dtype=self.dtype)
        else:
            self.radius = None
            self.flow_max = float(cfg.flow_max)
            self.rep = "flow"
            self.module = FlowUnet(zero_init=bool(cfg.get("zero_init", True)), dtype=self.dtype)
        self.levels = tuple(cfg.get("levels", DEFAULT_LEVELS))

    def init(self, rng, batch, clip=None) -> TrainState:
        img, tgt, flow = batch = pair_batch(batch)
        cond = jnp.concatenate([2.0 * img - 1.0, 2.0 * tgt - 1.0], axis=-1)
        variables = jax.jit(self.module.init)(rng, cond)
        return TrainState.create(variables["params"], self.make_optimizer(clip))

    # -- data ------------------------------------------------------------------
    def preprocess(self, rng, batch, aug=True):
        """reference flow_learner.py:104-120."""
        img, tgt, flow = batch = pair_batch(batch)
        if aug:
            img, tgt, flow = augment(rng, img, tgt, flow)
        flow_n = jnp.clip(flow / self.flow_max, -1.0, 1.0)
        img = 2.0 * img - 1.0
        tgt = 2.0 * tgt - 1.0
        return tgt, jnp.concatenate([img, tgt], axis=-1), flow_n

    # -- loss ------------------------------------------------------------------
    def _predict(self, params, cond):
        """Returns (flow_pred [pixels], warp_weights, packed_filter | None)."""
        out = self.module.apply({"params": params}, cond)
        if self.rep == "flow":
            flow_pred = out[..., :2] * self.flow_max
            weights = out[..., 2:3]
            return flow_pred, weights, None
        packed = out
        flow_pred = fops.filter_to_flow(packed)
        weights = jnp.ones_like(flow_pred[..., :1])
        return flow_pred, weights, packed

    def loss(self, params, tgt, cond, flow_n, override_flow=None):
        """reference flow_learner.py:133-222 (fused pyramid)."""
        if override_flow is None:
            flow_pred, weights, packed = self._predict(params, cond)
        else:
            flow_pred = override_flow * self.flow_max
            weights = jnp.ones_like(flow_pred[..., :1])
            packed = None

        img = cond[..., :3]
        # compute dtype applies to the photometric pyramid too (the splat
        # contraction precision keys off the value dtype — ops/pyramid.py):
        # bf16 under runtime.precision=bf16, exactly like the flagship's
        # in-model splat; f32 (reference-grade, exact 6-pass MXU) by default.
        loss = photometric_pyramid_loss(
            img.astype(self.dtype), tgt.astype(self.dtype),
            flow_pred, weights, self.levels,
        )
        loss = loss + 0.01 * edgeaware_smoothness1(img, flow_pred)

        if packed is not None:
            # no-color photometric with occlusion mask (flow_learner.py:210-220)
            packed_noim = packed.at[..., -1].set(0.0)
            warped_noim = fops.warp_forward_filter(img, packed_noim)
            if self.cfg.get("occlusion_mask", True):
                mask = fops.occlusion_mask(packed_noim)
            else:
                mask = jnp.ones_like(img[..., :1])
            diff = jnp.square(warped_noim - tgt) * mask
            noim_photo = jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * 3, 1.0)
            sparsity = jnp.mean(jnp.abs(packed[..., : self.radius ** 2]))
            loss = loss + noim_photo + sparsity * self.cfg.get("sparsity_weight", 0.0)
        return loss

    def loss_fn(self, params, batch, rng):
        tgt, cond, flow_n = self.preprocess(
            rng, batch, aug=bool(self.cfg.get("train_aug", True))
        )
        loss = self.loss(params, tgt, cond, flow_n)
        metrics = {}
        metrics.update(tensor_stats("train/cond", cond))
        metrics.update(tensor_stats("train/flow", flow_n))
        return loss, metrics

    # -- sampling / validation -----------------------------------------------------
    def sample(self, params, cond):
        """reference flow_learner.py:224-285."""
        flow_pred, weights, packed = self._predict(params, cond)
        sw = softsplat(cond[..., :3], flow_pred, weights, "soft")
        samples = fill_holes_nan(sw[..., :-1], sw[..., -1:])
        return samples, flow_pred, weights, packed

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        img, tgt, flow = batch = pair_batch(batch)
        tgt_, cond, flow_n = self.preprocess(rng, batch, aug=False)

        loss = self.loss(params, tgt_, cond, flow_n)
        ideal = self.loss(params, tgt_, cond, flow_n, override_flow=flow_n)
        samples, p_flows, warp_weights, packed = self.sample(params, cond)
        samples_f = jnp.nan_to_num(samples)
        mse = jnp.mean(jnp.square(samples_f - tgt))
        flow_mse = jnp.mean(jnp.square(flow_n - p_flows / self.flow_max))
        epe = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(flow - p_flows), axis=-1) + 1e-12)
        )

        metrics = {
            "val/loss": loss,
            "val/ideal_loss": ideal,
            "val/mse": mse,
            "val/flow_mse": flow_mse,
            "val/epe": epe,
        }
        metrics.update(tensor_stats("val/cond", cond))
        metrics.update(tensor_stats("val/flow", flow))
        metrics.update(tensor_stats("val/samples", samples_f))
        metrics.update(tensor_stats("val/p_flow", p_flows))
        if packed is not None:
            fil = packed[..., : self.radius ** 2]
            metrics["val/filter_sum"] = jnp.mean(jnp.sum(fil, axis=-1))
            metrics["val/filter_min"] = jnp.min(fil)
            metrics["val/filter_max"] = jnp.max(fil)
            metrics["val/filter_sparsity"] = jnp.mean(
                jnp.max(jnp.abs(fil), axis=-1)
                / (1e-4 + jnp.sum(jnp.abs(fil), axis=-1))
            )

        # grad_flow probe (flow_learner.py:364-374)
        def probe(pf):
            return self.loss(params, tgt_, cond, flow_n, override_flow=pf / self.flow_max)

        grad_flow = -jax.grad(probe)(p_flows)

        artifacts = {
            "samples": samples_f,
            "p_flows": p_flows,
            "warp_weights": warp_weights,
            "grad_flow": grad_flow,
        }
        return metrics, artifacts

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        img, tgt, flow = (np.asarray(x) for x in pair_batch(batch))
        p_flows = np.asarray(artifacts["p_flows"])
        B = img.shape[0]
        flos = viz.flow_to_image(
            np.concatenate([flow, p_flows, flow - p_flows], axis=0)
        )
        out = {
            "original": img,
            "target": tgt,
            "gt_flow": flos[:B],
            "target_p": flos[B : 2 * B],
            "concat": np.concatenate([flos[:B], flos[B : 2 * B]], axis=2),
            "difference": flos[2 * B :],
            "warp_weights": np.asarray(artifacts["warp_weights"]),
            "samples": np.clip((np.asarray(artifacts["samples"]) + 1) * 0.5, 0, 1),
            "grad_flow": viz.flow_to_image(np.asarray(artifacts["grad_flow"])),
        }
        return out


__all__ = ["FlowLearner", "FlowUnet", "FilterUnet"]
