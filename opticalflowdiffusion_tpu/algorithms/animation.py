"""Animation algorithms: FrameGenerator and FlowCompleter.

Rebuilds of reference diffusion_animation.py:14-247.

* FrameGenerator — conditional DDPM next-frame generator (cond = last frame
  + flow, 8ch input) with autoregressive validation rollout over
  ``val_length`` frames (each rollout step feeds the previous sample back as
  the conditioning frame).
* FlowCompleter — dense-flow completion from sparse flow samples picked by a
  magnitude-weighted sampler, with a learnable null embedding and
  magnitude-weighted MSE.  The reference's WeightedRandomSampler with a
  random count (diffusion_animation.py:168-173) is re-expressed jit-safely
  as a fixed-size Gumbel top-k with a mask over the random count.

Batch layout: TaiChi emits (B, [val_length,] H, W, 8) stacks of
[target(3), last_frame(3), flow(2)] (see data/taichi.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .base import Algorithm
from ..config import Config
from ..models import diffusion as dm
from ..models.unet import Unet
from ..parallel.train import TrainState
from ..utils import visualization as viz

Array = jnp.ndarray

MAX_SPARSE = 9  # reference: randint(8)+1 picks


def weighted_mse_loss(inp, target, weight):
    """diffusion_animation.py:10-11."""
    return jnp.mean(weight * jnp.linalg.norm(inp - target, axis=-1))


class FrameGenerator(Algorithm):
    name = "frame_generator"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.image_size = int(cfg.image_size)
        self.module = Unet(64, channels=3 + 3 + 2, out_dim=3, dtype=self.dtype)
        # reference ConditionalDiffusion defaults (T=1000 ancestral,
        # diffusion_animation.py:31-37); sampling_timesteps opts into DDIM
        # exactly like flow_diffuser.yaml's knob
        self.sched = dm.make_schedule(
            timesteps=int(cfg.get("timesteps", 1000)),
            sampling_timesteps=cfg.get("sampling_timesteps"),
            objective="pred_noise",
        )

    def _model_fn(self, params):
        def fn(x, cond, t, self_cond=None):
            return self.module.apply({"params": params}, x, cond, t)

        return fn

    def init(self, rng, batch, clip=None) -> TrainState:
        x = batch[0]
        if x.ndim == 5:
            x = x[:, 0]
        target, cond = x[..., :3], x[..., 3:]
        variables = jax.jit(self.module.init)(
            rng,
            2 * jnp.asarray(target) - 1,
            jnp.asarray(cond),
            jnp.zeros((target.shape[0],), jnp.int32),
        )
        return TrainState.create(variables["params"], self.make_optimizer(clip))

    def loss_fn(self, params, batch, rng):
        x = batch[0]
        target, cond = x[..., :3], x[..., 3:]
        rng_t, rng_p = jax.random.split(rng)
        B = target.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, self.sched.num_timesteps)
        # auto_normalize=True in the reference ConditionalDiffusion default
        loss = dm.p_losses(
            self.sched, self._model_fn(params), rng_p,
            2 * target - 1, t, external_cond=2 * cond - 1,
        )
        return loss, {}

    def sample(self, params, cond, rng):
        B, H, W = cond.shape[:3]
        img, _ = dm.sample(
            self.sched, self._model_fn(params), rng, (B, H, W, 3),
            external_cond=2 * cond - 1,
        )
        return (img + 1.0) * 0.5

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        x = batch[0]
        rollout = x.ndim == 5
        x0 = x[:, 0] if rollout else x
        target, cond = x0[..., :3], x0[..., 3:]
        rng_l, rng_s, rng_r = jax.random.split(rng, 3)
        loss, _ = self.loss_fn(params, (x0,), rng_l)
        samples = self.sample(params, cond, rng_s)
        metrics = {"val/loss": loss}
        artifacts = {"samples": samples, "targets": target,
                     "last_frames": cond[..., :3], "flows": cond[..., 3:]}

        if rollout:
            # autoregressive rollout (diffusion_animation.py:83-92)
            T = x.shape[1]
            frames = []
            prev = None
            for it in range(T):
                cond_t = x[:, it, ..., 3:]
                if it != 0:
                    cond_t = jnp.concatenate([prev, cond_t[..., 3:]], axis=-1)
                s = self.sample(params, cond_t, jax.random.fold_in(rng_r, it))
                prev = s[..., :3]
                frames.append(s)
            artifacts["rollout"] = jnp.stack(frames, axis=1)
            artifacts["rollout_gt"] = x[..., :3]
        return metrics, artifacts

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        out = {
            "val/samples": np.clip(np.asarray(artifacts["samples"]), 0, 1),
            "val/targets": np.asarray(artifacts["targets"]),
            "val/last_frames": np.asarray(artifacts["last_frames"]),
            "val/flows": viz.flow_to_image(np.asarray(artifacts["flows"])),
        }
        if "rollout" in artifacts:
            ro = np.clip(np.asarray(artifacts["rollout"]), 0, 1)  # (B,T,H,W,3)
            gt = np.asarray(artifacts["rollout_gt"])
            strip = np.concatenate(list(np.moveaxis(ro, 1, 0)), axis=2)
            strip_gt = np.concatenate(list(np.moveaxis(gt, 1, 0)), axis=2)
            out["val/rollout"] = np.concatenate([strip_gt, strip], axis=1)
        return out


class FlowCompleter(Algorithm):
    name = "flow_completer"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.image_size = int(cfg.image_size)
        self.module = FlowCompleterNet()
        self.lmbd = 0.2

    def _sparse_from_dense(self, rng, dense_flow, params):
        """Fixed-size Gumbel top-k sparse picks, magnitude-weighted
        (diffusion_animation.py:159-176 re-expressed jit-safely)."""
        B, H, W, _ = dense_flow.shape
        mags = jnp.linalg.norm(dense_flow, axis=-1)  # (B,H,W)
        smoother = jnp.mean(mags)
        logits = jnp.log(mags.reshape(B, -1) + smoother + 1e-9)
        k1, k2 = jax.random.split(rng)
        gumbel = jax.random.gumbel(k1, logits.shape)
        _, picked = jax.lax.top_k(logits + gumbel, MAX_SPARSE)  # (B, MAX)
        counts = jax.random.randint(k2, (B, 1), 1, MAX_SPARSE + 1)
        keep = jnp.arange(MAX_SPARSE)[None, :] < counts  # (B, MAX)

        mask = jnp.zeros((B, H * W), jnp.float32)
        mask = jax.vmap(
            lambda m, p, k: m.at[p].max(k.astype(jnp.float32))
        )(mask, picked, keep)
        mask = mask.reshape(B, H, W, 1)
        return mask, mags

    def loss_fn(self, params, batch, rng):
        x = batch[0]
        dense_flow = x[..., -2:]
        frame = x[..., 3:6]
        mask, mags = self._sparse_from_dense(rng, dense_flow, params)
        null = params["null_embedding"]  # (2,)
        sparse = mask * dense_flow + (1 - mask) * null[None, None, None, :]
        out = self.module.apply({"params": params["net"]}, sparse, frame)
        # safe denominator: a zero-motion sample in the batch otherwise
        # yields 0/0 -> NaN loss that poisons the params permanently
        # (the reference's mags.max() has the same hazard on static clips)
        peak = jnp.maximum(jnp.max(mags, axis=(1, 2), keepdims=True), 1e-6)
        weight = self.lmbd + mags / peak
        loss = weighted_mse_loss(out, dense_flow, weight)
        return loss, {}

    def init(self, rng, batch, clip=None) -> TrainState:
        x = batch[0]
        if x.ndim == 5:
            x = x[:, 0]
        frame = x[..., 3:6]
        sparse = jnp.zeros(frame.shape[:3] + (2,), jnp.float32)
        net_params = jax.jit(self.module.init)(rng, sparse, frame)["params"]
        params = {"net": net_params, "null_embedding": jnp.ones((2,), jnp.float32)}
        return TrainState.create(params, self.make_optimizer(clip))

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        x = batch[0]
        if x.ndim == 5:
            x = x[:, 0]
        loss, _ = self.loss_fn(params, (x,), rng)
        dense_flow = x[..., -2:]
        frame = x[..., 3:6]
        mask, _ = self._sparse_from_dense(rng, dense_flow, params)
        null = params["null_embedding"]
        sparse = mask * dense_flow + (1 - mask) * null[None, None, None, :]
        out = self.module.apply({"params": params["net"]}, sparse, frame)
        return {"val/loss": loss}, {"out": out, "frame": frame, "dense": dense_flow}

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        return {
            "frames": np.asarray(artifacts["frame"]),
            "real_flows": viz.flow_to_image(np.asarray(artifacts["dense"])),
            "predictions": viz.flow_to_image(np.asarray(artifacts["out"])),
        }


class FlowCompleterNet(nn.Module):
    @nn.compact
    def __call__(self, sparse_flow: Array, frame: Array) -> Array:
        x = jnp.concatenate([sparse_flow, frame], axis=-1)
        return Unet(64, channels=3 + 2, out_dim=2, time_in=False)(x, None, None)


__all__ = ["FrameGenerator", "FlowCompleter", "weighted_mse_loss"]
