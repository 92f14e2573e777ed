"""FlowPred: flow-equivariant autoencoder training (reference flow_pred.py:60-124).

Trains the Autoencoder (encode -> warp latent by flow -> decode) with
``ae_frac`` identity mixing: with probability ``ae_frac`` the flow is zeroed
and the reconstruction target is the input frame itself.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .augmentation import augment
from .base import Algorithm, pair_batch
from ..config import Config
from ..models.autoencoder import Autoencoder
from ..parallel.train import TrainState
from ..utils import visualization as viz

Array = jnp.ndarray


class FlowPred(Algorithm):
    name = "flow_pred"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        imsz = [int(x) for x in str(cfg.image_size).split(",")]
        self.image_w, self.image_h = imsz[0], imsz[-1]
        self.ae = Autoencoder(latent_dim=int(cfg.latent_dim), dtype=self.dtype)
        self.ae_frac = float(cfg.get("ae_frac", 0.1))

    def init(self, rng, batch, clip=None) -> TrainState:
        img, tgt, flow = batch = pair_batch(batch)
        variables = jax.jit(self.ae.init)(rng, img, flow)
        return TrainState.create(variables["params"], self.make_optimizer(clip))

    def loss_fn(self, params, batch, rng):
        rng_aug, rng_noise, rng_frac = jax.random.split(rng, 3)
        img, tgt, flow = augment(rng_aug, *batch)
        flow = flow + jax.random.normal(rng_noise, flow.shape, flow.dtype)

        # identity-mixing branch (flow_pred.py:85-90), jit-safe via where
        use_identity = jax.random.bernoulli(rng_frac, self.ae_frac)
        flow_in = jnp.where(use_identity, jnp.zeros_like(flow), flow)
        target = jnp.where(use_identity, img, tgt)

        out = self.ae.apply({"params": params}, img, flow_in)
        loss = jnp.mean(jnp.square(out - target))
        return loss, {}

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        img, tgt, flow = batch = pair_batch(batch)
        out = self.ae.apply({"params": params}, img, flow)
        loss = jnp.mean(jnp.square(out - tgt))
        return {"val/loss": loss}, {"out": out}

    def visualize(self, batch, artifacts) -> Dict[str, np.ndarray]:
        img, tgt, flow = (np.asarray(x) for x in pair_batch(batch))
        return {
            "original": img,
            "target": tgt,
            "gt_flow": viz.flow_to_image(flow),
            "target_p": np.asarray(artifacts["out"]),
        }


__all__ = ["FlowPred"]
