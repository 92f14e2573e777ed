"""Algorithm protocol.

The reference's algorithms are ``pl.LightningModule``s (training_step /
validation_step / configure_optimizers).  The TPU-native equivalent is a
plain object exposing *pure functions* the experiment runtime jits over the
device mesh:

  init(rng, batch)            -> TrainState (params + optimizer state)
  loss_fn(params, batch, rng) -> (loss, metrics)          [jitted, grad'd]
  val_step(params, batch, rng)-> (metrics, artifacts)     [jitted]
  visualize(batch, val_out)   -> {key: image}             [host-side, numpy]

``metrics`` keep the reference's wandb key names so runs are comparable.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

import jax.numpy as jnp

from ..config import Config
from ..parallel.train import TrainState, make_optimizer


class Algorithm:
    """Base class; subclasses implement init/loss_fn/val_step."""

    name: str = "base"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # compute dtype (params stay fp32): runtime.precision is injected by
        # the experiment as cfg._precision ('bf16' on TPU by default)
        self.dtype = (
            jnp.bfloat16 if cfg.get("_precision", "float32") == "bf16"
            else jnp.float32
        )

    # -- construction -------------------------------------------------------
    def make_optimizer(self, clip: Optional[float] = None):
        return make_optimizer(
            lr=self.cfg.lr,
            weight_decay=self.cfg.get("weight_decay", 0.0),
            clip=clip,
        )

    def init(self, rng: jax.Array, batch, clip: Optional[float] = None) -> TrainState:
        raise NotImplementedError

    # -- pure steps ----------------------------------------------------------
    def loss_fn(self, params, batch, rng) -> Tuple[jax.Array, Dict]:
        raise NotImplementedError

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        raise NotImplementedError

    # -- host-side logging ----------------------------------------------------
    def visualize(self, batch, val_artifacts) -> Dict[str, Any]:
        """Turn val artifacts into displayable images (numpy, [0,1])."""
        return {}


__all__ = ["Algorithm"]
