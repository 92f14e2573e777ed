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


def pair_batch(batch):
    """(img, tgt, flow) from either a pair dataset or a 3-frame dataset.

    Sintel emits (frame1, frame2, frame3, flow) where the GT .flo at frame n
    is the forward flow frame2 -> frame3 (reference sintel.py:70-98: images
    n-1, n, n+1 with flow indexed at n).  The reference's pair algorithms
    unpack 3 values (flow_diffuser.py:140, augmentation.py:70) and would
    crash on that 4-tuple — its Sintel __getitem__ never ran un-hardcoded.
    This adapter implements the intended pairing: the (frame2, frame3) pair
    whose motion the GT flow describes; 3-frame consumers (PWCLearner) take
    the full tuple."""
    if len(batch) == 4:
        return batch[1], batch[2], batch[3]
    return batch


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
