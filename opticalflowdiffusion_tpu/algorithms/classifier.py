"""CIFAR-10 classifier (reference classifier/classifier.py:10-63).

BatchNorm state rides in the param pytree as a ('net', 'batch_stats') pair
updated by the train step (flax mutable collections under a pure loss_fn).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .base import Algorithm
from ..config import Config
from ..models.mobilenet import MobileNetV2
from ..models.resnet import ResNet18, ResNet34
from ..parallel.train import TrainState

arch_registry = dict(
    mobilenet_v2=MobileNetV2,
    resnet18=ResNet18,
    resnet34=ResNet34,
)


class Classifier(Algorithm):
    name = "classifier"

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.module = arch_registry[cfg.arch](
            int(cfg.num_class), int(cfg.in_channels)
        )

    def init(self, rng, batch, clip=None) -> TrainState:
        images, labels = batch
        variables = jax.jit(lambda r, im: self.module.init(r, im, train=False))(
            rng, jnp.asarray(images)
        )
        params = {
            "net": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        return TrainState.create(params, self.make_optimizer(clip))

    def _forward(self, params, images, train: bool):
        variables = {"params": params["net"], "batch_stats": params["batch_stats"]}
        if train:
            logits, updates = self.module.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return logits, updates["batch_stats"]
        logits = self.module.apply(variables, images, train=False)
        return logits, params["batch_stats"]

    def loss_fn(self, params, batch, rng):
        images, labels = batch
        logits, new_stats = self._forward(params, images, train=True)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, {
            "training/accuracy": acc,
            "__mutable__": {"batch_stats": jax.lax.stop_gradient(new_stats)},
        }

    def val_step(self, params, batch, rng) -> Tuple[Dict, Dict]:
        images, labels = batch
        logits, _ = self._forward(params, images, train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return {"validation/loss": loss, "validation/accuracy": acc}, {}


__all__ = ["Classifier", "arch_registry"]
