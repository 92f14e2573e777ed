"""CIFAR-style ResNet18/34 (reference classifier/models/resnet.py:1-133), flax/NHWC.

BatchNorm is carried as flax batch_stats collection; the classifier algorithm
threads mutable state through train steps.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(y + x)


class ResNet(nn.Module):
    num_blocks: Sequence[int]
    num_classes: int = 10
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 features: bool = False) -> Array:
        """``features=True`` returns the penultimate pooled embedding (the
        512-d global-average-pool output) instead of logits — the trained
        feature extractor for Frechet-distance tracking (utils/fid.py)."""
        x = nn.Conv(64, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        for planes, n, first_stride in zip(
            (64, 128, 256, 512), self.num_blocks, (1, 2, 2, 2)
        ):
            for i in range(n):
                x = BasicBlock(planes, first_stride if i == 0 else 1,
                               dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if features:
            return x
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


def ResNet18(num_classes: int = 10, in_channels: int = 3) -> ResNet:
    return ResNet((2, 2, 2, 2), num_classes, in_channels)


def ResNet34(num_classes: int = 10, in_channels: int = 3) -> ResNet:
    return ResNet((3, 4, 6, 3), num_classes, in_channels)


__all__ = ["ResNet", "ResNet18", "ResNet34", "BasicBlock"]
