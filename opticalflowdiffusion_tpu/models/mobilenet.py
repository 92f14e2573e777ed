"""MobileNetV2 (reference classifier/models/mobilenet_v2.py:1-86, kuangliu CIFAR
variant), flax/NHWC."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

# (expansion, out_planes, num_blocks, stride)
_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 1),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    expansion: int
    out_planes: int
    stride: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        in_planes = x.shape[-1]
        planes = self.expansion * in_planes
        y = nn.Conv(planes, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(planes, (3, 3), strides=self.stride,
                    feature_group_count=planes, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_planes, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if self.stride == 1:
            if in_planes != self.out_planes:
                sc = nn.Conv(self.out_planes, (1, 1), use_bias=False)(x)
                sc = nn.BatchNorm(use_running_average=not train)(sc)
            else:
                sc = x
            y = y + sc
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 10
    in_channels: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = nn.Conv(32, (3, 3), use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        for expansion, out_planes, num_blocks, stride in _CFG:
            for i in range(num_blocks):
                x = InvertedResidual(
                    expansion, out_planes, stride if i == 0 else 1
                )(x, train)
        x = nn.Conv(1280, (1, 1), use_bias=False)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train)(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


__all__ = ["MobileNetV2", "InvertedResidual"]
