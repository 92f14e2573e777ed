"""Common small models (reference algorithms/common/): SimpleMlp,
CnnEncoder/CnnDecoder (64x64), customizable CNN, and the ``bottle``
time-batch wrapper."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class SimpleMlp(nn.Module):
    """reference common/models/mlp.py:7-22."""

    out_dim: int = 1
    hidden_dim: int = 64
    n_layers: int = 2
    activation: Callable = nn.relu
    output_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(self.n_layers - 1):
            x = self.activation(nn.Dense(self.hidden_dim)(x))
        x = nn.Dense(self.out_dim)(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


class CnnEncoder(nn.Module):
    """64x64 image -> embedding (reference common/models/cnn.py:6-28)."""

    embedding_size: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for f in (32, 64, 128, 256):
            x = self.activation(nn.Conv(f, (4, 4), strides=2, padding="VALID")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.embedding_size)(x)


class CnnDecoder(nn.Module):
    """embedding -> 64x64 image (reference common/models/cnn.py:31-56)."""

    embedding_size: int
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, emb: Array) -> Array:
        x = nn.Dense(128)(emb)
        x = x.reshape(x.shape[0], 1, 1, 128)
        for f, k in ((128, 5), (64, 5), (32, 6)):
            x = self.activation(
                nn.ConvTranspose(f, (k, k), strides=(2, 2), padding="VALID")(x)
            )
        return nn.ConvTranspose(3, (6, 6), strides=(2, 2), padding="VALID")(x)


class CustomizableCnn(nn.Module):
    """Configurable conv stack (reference common/models/cnn_customizable.py)."""

    features: Sequence[int] = (32, 64, 128)
    kernel: int = 3
    strides: int = 2
    out_dim: Optional[int] = None
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for f in self.features:
            x = self.activation(
                nn.Conv(f, (self.kernel, self.kernel), strides=self.strides)(x)
            )
        if self.out_dim is not None:
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(self.out_dim)(x)
        return x


def bottle(f: Callable, x_tuple: Sequence[Array]):
    """Apply f over (T, B, ...) inputs by flattening time into batch
    (reference common/bottle.py:1-7)."""
    sizes = [x.shape for x in x_tuple]
    flat = [x.reshape((s[0] * s[1],) + s[2:]) for x, s in zip(x_tuple, sizes)]
    y = f(*flat)
    return y.reshape(sizes[0][:2] + y.shape[1:])


__all__ = ["SimpleMlp", "CnnEncoder", "CnnDecoder", "CustomizableCnn", "bottle"]
