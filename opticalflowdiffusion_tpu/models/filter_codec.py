"""Filter <-> compact conv codecs (reference filter.py:5-46).

``FilterToConv`` is a passthrough in the reference (filter.py:17 returns its
input before the conv stack) — kept as an explicit identity with the conv
stack preserved behind ``enabled`` for parity.  ``ConvToFilter`` expands an
81-dim per-pixel code to an R^2 filter via transposed convs over the filter
grid (applied pointwise across the image).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class FilterToConv(nn.Module):
    radius: int
    out_dim: int = 216
    enabled: bool = False  # reference filter.py:17: forward returns x

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if not self.enabled:
            return x
        B, H, W, _ = x.shape
        f = x.reshape(B * H * W, self.radius, self.radius, 1)
        f = nn.relu(nn.Conv(8, (5, 5), strides=2)(f))
        f = nn.relu(nn.Conv(32, (5, 5), strides=2)(f))
        f = nn.relu(nn.Conv(self.out_dim // 9, (3, 3), strides=2)(f))
        return f.reshape(B, H, W, -1)


class ConvToFilter(nn.Module):
    """(B,H,W,81) code -> (B,H,W,R^2) filter (reference filter.py:26-46)."""

    radius: int
    in_dim: int = 81

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, _ = x.shape
        f = x.reshape(B * H * W, 3, 3, self.in_dim // 9)
        f = nn.relu(nn.ConvTranspose(32, (3, 3), strides=(2, 2))(f))
        f = nn.relu(nn.ConvTranspose(8, (5, 5), strides=(2, 2))(f))
        f = nn.relu(nn.ConvTranspose(1, (5, 5), strides=(2, 2))(f))
        f = f.reshape(B, H, W, -1)
        return nn.Dense(self.radius ** 2)(f)


__all__ = ["FilterToConv", "ConvToFilter"]
