"""Correlation cost volumes, TPU-native.

Equivalents of the reference's compiled CUDA correlation ops:

* :func:`local_correlation` — the ``spatial_correlation_sampler`` package
  (kernel_size=1, patch_size=9) used by PWCNet (reference pwc_net.py:93-96):
  an 81-channel local displacement cost volume.  Implemented as a single
  patch-extraction (MXU identity conv) + einsum instead of a hand-rolled CUDA
  gather.
* :func:`pwc_index_reorder` — the fwd/bwd channel reorder PWCNet applies
  (pwc_net.py:38-41): a transpose+flip of the (dy, dx) displacement grid.
* :class:`CorrBlock` semantics for RAFT (reference future/raft_corr.py:12-60):
  all-pairs matmul correlation + average-pool pyramid + windowed bilinear
  lookup; see models/raft.py for the consumer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .filters import unfold

Array = jax.Array


def local_correlation(feat_a: Array, feat_b: Array, patch_size: int = 9) -> Array:
    """Local displacement cost volume.

    out[b, y, x, p] with p = i*patch+j corresponds to displacement
    (dy, dx) = (i - patch//2, j - patch//2):
      sum_c feat_a[b,y,x,c] * feat_b[b, y+dy, x+dx, c]   (zero outside).

    Matches SpatialCorrelationSampler(kernel_size=1, patch_size=9).flatten(1,2)
    channel ordering (reference pwc_net.py:93-96).
    """
    patches = unfold(feat_b, patch_size)  # (B,H,W,P,P,C)
    corr = jnp.einsum("bhwc,bhwijc->bhwij", feat_a, patches)
    B, H, W = corr.shape[:3]
    return corr.reshape(B, H, W, patch_size * patch_size)


def _pwc_idx(patch_size: int = 9) -> np.ndarray:
    """The reference's idx_fwd (pwc_net.py:38-40)."""
    n2 = patch_size * patch_size
    idx = [list(range(n, -1, -patch_size)) for n in range(n2 - 1, n2 - 1 - patch_size, -1)]
    return np.array(idx).flatten()


def pwc_index_reorder(corr: Array, direction: str, patch_size: int = 9) -> Array:
    """Apply PWCNet's fwd/bwd displacement-channel reorder (pwc_net.py:143-145).

    ``corr`` is (B, H, W, P*P) channels-last.
    """
    idx = _pwc_idx(patch_size)
    if direction == "bwd":
        idx = idx[::-1]
    return corr[..., jnp.asarray(idx.copy())]


def allpairs_correlation(fmap1: Array, fmap2: Array) -> Array:
    """RAFT all-pairs correlation (reference future/raft_corr.py:52-60).

    fmap (B, H, W, C) -> (B, H, W, H, W) scaled by 1/sqrt(C).
    """
    B, H, W, C = fmap1.shape
    a = fmap1.reshape(B, H * W, C)
    b = fmap2.reshape(B, H * W, C)
    corr = jnp.einsum("bnc,bmc->bnm", a, b, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(C, corr.dtype))
    return corr.reshape(B, H, W, H, W)


def avg_pool2d(x: Array, k: int = 2) -> Array:
    """2x2 average pool over the last two spatial dims of (..., H, W)."""
    *lead, H, W = x.shape
    x = x.reshape(*lead, H // k, k, W // k, k)
    return x.mean(axis=(-3, -1))


__all__ = [
    "local_correlation", "pwc_index_reorder", "allpairs_correlation", "avg_pool2d",
]
