"""RAFT optical flow, flax/NHWC.

Rebuild of the reference's experimental filter-representation RAFT
(future/raft.py:27-142, raft_update.py:1-137, raft_extractor.py:1-262,
raft_corr.py:12-60): BasicEncoder feature/context networks (stride 8),
all-pairs matmul correlation with a 4-level average-pool pyramid and
radius-4 bilinear window lookup, and a SepConvGRU update block.

The reference forward is broken as shipped (future/raft.py:48-49 sets
f2c/c2f to None then calls them; :94 compares image1 to itself).  This
rebuild is a WORKING model with two modes:

 * ``radius=None`` (default): standard 2-channel flow RAFT — used by the
   TaiChi offline flow precompute (data/taichi.py) in place of torchvision's
   pretrained raft_large.
 * ``radius=R``: the reference's intended filter representation — the
   iterated state is an R^2 per-pixel filter passed through the
   FilterToConv/ConvToFilter codecs, with coords driven by the filter's mean
   tap offset.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .filter_codec import ConvToFilter, FilterToConv
from ..ops.correlation import allpairs_correlation, avg_pool2d
from ..ops.warp import bilinear_gather

Array = jnp.ndarray


class ResidualBlock(nn.Module):
    planes: int
    norm: str = "instance"
    stride: int = 1

    def _norm(self, x):
        if self.norm == "instance":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        if self.norm == "group":
            return nn.GroupNorm(num_groups=8)(x)
        return x  # 'none' (batch norm approximated as none for stability)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(self._norm(nn.Conv(self.planes, (3, 3), strides=self.stride)(x)))
        y = nn.relu(self._norm(nn.Conv(self.planes, (3, 3))(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = self._norm(nn.Conv(self.planes, (1, 1), strides=self.stride)(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 feature encoder (reference raft_extractor.py BasicEncoder)."""

    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(64, (7, 7), strides=2)(x)
        if self.norm == "instance":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = nn.relu(x)
        for planes, stride in ((64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)):
            x = ResidualBlock(planes, self.norm, stride)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


def corr_pyramid(fmap1: Array, fmap2: Array, num_levels: int = 4) -> List[Array]:
    """All-pairs correlation + average-pool pyramid (raft_corr.py:12-29)."""
    B, H, W, _ = fmap1.shape
    corr = allpairs_correlation(fmap1, fmap2)  # (B, H, W, H2, W2)
    corr = corr.reshape(B * H * W, H, W, 1)
    # clamp pyramid depth so the coarsest level stays >= 1 px (small inputs)
    max_levels = 1 + min(H, W).bit_length() - 1
    num_levels = min(num_levels, max(1, max_levels))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        c = pyramid[-1]
        c = avg_pool2d(jnp.moveaxis(c, -1, 1), 2)  # pool spatial dims of target
        pyramid.append(jnp.moveaxis(c, 1, -1))
    return pyramid


def corr_lookup(pyramid: Sequence[Array], coords: Array, radius: int = 4) -> Array:
    """Bilinear lookup in a (2r+1)^2 window at each pyramid level
    (raft_corr.py:30-50).  coords: (B, H, W, 2) absolute target coords."""
    B, H, W, _ = coords.shape
    out = []
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ddy, ddx = jnp.meshgrid(dx, dx, indexing="ij")
    delta = jnp.stack([ddx, ddy], axis=-1).reshape(-1, 2)  # (K, 2)
    K = delta.shape[0]
    for lvl, corr in enumerate(pyramid):
        c = coords.reshape(B * H * W, 1, 1, 2) / (2 ** lvl)
        pts = c + delta.reshape(1, K, 1, 2)  # (BHW, K, 1, 2)
        sampled = bilinear_gather(corr, pts[..., 0], pts[..., 1])  # (BHW,K,1,1)
        out.append(sampled.reshape(B, H, W, K))
    return jnp.concatenate(out, axis=-1)  # (B, H, W, levels*K)


class FlowHead(nn.Module):
    flow_dim: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Conv(256, (3, 3))(x))
        return nn.Conv(self.flow_dim, (3, 3))(x)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        for kernel in ((1, 5), (5, 1)):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding="SAME")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding="SAME")(hx))
            q = nn.tanh(
                nn.Conv(self.hidden_dim, kernel, padding="SAME")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """raft_update.py:81-100."""

    corr_levels: int = 4
    corr_radius: int = 4
    flow_dim: int = 2

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        cor = nn.relu(nn.Conv(256, (1, 1))(corr))
        cor = nn.relu(nn.Conv(192, (3, 3))(cor))
        flo = nn.relu(nn.Conv(128, (7, 7))(flow))
        flo = nn.relu(nn.Conv(64, (3, 3))(flo))
        out = nn.relu(nn.Conv(126, (3, 3))(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """raft_update.py:115-137."""

    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    flow_dim: int = 2
    learn_upsample_mask: bool = True

    @nn.compact
    def __call__(self, net: Array, inp: Array, corr: Array, flow: Array):
        feats = BasicMotionEncoder(
            self.corr_levels, self.corr_radius, self.flow_dim
        )(flow, corr)
        x = jnp.concatenate([inp, feats], axis=-1)
        net = SepConvGRU(self.hidden_dim)(net, x)
        delta = FlowHead(self.flow_dim)(net)
        mask = None
        if self.learn_upsample_mask:
            m = nn.relu(nn.Conv(256, (3, 3))(net))
            mask = 0.25 * nn.Conv(64 * 9, (1, 1))(m)
        return net, delta, mask


def coords_grid(B: int, H: int, W: int) -> Array:
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(grid[None], (B, H, W, 2))


def upflow8(flow: Array) -> Array:
    """Bilinear 8x flow upsample with magnitude rescale (raft_utils.py:79-84)."""
    B, H, W, C = flow.shape
    return 8.0 * jax.image.resize(flow, (B, 8 * H, 8 * W, C), method="bilinear")


def convex_upsample(flow: Array, mask: Array) -> Array:
    """Learned convex-combination 8x upsample (future/raft.py:66-78)."""
    B, H, W, _ = flow.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    from ..ops.filters import unfold

    patches = unfold(8.0 * flow, 3)  # (B,H,W,3,3,2)
    patches = patches.reshape(B, H, W, 9, 1, 1, 2)
    up = jnp.sum(mask[..., None] * patches, axis=3)  # (B,H,W,8,8,2)
    up = up.transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, H * 8, W * 8, 2)


class RAFT(nn.Module):
    radius: Optional[int] = None  # filter representation when set
    iters: int = 12
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4

    def setup(self):
        self.fnet = BasicEncoder(output_dim=256, norm="instance")
        self.cnet = BasicEncoder(
            output_dim=self.hidden_dim + self.context_dim, norm="none"
        )
        self.flow_dim = 289 if self.radius is not None else 2
        self.update_block = BasicUpdateBlock(
            self.corr_levels, self.corr_radius, self.hidden_dim,
            flow_dim=self.flow_dim,
            learn_upsample_mask=self.radius is None,
        )
        if self.radius is not None:
            self.f2c = FilterToConv(self.radius, out_dim=self.flow_dim)
            self.c2f = ConvToFilter(self.radius, in_dim=self.flow_dim)

    def _vector_from_filter(self, fil: Array) -> Array:
        R = self.radius
        f = fil[..., : R * R]
        f = f.reshape(f.shape[:-1] + (R, R))
        idx = (jnp.arange(R) - R // 2).astype(fil.dtype)
        dy = jnp.einsum("bhwij,i->bhw", f, idx)
        dx = jnp.einsum("bhwij,j->bhw", f, idx)
        return jnp.stack([dx, dy], axis=-1)

    def __call__(self, image1: Array, image2: Array, iters: Optional[int] = None):
        iters = iters or self.iters
        fmap1 = self.fnet(image1)
        fmap2 = self.fnet(image2)
        pyramid = corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., : self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim :])

        B, H, W = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(B, H, W)

        predictions = []
        if self.radius is None:
            flow = jnp.zeros((B, H, W, 2))
            for _ in range(iters):
                coords1 = jax.lax.stop_gradient(coords0 + flow)
                corr = corr_lookup(pyramid, coords1, self.corr_radius)
                net, delta, mask = self.update_block(net, inp, corr, flow)
                flow = flow + delta
                if mask is not None:
                    predictions.append(convex_upsample(flow, mask))
                else:
                    predictions.append(upflow8(flow))
            return predictions

        # filter representation (reference future/raft.py:117-139 intent)
        fil = jnp.full((B, H, W, self.radius ** 2), 0.5)
        for _ in range(iters):
            vec = self._vector_from_filter(2.0 * fil - 1.0)
            coords1 = jax.lax.stop_gradient(coords0 + vec)
            corr = corr_lookup(pyramid, coords1, self.corr_radius)
            net, delta, _ = self.update_block(net, inp, corr, self.f2c(fil))
            fil = fil + self.c2f(delta)
            up = jax.image.resize(
                fil, (B, H * 8, W * 8, fil.shape[-1]), method="bilinear"
            )
            predictions.append(2.0 * up - 1.0)
        return predictions


__all__ = [
    "RAFT", "BasicEncoder", "BasicUpdateBlock", "corr_pyramid", "corr_lookup",
    "coords_grid", "upflow8", "convex_upsample",
]
