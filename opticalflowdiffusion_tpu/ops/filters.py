"""Per-pixel filter ("matrix flow") ops.

TPU-native equivalents of the reference's unfold/scatter filter machinery:
pack/unpack (warp.py:15-27), bound_mask (warp.py:29-39), invert_filter
(warp.py:41-68 and matrix_flow.py:238-279), filter_to_flow (warp.py:70-81),
and the filter warps (warp.py:158-179).

Packed layout (channels-last): ``[fil (R*R), col (C), colweight (1)]`` —
matching warp.py:15-22's unpack. A filter entry ``fil[y, x, i, j]`` is the
gather weight from source pixel ``(y + i - R//2, x + j - R//2)`` into
``(y, x)`` (the unfold semantics of warp.py:166-172).

The unfold itself is ``lax.conv_general_dilated_patches`` — XLA lowers it to
an MXU-friendly convolution with an identity kernel rather than 289 gathers.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def get_radius(num_channels: int, C: int = 3) -> int:
    """Filter radius from packed channel count (reference warp.py:8-13)."""
    R = math.sqrt(num_channels - C - 1)
    assert abs(int(R) - R) < 1e-6 and int(R) % 2 == 1, "bad packed filter size"
    return int(R)


def unpack_flow(flow: Array, C: int = 3) -> Tuple[Array, Array, Array]:
    """Split packed (B,H,W,R²+C+1) into (fil (B,H,W,R,R), col, colw)."""
    B, H, W, K = flow.shape
    R = get_radius(K, C)
    fil = flow[..., : R * R].reshape(B, H, W, R, R)
    col = flow[..., R * R : R * R + C]
    colw = flow[..., -1:]
    return fil, col, colw


def pack_flow(fil: Array, col: Array, colw: Array) -> Array:
    B, H, W = fil.shape[:3]
    return jnp.concatenate([fil.reshape(B, H, W, -1), col, colw], axis=-1)


def unfold(img: Array, R: int) -> Array:
    """Extract RxR patches: (B,H,W,C) -> (B,H,W,R,R,C), zero-padded SAME.

    patches[b,y,x,i,j,c] = img[b, y+i-R//2, x+j-R//2, c] (0 outside).
    """
    B, H, W, C = img.shape
    patches = jax.lax.conv_general_dilated_patches(
        img,
        filter_shape=(R, R),
        window_strides=(1, 1),
        padding=[(R // 2, R // 2), (R // 2, R // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    # conv_general_dilated_patches emits channels ordered (C, i, j).
    patches = patches.reshape(B, H, W, C, R, R)
    return jnp.moveaxis(patches, 3, -1)


def bound_mask(R: int, H: int, W: int, dtype=jnp.float32) -> Array:
    """(H,W,R,R) mask: 1 where tap (y+i-R//2, x+j-R//2) is in bounds."""
    ys = jnp.arange(H)[:, None, None, None]
    xs = jnp.arange(W)[None, :, None, None]
    di = jnp.arange(R)[None, None, :, None] - R // 2
    dj = jnp.arange(R)[None, None, None, :] - R // 2
    sy = ys + di
    sx = xs + dj
    ok = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
    return ok.astype(dtype)


def apply_filter(img: Array, fil: Array) -> Array:
    """Apply per-pixel gather filter: out[y,x] = sum_ij fil[y,x,i,j]*img[y+di,x+dj].

    img (B,H,W,C), fil (B,H,W,R,R) -> (B,H,W,C).
    Equivalent of unfold-multiply-sum (reference warp.py:166-172).
    """
    R = fil.shape[-1]
    patches = unfold(img, R)  # (B,H,W,R,R,C)
    return jnp.einsum("bhwijc,bhwij->bhwc", patches, fil)


def invert_filter(flow: Array, C: int = 3, negate_colweight: bool = False) -> Array:
    """Invert a packed gather filter (reference warp.py:41-68).

    Sends weight-at-offset d gathered into pixel p to weight-at-offset -d
    gathered into pixel p+d: inv[y, x, i', j'] = fil[y-(R//2-i'), x-(R//2-j'),
    R-1-i', R-1-j'].  Positions whose source falls outside the image keep the
    ORIGINAL filter value (the reference writes into a clone under a validity
    mask; unwritten entries keep their old values — reproduced exactly).

    ``negate_colweight`` selects the matrix_flow.py:271-272 variant (colw is
    negated there but not in warp.py:68).
    """
    fil, col, colw = unpack_flow(flow, C)
    B, H, W, R, _ = fil.shape

    ks = jnp.arange(R * R)
    ii = ks // R
    jj = ks % R
    offy = R // 2 - ii  # (R²,)
    offx = R // 2 - jj
    ys = jnp.arange(H)[:, None, None]
    xs = jnp.arange(W)[None, :, None]
    sy = ys - offy[None, None, :]  # (H,W,R²)
    sx = xs - offx[None, None, :]
    valid = (sy >= 0) & (sy < H) & (sx >= 0) & (sx < W)
    syc = jnp.clip(sy, 0, H - 1)
    sxc = jnp.clip(sx, 0, W - 1)

    flat = fil.reshape(B, H, W, R * R)
    flipped_k = (R * R - 1) - ks  # (R-1-i, R-1-j)
    b = jnp.arange(B)[:, None, None, None]
    gathered = flat[b, syc[None], sxc[None], flipped_k[None, None, None, :]]
    inv = jnp.where(valid[None], gathered, flat).reshape(B, H, W, R, R)

    if negate_colweight:
        colw = -colw
    return pack_flow(inv, col, colw)


def filter_to_flow(flow: Array, C: int = 3) -> Array:
    """Mean tap offset of a packed filter -> (B,H,W,2) as (dx, dy).

    Reference warp.py:70-81 (its stacked output order maps to (dx, dy) in the
    splat-kernel convention this framework uses throughout).
    """
    fil, _, _ = unpack_flow(flow, C)
    R = fil.shape[-1]
    idx = (jnp.arange(R) - R // 2).astype(fil.dtype)
    dy = jnp.einsum("bhwij,i->bhw", fil, idx)
    dx = jnp.einsum("bhwij,j->bhw", fil, idx)
    return jnp.stack([dx, dy], axis=-1)


def occlusion_mask(packed: Array, threshold: float = 0.25, C: int = 3) -> Array:
    """Occlusion mask from a forward gather filter (reference
    flow_learner.py:210-216): invert the filter and keep pixels that receive
    at least ``threshold`` total mass — vacated (dis-occluded) destinations
    receive ~0 and are masked out of the photometric term.

    Returns (B, H, W, 1) float mask.
    """
    inverted = invert_filter(flow=packed, C=C)
    R = get_radius(packed.shape[-1], C)
    mass = jnp.sum(inverted[..., : R * R], axis=-1)
    return (mass > threshold).astype(jnp.float32)[..., None]


def warp_backward_filter(second: Array, flow: Array) -> Array:
    """Filter-representation backward warp (reference warp.py:158-175)."""
    B, H, W, C = second.shape
    fil, col, colw = unpack_flow(flow, C)
    fil = fil * bound_mask(fil.shape[-1], H, W, fil.dtype)[None]
    applied = apply_filter(second, fil)
    return applied + col * colw


def warp_forward_filter(first: Array, flow: Array) -> Array:
    """Forward filter warp = invert then backward-apply (reference warp.py:177-179)."""
    C = first.shape[-1]
    return warp_backward_filter(first, invert_filter(flow, C))


__all__ = [
    "get_radius", "unpack_flow", "pack_flow", "unfold", "bound_mask",
    "apply_filter", "invert_filter", "filter_to_flow", "occlusion_mask",
    "warp_backward_filter", "warp_forward_filter",
]
