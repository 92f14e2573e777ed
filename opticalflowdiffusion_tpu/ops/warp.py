"""Warp op library: TPU-native equivalent of reference warp.py:8-322.

All tensors are NHWC. Flow is (B, H, W, 2) with channels ``(dx, dy)`` — dx
displaces the W (last spatial) axis.  NOTE: the reference mixes two flow
conventions — its datasets and backward warp use ``(dy, dx)`` (warp.py:105
flips before grid-sampling) while its forward-splat CUDA kernel reads
``(dx, dy)`` (softsplat_new.py:368-369).  This framework uses ``(dx, dy)``
uniformly; dataset loaders emit that convention.

NaN-hole semantics (the reference's occlusion mechanism, warp.py:154-155,
260-287) are preserved: forward warp marks unsupported output pixels NaN and
the nan_* losses reduce over finite entries only.  Boolean indexing is
re-expressed as masked sums so everything is jit-safe (static shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .splat import softsplat

Array = jax.Array


# ---------------------------------------------------------------------------
# Backward warp (reference warp.py:95-119)
# ---------------------------------------------------------------------------

def bilinear_gather(img: Array, coords_x: Array, coords_y: Array) -> Array:
    """Sample ``img`` (B,H,W,C) at float coords (align_corners=True semantics).

    Out-of-range coords clamp to the border (like grid_sample zeros for the
    mask computation handled separately by the caller).
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(coords_x)
    y0 = jnp.floor(coords_y)
    wx = coords_x - x0
    wy = coords_y - y0

    def take(yy, xx):
        yyc = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xxc = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        b = jnp.arange(B)[:, None, None]
        return img[b, yyc, xxc]

    v00 = take(y0, x0)
    v01 = take(y0, x0 + 1)
    v10 = take(y0 + 1, x0)
    v11 = take(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def warp_backward_flow(second: Array, flow: Array) -> Tuple[Array, Array]:
    """Backward warp `second` by `flow`; returns (warped, validity mask).

    Equivalent of reference warp.py:95-119 (grid_sample + thresholded ones
    mask).  grid_sample with zero padding is emulated by zeroing samples whose
    footprint leaves the image, which the reference's 0.999-thresholded mask
    also kills.
    """
    B, H, W, C = second.shape
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    cx = xs + flow[..., 0]
    cy = ys + flow[..., 1]
    out = bilinear_gather(second, cx, cy)
    # Mask: 1 where the full bilinear footprint is inside (mask >= 0.999 in
    # the reference kills any pixel touching the zero-padding).
    inside = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
    mask = inside.astype(second.dtype)[..., None] * jnp.ones_like(out)
    return out * mask, mask


# ---------------------------------------------------------------------------
# Forward warp (reference warp.py:121-156)
# ---------------------------------------------------------------------------

def warp_forward_flow(
    first: Array,
    flow: Array,
    scale: int = 1,
    set_nans: bool = True,
    get_variance: bool = False,
    offset: Sequence[int] = (0, 0),
    warp_style: str = "sum",
) -> Array:
    """NaN-aware softsplat forward warp (reference warp.py:121-156).

    NaN input pixels contribute zero weight; output pixels with zero
    accumulated weight become NaN holes when ``set_nans``.
    """
    # any-NaN as a NaN-propagating max-reduce (see flow_diffuser.py
    # UnetWithWarp nan_ch note: exact, and avoids the slow pred reduce)
    nan_any = jnp.isnan(jnp.max(first, axis=-1))
    weights = jnp.where(nan_any, 0.0, 1.0)[..., None]
    clean = jnp.where(jnp.isnan(first), 0.0, first)

    offset = [
        int(o) % int(scale) if isinstance(o, int) else jnp.mod(o, scale)
        for o in offset
    ]
    mode = "linear_unn" if warp_style == "sum" else "linear"
    ret = softsplat(clean, flow, weights.astype(clean.dtype), mode, scale, offset)
    img = ret[..., :-1]
    wsum = ret[..., -1:]

    if get_variance:
        var = softsplat(
            jnp.square(clean), flow, weights.astype(clean.dtype),
            "linear_unn", scale, offset,
        )
        img = var[..., :-1] - jnp.square(img)

    if set_nans:
        img = jnp.where(wsum > 0, img, jnp.nan)
    return img


def warp(
    first: Array | None,
    second: Array | None,
    flow: Array,
    rep: str = "flow",
    mode: str = "backward",
    **kwargs,
) -> Array:
    """Dispatcher mirroring reference warp.py:83-93."""
    if rep == "flow":
        if mode == "backward":
            return warp_backward_flow(second, flow, **kwargs)
        if mode == "forward":
            return warp_forward_flow(first, flow, **kwargs)
    elif rep == "filter":
        from . import filters

        if mode == "backward":
            return filters.warp_backward_filter(second, flow, **kwargs)
        if mode == "forward":
            return filters.warp_forward_filter(first, flow, **kwargs)
    raise ValueError(f"unknown warp rep={rep} mode={mode}")


# ---------------------------------------------------------------------------
# Scaling (reference warp.py:234-258)
# ---------------------------------------------------------------------------

def upsample_nearest(img: Array, factor: int) -> Array:
    B, H, W, C = img.shape
    img = jnp.repeat(img, factor, axis=1)
    return jnp.repeat(img, factor, axis=2)


def upsample_bilinear(img: Array, factor: float) -> Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent."""
    B, H, W, C = img.shape
    Ho, Wo = int(H * factor), int(W * factor)
    return jax.image.resize(img, (B, Ho, Wo, C), method="bilinear")


def box_downsample(img: Array, factor: int) -> Array:
    """Non-overlapping box mean (reference warp.py:240-241)."""
    B, H, W, C = img.shape
    img = img.reshape(B, H // factor, factor, W // factor, factor, C)
    return img.mean(axis=(2, 4))


def scale(img: Array, up=None, down=None) -> Array:
    if up is not None and down is not None:
        raise ValueError("one of up or down")
    if up is not None:
        return upsample_bilinear(img, up)
    if down is not None:
        return box_downsample(img, down)
    return img


def downsampled_warp(img: Array, flow: Array, warp_func, level: int = 1) -> Array:
    """Strided sub-grid warp average (reference warp.py:245-258)."""
    warped = []
    for i in range(level):
        for j in range(level):
            sel = img[:, i::level, j::level, :]
            sel_flow = flow[:, i::level, j::level, :] / level
            warped.append(warp_func(sel, sel_flow))
    return jnp.mean(jnp.stack(warped, axis=0), axis=0)


def permute_warp(img: Array, flow: Array) -> Array:
    """One-to-one (permutation) warp: the reference ``permute_warp`` intent
    (warp.py:181-228 — a ``pass`` stub whose commented-out draft builds a
    bijective pixel map via wrap-around + argsort; the draft itself is
    marked buggy upstream).

    Each source pixel's desired destination is its grid position plus
    ``flow`` (in NORMALIZED units — 1.0 = full image extent, matching the
    draft's ``grid/ (W-1) + flow``), wrapped torus-style.  Destinations are
    then assigned by rank: sources sorted by row-major destination key fill
    output slots in raster order, which resolves collisions while keeping
    the map an exact permutation (mass-preserving, invertible).  The draft's
    two-stage row/col argsort with a ``+ 5*row`` separator key is the same
    lexicographic ordering, done here with one fused key.

    Zero flow is exactly the identity (the key is strictly raster-ordered
    and ``argsort`` is stable).  Differentiable w.r.t. ``img`` (permuted
    cotangents); zero gradient w.r.t. ``flow`` (rank assignment) — used on
    sampled noise only, like the reference intends.
    """
    B, H, W, C = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    # pixel-center grid normalized by W (not the draft's corner grid / W-1):
    # keeps positions in (0, 1) so the torus wrap is exact, zero flow maps to
    # itself, and sub-half-pixel flows cannot flip a pixel's row bucket
    gx = ((xs.astype(jnp.float32) + 0.5) / W)[None]
    gy = ((ys.astype(jnp.float32) + 0.5) / H)[None]
    tx = gx + flow[..., 0]
    ty = gy + flow[..., 1]
    tx = tx - jnp.floor(tx)  # wrap to [0, 1) (draft's `vgrid - floor(vgrid)`)
    ty = ty - jnp.floor(ty)
    # row-major key: row bucket (strictly separated) + column position
    key = jnp.floor(ty * H) * 2.0 + tx
    order = jnp.argsort(key.reshape(B, H * W), axis=-1)
    flat = img.reshape(B, H * W, C)
    out = jnp.take_along_axis(flat, order[..., None], axis=1)
    return out.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# NaN-aware losses (reference warp.py:260-303)
# ---------------------------------------------------------------------------

def _finite_pair_mask(pred: Array, target: Array) -> Array:
    return jnp.logical_not(jnp.isnan(pred) | jnp.isnan(target))


def nan_mse_stats(pred: Array, target: Array) -> Tuple[Array, Array]:
    """(sum of squared diffs over finite pairs, finite count).

    Composable replacement for the reference's dynamically-shaped
    ``nan_mse(..., reduction='none')`` + concat + nanmean pipeline
    (warp.py:260-271, denoising_diffusion.py:959-973): accumulating
    (sum, count) across loss terms and dividing at the end is exactly
    equivalent and jit-safe.
    """
    mask = _finite_pair_mask(pred, target)
    # reduction in f32 always: a bf16 sum over H*W terms loses ~half the
    # mantissa to accumulation error (bf16 values are fine, bf16 sums are not)
    diff = jnp.where(mask, pred - target, 0.0).astype(jnp.float32)
    return jnp.sum(jnp.square(diff)), jnp.sum(mask)


def nan_mse(pred: Array, target: Array) -> Array:
    s, n = nan_mse_stats(pred, target)
    return s / jnp.maximum(n, 1)


def charbonnier(x: Array, alpha: float = 0.5, eps: float = 1e-3) -> Array:
    return jnp.power(jnp.square(x) + eps ** 2, alpha)


def nan_charbonnier(pred: Array, target: Array) -> Array:
    # reductions in f32 always: a bf16 sum over H*W terms loses ~half the
    # mantissa to accumulation error (bf16 values are fine, bf16 sums are not)
    mask = _finite_pair_mask(pred, target)
    diff = jnp.where(mask, pred - target, 0.0).astype(jnp.float32)
    val = jnp.sum(jnp.where(mask, charbonnier(diff), 0.0))
    return val / jnp.maximum(jnp.sum(mask), 1)


def fill_holes_nan(img: Array, weights: Array) -> Array:
    """NaN-out pixels with zero splat weight (reference warp.py:273-276)."""
    return jnp.where(weights > 0, img, jnp.nan)


def edgeaware_smoothness1(image: Array, flow: Array, edge_weight: float = 30.0) -> Array:
    """Edge-aware first-order smoothness (reference warp.py:289-303)."""
    # f32 throughout: tiny op, and bf16 means/exps here would add pure noise
    image = image.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    img_gy = image[:, 1:, :, :] - image[:, :-1, :, :]
    img_gx = image[:, :, 1:, :] - image[:, :, :-1, :]
    flo_gy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    flo_gx = flow[:, :, 1:, :] - flow[:, :, :-1, :]

    wy = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gy), axis=-1, keepdims=True))
    wx = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gx), axis=-1, keepdims=True))
    loss = jnp.mean(wx * charbonnier(flo_gx)) + jnp.mean(wy * charbonnier(flo_gy))
    return loss / 2


def spatial_smoothness_loss(flow: Array) -> Array:
    """L1 total-variation smoothness (reference warp.py:305-322)."""
    gy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    gx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    return jnp.abs(gy).mean() + jnp.abs(gx).mean()


__all__ = [
    "warp", "warp_backward_flow", "warp_forward_flow", "bilinear_gather",
    "scale", "box_downsample", "upsample_bilinear", "upsample_nearest",
    "downsampled_warp", "permute_warp", "nan_mse", "nan_mse_stats", "nan_charbonnier",
    "charbonnier", "fill_holes_nan", "edgeaware_smoothness1",
    "spatial_smoothness_loss",
]
