"""Fused multi-scale / multi-offset splat pyramid.

The reference FlowLearner's photometric loss launches one CUDA splat per
(level, offset_x, offset_y) — ~832 kernel launches per training step
(flow_learner.py:168-193, SURVEY.md §3.3).

Phase decomposition (the TPU design): for a level L, every one of its L^2
offset splats writes an (H//L, W//L) grid; laying those grids out
phase-interleaved gives one (L*Ho, L*Wo) grid in which position p along an
axis corresponds to EXACTLY ONE (offset, corner) pair — o = p mod L,
k = p div L (the fused kernel's coarse corner index).  So the whole offset
family at a level is ONE splat with generalized weight matrices
W[n, p] = max(0, 1 - |t_o(f_n) - k|) — the same one-hot-matmul MXU
factorization as ops/splat.py, with the per-offset forward/ingrad/flowgrad
coordinate transforms (including every edge/neg branch quirk) evaluated
vectorized over the L offsets.  256 sequential (8, 8)-output einsums per
16-level (the old ``lax.map``) become one full-size contraction: identical
FLOPs, MXU-shaped.  The per-offset frozen flow-gradient flags fold into the
opposite-axis weight matrix (quirk #3 channel swap preserved).

``OFD_PYRAMID=map`` restores the per-offset ``lax.map`` path (used by the
equivalence tests)."""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .splat import (
    _flowgrad_transform_x,
    _flowgrad_transform_y,
    _fwd_transform,
    _ingrad_transform_x,
    _ingrad_transform_y,
    _target_coords,
    contraction_precision,
    softsplat,
)
from .warp import fill_holes_nan, nan_charbonnier

Array = jax.Array

# reference flow_learner.py:162
DEFAULT_LEVELS: Tuple[int, ...] = (1, 2, 4, 5, 7, 8, 10, 11, 14, 16)


def _phase_t(transform, f: Array, size: int, level: int):
    """Vectorize a splat coordinate transform over all ``level`` offsets.

    f (B, N) -> t (B, N, L): t[..., o] = transform(f, size, level, o)."""
    offs = jnp.arange(level, dtype=f.dtype)
    return transform(f[..., None], size, level, offs)


def _phase_weights(t: Array, level: int, G: int, signed: bool = False):
    """(B, N, L*G) interleaved weight matrix from per-offset coords t.

    Column p reads t[..., p % L] and compares against corner k = p // L:
    tent max(0, 1 - |t - k|) == the 2-corner bilinear weights (0 elsewhere,
    so out-of-range and masked (-10) coords drop exactly like the one-hot
    build in ops/splat.py).  ``signed``: +1 at corner floor(t)+1, -1 at
    floor(t) (the flow-derivative matrix)."""
    P = level * G
    p = jnp.arange(P, dtype=jnp.int32)
    tp = jnp.take(t, p % level, axis=-1)            # (B, N, P)
    k = (p // level).astype(t.dtype)
    if signed:
        t0 = jnp.floor(tp)
        return ((k == t0 + 1.0).astype(jnp.float32)
                - (k == t0).astype(jnp.float32))
    return jnp.maximum(0.0, 1.0 - jnp.abs(tp - k))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _phase_splat_raw(inp: Array, flow: Array, level: int) -> Array:
    """All level^2 offset splats of splat_raw, phase-interleaved:
    (B, L*(H//L), L*(W//L), C); out[:, ky*L+oy, kx*L+ox] equals
    splat_raw(inp, flow, level, ox, oy)[:, ky, kx].  Custom VJP reproduces
    the reference per-offset ingrad/flowgrad (all quirks) summed over
    offsets."""
    return _phase_splat_fwd_impl(inp, flow, level)


def _phase_splat_fwd_impl(inp, flow, level):
    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = H // level, W // level
    N = H * W

    fx, fy, finite = _target_coords(flow, H, W)
    fxf = jnp.where(finite, fx, -10.0).reshape(B, N)
    fyf = jnp.where(finite, fy, -10.0).reshape(B, N)
    tx = _phase_t(_fwd_transform, fxf, W, level)     # (B, N, L)
    ty = _phase_t(_fwd_transform, fyf, H, level)
    v = inp.reshape(B, N, C)

    mprec = contraction_precision(orig_dtype == jnp.bfloat16)

    chunk = min(N, 16384 // max(1, level // 4))
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N

    def pad1(a, fill):
        if not pad:
            return a
        width = ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2)
        return jnp.pad(a, width, constant_values=fill)

    args = (pad1(tx, -10.0), pad1(ty, -10.0), pad1(v, 0.0))
    args = tuple(
        a.reshape((B, nchunks, chunk) + a.shape[2:]).swapaxes(0, 1)
        for a in args
    )

    def body(acc, a):
        txc, tyc, vc = a
        WX = _phase_weights(txc, level, Wo)          # (B, n, L*Wo)
        WY = _phase_weights(tyc, level, Ho)          # (B, n, L*Ho)
        right = WX[..., None] * vc[:, :, None, :]
        out = jnp.einsum(
            "bnr,bnwc->brwc", WY, right,
            precision=mprec, preferred_element_type=jnp.float32,
        )
        return acc + out, None

    init = jnp.zeros((B, level * Ho, level * Wo, C), jnp.float32)
    if nchunks == 1:
        out, _ = body(init, tuple(a[0] for a in args))
    else:
        out, _ = jax.lax.scan(body, init, args)
    return out.astype(orig_dtype)


def _phase_splat_fwd(inp, flow, level):
    return _phase_splat_fwd_impl(inp, flow, level), (inp, flow)


def _phase_splat_bwd(level, res, g):
    """Sum over offsets of the reference per-offset backward (same math as
    ops/splat.py _splat_bwd_matmul): each offset's cotangent is the
    (oy, ox) phase of ``g``, which the interleaved weight matrices address
    directly.  The frozen flow-derivative flags (per offset) fold into the
    opposite-axis matrix, preserving reference quirk #3 (x grad * y flag)."""
    inp, flow = res
    g = g.astype(jnp.float32)
    inp32 = inp.astype(jnp.float32)
    flow32 = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = H // level, W // level
    N = H * W

    fx, fy, finite = _target_coords(flow32, H, W)
    fxf = jnp.where(finite, fx, -10.0).reshape(B, N)
    fyf = jnp.where(finite, fy, -10.0).reshape(B, N)
    v = inp32.reshape(B, N, C)
    # same contraction-precision policy as the forward (splat.py helper)
    hp = contraction_precision(inp.dtype == jnp.bfloat16)

    txi = _phase_t(_ingrad_transform_x, fxf, W, level)
    tyi = _phase_t(_ingrad_transform_y, fyf, H, level)
    txf, dxx = _phase_t(_flowgrad_transform_x, fxf, W, level)
    tyf, dyy = _phase_t(_flowgrad_transform_y, fyf, H, level)

    chunk = min(N, 4096)
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N

    def pad1(a, fill=0.0):
        if not pad:
            return a
        width = ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2)
        return jnp.pad(a, width, constant_values=fill)

    args = (pad1(txi, -10.0), pad1(tyi, -10.0), pad1(txf, -10.0),
            pad1(tyf, -10.0), pad1(dxx), pad1(dyy), pad1(v))
    args = tuple(
        a.reshape((B, nchunks, chunk) + a.shape[2:]).swapaxes(0, 1)
        for a in args
    )

    def body(_, a):
        txic, tyic, txfc, tyfc, dxxc, dyyc, vc = a
        WXi = _phase_weights(txic, level, Wo)
        WYi = _phase_weights(tyic, level, Ho)
        ti = jnp.einsum("bnr,brwk->bnwk", WYi, g, precision=hp,
                        preferred_element_type=jnp.float32)
        din = jnp.einsum("bnw,bnwk->bnk", WXi, ti, precision=hp,
                         preferred_element_type=jnp.float32)

        # flowgrad: signed matrix on the derivative axis (UNscaled — the
        # reference multiplies gx by the *y* freeze flag dyy and gy by dxx,
        # quirk #3).  Per offset those flags depend on (source, that-axis
        # offset), so each folds into the matching-axis PLAIN tent matrix.
        SXf = _phase_weights(txfc, level, Wo, signed=True)
        WYf = _phase_weights(tyfc, level, Ho) * jnp.take(
            dyyc, jnp.arange(level * Ho) % level, axis=-1)
        tf = jnp.einsum("bnr,brwk->bnwk", WYf, g, precision=hp,
                        preferred_element_type=jnp.float32)
        gx = jnp.einsum("bnw,bnwk,bnk->bn", SXf, tf, vc, precision=hp)

        SYf = _phase_weights(tyfc, level, Ho, signed=True)
        WXf = _phase_weights(txfc, level, Wo) * jnp.take(
            dxxc, jnp.arange(level * Wo) % level, axis=-1)
        tf2 = jnp.einsum("bnr,brwk->bnwk", SYf, g, precision=hp,
                         preferred_element_type=jnp.float32)
        gy = jnp.einsum("bnw,bnwk,bnk->bn", WXf, tf2, vc, precision=hp)
        return None, (din, gx, gy)

    if nchunks == 1:
        _, (din, gx, gy) = body(None, tuple(a[0] for a in args))
    else:
        _, (din, gx, gy) = jax.lax.scan(body, None, args)
        din = din.swapaxes(0, 1).reshape(B, nchunks * chunk, C)[:, :N]
        gx = gx.swapaxes(0, 1).reshape(B, nchunks * chunk)[:, :N]
        gy = gy.swapaxes(0, 1).reshape(B, nchunks * chunk)[:, :N]

    d_inp = din.reshape(B, H, W, C)
    d_inp = jnp.where(finite[..., None], d_inp, 0.0)
    d_flow = jnp.stack([gx, gy], axis=-1).reshape(B, H, W, 2)
    d_flow = jnp.where(finite[..., None], d_flow, 0.0)
    return d_inp.astype(inp.dtype), d_flow.astype(flow.dtype)


_phase_splat_raw.defvjp(_phase_splat_fwd, _phase_splat_bwd)


def multi_offset_soft_splat(
    inp: Array, flow: Array, metric: Array, level: int
) -> Array:
    """All level^2 offset phases of the fused 'soft' splat at ``level``.

    Returns (level^2, B, H//level, W//level, C+1) — values normalized by the
    accumulated exp-metric with the raw weight channel appended (the
    reference's per-offset softsplat_new calls, flow_learner.py:184).
    Offset n is (a, b) = (n % level, n // level), matching the reference's
    loop order (flow_learner.py:168-170).
    """
    n = level * level
    if os.environ.get("OFD_PYRAMID") == "map" and n > 1:
        ar = jnp.arange(n, dtype=jnp.float32)
        offs = jnp.stack([ar % level, ar // level], axis=1)

        def one(off):
            return softsplat(inp, flow, metric, "soft", level, (off[0], off[1]))

        return jax.lax.map(one, offs)
    if n == 1:
        z = jnp.zeros((), jnp.float32)
        return softsplat(inp, flow, metric, "soft", 1, (z, z))[None]

    # 'soft' packing (ops/splat.py softsplat) + one phase-interleaved splat
    m = jnp.exp(metric)
    packed = jnp.concatenate([inp * m, m], axis=-1)
    out = _phase_splat_raw(packed, flow, level)      # (B, L*Ho, L*Wo, C+1)
    B = out.shape[0]
    Ho, Wo = inp.shape[1] // level, inp.shape[2] // level
    Cp = out.shape[-1]
    norm = out[..., -1:] + 1e-7                      # softsplat 'addeps'
    out = jnp.concatenate([out[..., :-1] / norm, out[..., -1:]], axis=-1)
    out = out.reshape(B, Ho, level, Wo, level, Cp)
    # (b, ky, oy, kx, ox, c) -> offset index n = oy*L + ox  (b-major = y)
    return out.transpose(2, 4, 0, 1, 3, 5).reshape(level * level, B, Ho, Wo, Cp)


def photometric_pyramid_loss(
    img: Array,
    tgt: Array,
    flow_pred: Array,
    warp_weights: Array,
    levels: Sequence[int] = DEFAULT_LEVELS,
) -> Array:
    """Multi-scale offset-averaged NaN-charbonnier photometric loss
    (reference flow_learner.py:159-206).

    For each level and each of its level^2 offsets: forward-splat ``img`` by
    ``flow_pred`` (soft mode, NaN holes where no mass lands), box-splat the
    target with zero flow, charbonnier over finite pairs; average over
    offsets then over levels.
    """
    zeros_flow = jnp.zeros_like(flow_pred)
    ones_w = jnp.ones_like(warp_weights)

    per_level = []
    for level in levels:
        warped_all = multi_offset_soft_splat(img, flow_pred, warp_weights, level)
        filled = fill_holes_nan(warped_all[..., :-1], warped_all[..., -1:])
        tgt_all = multi_offset_soft_splat(tgt, zeros_flow, ones_w, level)[..., :-1]
        # per-offset masked charbonnier means, then offset average
        losses = jax.vmap(nan_charbonnier)(tgt_all, filled)
        per_level.append(jnp.mean(losses))
    return jnp.mean(jnp.stack(per_level))


__all__ = ["multi_offset_soft_splat", "photometric_pyramid_loss", "DEFAULT_LEVELS"]
