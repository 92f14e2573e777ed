"""Softmax-splatting forward warp, TPU-native.

Re-implements the semantics of the reference's CuPy-JIT CUDA kernels
(reference: algorithms/diffusion_animation/softsplat_new.py:278-735):

* ``softsplat_out``  — bilinear 4-corner scatter-add of ``[in * metric, metric]``
  with a fused integer-``scale`` downsample and ``offset`` phase, plus an
  edge-pixel stretch correction (softsplat_new.py:374-390).
* ``softsplat_ingrad``  — gather of the output gradient at the 4 corners
  (softsplat_new.py:489-565).  The reference's ingrad x-transform contains an
  extra ``offset_x`` stretch term the forward lacks (softsplat_new.py:517);
  reproduced here for training-dynamics parity and flagged in
  ``REFERENCE_QUIRKS`` below.
* ``softsplat_flowgrad`` — per-channel gather weighted by the bilinear
  derivative w.r.t. flow, with the scale chain-rule term deliberately frozen
  to zero outside the interior branch ("this isn't actually correct but
  stabilizes perf", softsplat_new.py:626-627), and the freeze flags for the
  two flow channels swapped (softsplat_new.py:664-672).  All reproduced.

TPU design notes
----------------
The forward scatter uses XLA's deterministic ``.at[].add`` (per-batch vmap of a
1-D scatter over the flattened output); unlike the reference's ``atomicAdd``
the result is bit-deterministic across runs.  Both backward kernels are pure
bilinear *gathers*, which XLA lowers to efficient dynamic-slice/take ops.
Layout is NHWC (TPU-native); flow has 2 trailing channels ``(dx, dy)`` where
``dx`` displaces the W axis — the convention of the reference CUDA kernel.

REFERENCE_QUIRKS (documented, reproduced bit-for-bit in the VJP):
  1. ingrad x-edge transform applies an extra ``* offset_x`` stretch
     (softsplat_new.py:517) that the forward does not.
  2. flowgrad y-edge transform uses ``* offset_y`` where the forward uses the
     ``(abs(offset_y - H%scale)) % scale`` stretch (softsplat_new.py:640).
  3. flowgrad multiplies the x-channel gradient by the *y* freeze flag and
     vice versa (softsplat_new.py:664-672).
  4. The reference's dataset/backward-warp flow convention is ``(dy, dx)``
     while its forward-splat kernel reads ``(dx, dy)``; this framework uses
     ``(dx, dy)`` uniformly (see ops/warp.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MODES = ("sum", "avg", "linear", "soft", "linear_unn")


def _stretch_const(offset, size: int, scale: int):
    """Edge-stretch multiplier: ``(abs(offset - size % scale)) % scale``
    (softsplat_new.py:375).  ``offset`` may be a python int or a traced
    scalar (the fused pyramid loss maps over offsets)."""
    if isinstance(offset, (int, float)):
        return (abs(int(offset) - (size % scale))) % scale
    return jnp.mod(jnp.abs(offset - (size % scale)), scale)


def _fwd_transform(f: Array, size: int, scale: int, offset: int) -> Array:
    """Forward coordinate transform (softsplat_new.py:374-390)."""
    stretch = _stretch_const(offset, size, scale)
    f_edge = (f + (f - size + 1.0) * stretch - offset) / scale
    f_neg = f - offset
    f_int = (f - offset) / scale
    edge = (f >= size - 1.0) & (scale > 1)
    neg = (f - offset) < 0.0
    return jnp.where(edge, f_edge, jnp.where(neg, f_neg, f_int))


def _ingrad_transform_x(f: Array, size: int, scale: int, offset: int) -> Array:
    """ingrad x transform incl. the extra offset stretch (softsplat_new.py:515-523)."""
    stretch = _stretch_const(offset, size, scale)
    f1 = f + (f - size + 1.0) * stretch
    f1 = f1 + (f1 - size + 1.0) * offset  # reference quirk #1
    f_edge = (f1 - offset) / scale
    f_neg = f - offset
    f_int = (f - offset) / scale
    edge = f >= size - 1.0
    neg = (f - offset) < 0.0
    return jnp.where(edge, f_edge, jnp.where(neg, f_neg, f_int))


def _ingrad_transform_y(f: Array, size: int, scale: int, offset: int) -> Array:
    """ingrad y transform (softsplat_new.py:525-532) — same as forward, no scale>1 gate."""
    stretch = _stretch_const(offset, size, scale)
    f_edge = (f + (f - size + 1.0) * stretch - offset) / scale
    f_neg = f - offset
    f_int = (f - offset) / scale
    edge = f >= size - 1.0
    neg = (f - offset) < 0.0
    return jnp.where(edge, f_edge, jnp.where(neg, f_neg, f_int))


def _flowgrad_transform_x(
    f: Array, size: int, scale: int, offset: int
) -> Tuple[Array, Array]:
    """flowgrad x transform + frozen derivative flag (softsplat_new.py:629-637)."""
    stretch = _stretch_const(offset, size, scale)
    f_edge = (f + (f - size + 1.0) * stretch - offset) / scale
    f_neg = f - offset
    f_int = (f - offset) / scale
    edge = f >= size - 1.0
    neg = (f - offset) < 0.0
    out = jnp.where(edge, f_edge, jnp.where(neg, f_neg, f_int))
    # d(out)/d(flow) frozen to 0 except in the plain interior branch.
    dff = jnp.where(edge | neg, 0.0, 1.0 / scale)
    return out, dff


def _flowgrad_transform_y(
    f: Array, size: int, scale: int, offset: int
) -> Tuple[Array, Array]:
    """flowgrad y transform (softsplat_new.py:639-647): edge uses *offset_y (quirk #2)."""
    f_edge = (f + (f - size + 1.0) * offset - offset) / scale
    f_neg = f - offset
    f_int = (f - offset) / scale
    edge = f >= size - 1.0
    neg = (f - offset) < 0.0
    out = jnp.where(edge, f_edge, jnp.where(neg, f_neg, f_int))
    dff = jnp.where(edge | neg, 0.0, 1.0 / scale)
    return out, dff


def _target_coords(flow: Array, H: int, W: int) -> Tuple[Array, Array, Array]:
    """Raw (un-transformed) splat targets fx, fy and the finite mask."""
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    fx = xs + flow[..., 0]
    fy = ys + flow[..., 1]
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    return fx, fy, finite


def _corners(fx: Array, fy: Array):
    """Four bilinear corners (ix, iy, weight) around (fx, fy)."""
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1 = fx - x0
    wx0 = 1.0 - wx1
    wy1 = fy - y0
    wy0 = 1.0 - wy1
    return (
        (x0, y0, wx0 * wy0),  # NW
        (x1, y0, wx1 * wy0),  # NE
        (x0, y1, wx0 * wy1),  # SW
        (x1, y1, wx1 * wy1),  # SE
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _splat_core(inp: Array, flow: Array, scale: int, offset_x, offset_y) -> Array:
    return _splat_fwd_impl(inp, flow, scale, offset_x, offset_y)


def splat_raw(
    inp: Array, flow: Array, scale: int = 1, offset_x=0, offset_y=0
) -> Array:
    """Raw bilinear scatter splat: NHWC ``inp`` by ``flow`` into H//scale x W//scale.

    Equivalent of ``softsplat_func.apply`` (softsplat_new.py:339-455). Inputs
    are accumulated in float32 (matching the reference amp fp32 cast,
    softsplat_new.py:341).  ``scale`` is static; offsets may be traced scalars
    (zero-cotangent under the custom VJP).
    """
    ox = jnp.asarray(offset_x, jnp.float32)
    oy = jnp.asarray(offset_y, jnp.float32)
    return _splat_core(inp, flow, int(scale), ox, oy)


def _splat_fwd_impl(inp, flow, scale, offset_x, offset_y):
    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = H // scale, W // scale

    fx, fy, finite = _target_coords(flow, H, W)
    tx = _fwd_transform(fx, W, scale, offset_x)
    ty = _fwd_transform(fy, H, scale, offset_y)

    idxs = []
    wvals = []
    for cx, cy, w in _corners(tx, ty):
        inb = (cx >= 0) & (cx < Wo) & (cy >= 0) & (cy < Ho) & finite
        flat = (cy.astype(jnp.int32) * Wo + cx.astype(jnp.int32)).reshape(B, H * W)
        flat = jnp.where(inb.reshape(B, H * W), flat, Ho * Wo)  # dump slot
        idxs.append(flat)
        wvals.append(jnp.where(inb, w, 0.0).reshape(B, H * W))
    idx = jnp.concatenate(idxs, axis=1)  # (B, 4HW)
    wgt = jnp.concatenate(wvals, axis=1)  # (B, 4HW)

    vals = inp.reshape(B, H * W, C)
    vals = jnp.tile(vals, (1, 4, 1)) * wgt[..., None]  # (B, 4HW, C)

    def _scatter_one(v, i):
        out = jnp.zeros((Ho * Wo + 1, C), jnp.float32)
        return out.at[i].add(v)[:-1]

    out = jax.vmap(_scatter_one)(vals, idx)
    return out.reshape(B, Ho, Wo, C).astype(orig_dtype)


def _splat_fwd(inp, flow, scale, offset_x, offset_y):
    out = _splat_fwd_impl(inp, flow, scale, offset_x, offset_y)
    return out, (inp, flow, offset_x, offset_y)


def _splat_bwd(scale, res, g):
    inp, flow, offset_x, offset_y = res
    g = g.astype(jnp.float32)
    inp32 = inp.astype(jnp.float32)
    flow32 = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = g.shape[1], g.shape[2]

    fx, fy, finite = _target_coords(flow32, H, W)

    def gather_corners(tx, ty, weight_fn):
        """Sum over 4 corners of g[corner] * weight_fn(corner)."""
        acc = jnp.zeros((B, H, W, C), jnp.float32)
        bidx = jnp.arange(B)[:, None, None]
        for cx, cy, wx_is_x1, wy_is_y1 in _corner_meta(tx, ty):
            inb = (cx >= 0) & (cx < Wo) & (cy >= 0) & (cy < Ho)
            cxi = jnp.clip(cx.astype(jnp.int32), 0, Wo - 1)
            cyi = jnp.clip(cy.astype(jnp.int32), 0, Ho - 1)
            gv = g[bidx, cyi, cxi]  # (B,H,W,C)
            w = weight_fn(tx, ty, cx, cy, wx_is_x1, wy_is_y1)
            acc = acc + jnp.where(inb[..., None], gv * w[..., None], 0.0)
        return acc

    # ---- ingrad (softsplat_new.py:489-565) -------------------------------
    tx_i = _ingrad_transform_x(fx, W, scale, offset_x)
    ty_i = _ingrad_transform_y(fy, H, scale, offset_y)

    def w_bilinear(tx, ty, cx, cy, is_x1, is_y1):
        wx = (tx - cx + 1.0) if is_x1 else (cx + 1.0 - tx)
        wy = (ty - cy + 1.0) if is_y1 else (cy + 1.0 - ty)
        return wx * wy

    d_inp = gather_corners(tx_i, ty_i, w_bilinear)
    d_inp = jnp.where(finite[..., None], d_inp, 0.0)

    # ---- flowgrad (softsplat_new.py:595-727) ------------------------------
    tx_f, dxx = _flowgrad_transform_x(fx, W, scale, offset_x)
    ty_f, dyy = _flowgrad_transform_y(fy, H, scale, offset_y)

    def w_dx(tx, ty, cx, cy, is_x1, is_y1):
        # derivative of bilinear weight w.r.t. tx (for the flow x channel)
        sx = 1.0 if is_x1 else -1.0
        wy = (ty - cy + 1.0) if is_y1 else (cy + 1.0 - ty)
        return sx * wy

    def w_dy(tx, ty, cx, cy, is_x1, is_y1):
        sy = 1.0 if is_y1 else -1.0
        wx = (tx - cx + 1.0) if is_x1 else (cx + 1.0 - tx)
        return sy * wx

    gin = gather_corners(tx_f, ty_f, w_dx) * inp32  # (B,H,W,C); per-channel product
    # reference quirk #3: x-channel uses the *y* freeze flag.
    d_flow_x = jnp.sum(gin, axis=-1) * dyy
    gin = gather_corners(tx_f, ty_f, w_dy) * inp32
    d_flow_y = jnp.sum(gin, axis=-1) * dxx
    d_flow = jnp.stack([d_flow_x, d_flow_y], axis=-1)
    d_flow = jnp.where(finite[..., None], d_flow, 0.0)

    return (
        d_inp.astype(inp.dtype),
        d_flow.astype(flow.dtype),
        jnp.zeros_like(offset_x),
        jnp.zeros_like(offset_y),
    )


def _corner_meta(tx, ty):
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    x1, y1 = x0 + 1.0, y0 + 1.0
    return (
        (x0, y0, False, False),
        (x1, y0, True, False),
        (x0, y1, False, True),
        (x1, y1, True, True),
    )


_splat_core.defvjp(_splat_fwd, _splat_bwd)


def softsplat(
    inp: Array,
    flow: Array,
    metric: Array | None,
    mode: str,
    scale: int = 1,
    offset: Sequence[int] = (0, 0),
) -> Array:
    """Softmax splatting dispatcher, equivalent of ``softsplat()``
    (reference: softsplat_new.py:278-333).

    Args:
      inp:    (B, H, W, C) values to splat.
      flow:   (B, H, W, 2) forward flow (dx, dy).
      metric: (B, H, W, 1) importance metric, or None for sum/avg modes.
      mode:   one of sum/avg/linear/soft/linear_unn, with optional
              "-addeps" / "-zeroeps" / "-clipeps" suffix.
      scale:  fused integer downsample factor.
      offset: (offset_x, offset_y) phase of the fused downsample.

    Returns (B, H//scale, W//scale, C [+1]) — normalized modes append the raw
    accumulated-weight channel, matching softsplat_new.py:328.
    """
    base = mode.split("-")[0]
    assert base in MODES, f"unknown splat mode {mode}"
    if base in ("sum", "avg"):
        assert metric is None
    else:
        assert metric is not None

    if base == "avg":
        ones = jnp.ones(inp.shape[:-1] + (1,), inp.dtype)
        inp = jnp.concatenate([inp, ones], axis=-1)
    elif base in ("linear", "linear_unn"):
        inp = jnp.concatenate([inp * metric, metric], axis=-1)
    elif base == "soft":
        m = jnp.exp(metric)
        inp = jnp.concatenate([inp * m, m], axis=-1)

    out = splat_raw(inp, flow, int(scale), offset[0], offset[1])

    if base in ("avg", "linear", "soft"):
        norm = out[..., -1:]
        suffix = mode.split("-")[1] if "-" in mode else "addeps"
        if suffix == "addeps":
            norm = norm + 1e-7
        elif suffix == "zeroeps":
            norm = jnp.where(norm == 0.0, 1.0, norm)
        elif suffix == "clipeps":
            norm = jnp.clip(norm, 1e-7, None)
        out = jnp.concatenate([out[..., :-1] / norm, out[..., -1:]], axis=-1)
    return out


__all__ = ["softsplat", "splat_raw", "MODES"]
