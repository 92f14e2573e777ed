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
import os
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


def contraction_precision(fast: bool):
    """MXU contraction precision for the splat family (splat.py/pyramid.py).

    ``fast`` = the caller's values arrived bf16 (the model compute dtype
    under runtime.precision=bf16) *before* the reference-parity f32
    accumulation cast: single-pass MXU rate, ~1e-3 relative error (measured
    +41% full-res sampling throughput).  f32 callers keep the exact-grade
    6-pass HIGHEST f32 emulation — reference grads are f32 CUDA, so tests
    and parity oracles stay exact.  OFD_SPLAT_PRECISION={default,highest}
    overrides both ways.
    """
    env = os.environ.get("OFD_SPLAT_PRECISION")
    if env == "default":
        return jax.lax.Precision.DEFAULT
    if env == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST


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


def _sorted_segment_scatter(vals: Array, idx: Array, num_out: int) -> Array:
    """Deterministic scatter-add without XLA scatter (which serializes on
    duplicate indices on TPU): sort by target index, segmented inclusive scan
    (Hillis-Steele with segment flags — sums stay local to each segment, so
    no long-prefix fp error), then place segment totals by binary search.

    vals (B, N, C) float32, idx (B, N) int32 in [0, num_out] (num_out = dump).
    Returns (B, num_out, C).
    """
    B, N, C = vals.shape

    ops = [idx] + [vals[..., c] for c in range(C)]
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    skey = sorted_ops[0]
    svals = jnp.stack(sorted_ops[1:], axis=-1)  # (B, N, C)

    # segment heads: first element or key change
    heads = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1
    )

    # segmented inclusive scan over N (log2 steps)
    x = svals
    f = heads
    shift = 1
    while shift < N:
        x_prev = jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, :N]
        f_prev = jnp.pad(f, ((0, 0), (shift, 0)), constant_values=True)[:, :N]
        x = jnp.where(f[..., None], x, x + x_prev)
        f = f | f_prev
        shift *= 2

    # segment totals live at the LAST element of each segment; for output
    # slot j that position is searchsorted(skey, j, 'right') - 1.
    targets = jnp.arange(num_out, dtype=skey.dtype)
    pos = jax.vmap(lambda k: jnp.searchsorted(k, targets, side="right"))(skey) - 1
    posc = jnp.clip(pos, 0, N - 1)
    b = jnp.arange(B)[:, None]
    gathered = x[b, posc]  # (B, num_out, C)
    valid = (pos >= 0) & (skey[b, posc] == targets[None, :])
    return jnp.where(valid[..., None], gathered, 0.0)


def _window_scatter(inp, tx, ty, finite, Ho, Wo):
    """Scatter each source pixel's full 2x2 bilinear footprint as ONE window
    update into a 1-padded output (then crop).  4x fewer scatter updates than
    per-corner point scatters and each update is a dense (2,2,C) block —
    dramatically better XLA/TPU lowering than duplicate-index point scatter.

    Windows fully outside the padded output get an out-of-range start index
    and are dropped by scatter mode DROP; partially-outside windows land in
    the padding rows/cols which are cropped away.
    """
    B, H, W, C = inp.shape
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    wx1 = tx - x0
    wy1 = ty - y0
    # (B, H, W, 2, 2) bilinear weights over the window
    wx = jnp.stack([1.0 - wx1, wx1], axis=-1)
    wy = jnp.stack([1.0 - wy1, wy1], axis=-1)
    wwin = wy[..., :, None] * wx[..., None, :]

    # padded start indices; invalid sources pushed out of range (dropped)
    sy = y0.astype(jnp.int32) + 1
    sx = x0.astype(jnp.int32) + 1
    valid = finite & (sy >= 0) & (sy <= Ho) & (sx >= 0) & (sx <= Wo)
    sy = jnp.where(valid, sy, Ho + 2)
    sx = jnp.where(valid, sx, Wo + 2)
    wwin = jnp.where(valid[..., None, None], wwin, 0.0)

    N = H * W
    updates = (
        inp.reshape(B, N, 1, 1, C) * wwin.reshape(B, N, 2, 2, 1)
    )  # (B, N, 2, 2, C)
    indices = jnp.stack([sy.reshape(B, N), sx.reshape(B, N)], axis=-1)

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )

    def one(upd, idx):
        out = jnp.zeros((Ho + 2, Wo + 2, C), jnp.float32)
        return jax.lax.scatter_add(
            out, idx, upd, dnums,
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )

    out = jax.vmap(one)(updates, indices)
    return out[:, 1 : Ho + 1, 1 : Wo + 1, :]


def _matmul_scatter(inp, tx, ty, finite, Ho, Wo, chunk=16384, fast=False):
    """Bilinear splat as two MXU matmuls (exact, deterministic, unbounded).

    The 2x2 bilinear footprint factorizes: out[r, c] += v * wy(r) * wx(c)
    where wy is nonzero only at rows floor(ty), floor(ty)+1 (and likewise
    wx).  Build dense row/col weight matrices WY (N, Ho), WX (N, Wo) — two
    shifted one-hots scaled by the bilinear fractions — and contract:

        out[b, r, c, k] = sum_n WY[b,n,r] * WX[b,n,c] * v[b,n,k]

    i.e. one elementwise expand + one dot_general per chunk, which XLA maps
    straight onto the MXU.  Out-of-range and non-finite targets never match
    the iota compare, reproducing the kernel's bounds/NaN guards for free.
    Chunked over source pixels to bound the dense WY/WX intermediates.
    """
    B, H, W, C = inp.shape
    N = H * W
    v = inp.reshape(B, N, C)
    txf = jnp.where(finite, tx, -10.0).reshape(B, N)
    tyf = jnp.where(finite, ty, -10.0).reshape(B, N)

    x0 = jnp.floor(txf)
    y0 = jnp.floor(tyf)
    wx1 = txf - x0
    wy1 = tyf - y0

    cols = jnp.arange(Wo, dtype=jnp.int32)
    rows = jnp.arange(Ho, dtype=jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    nchunks = max(1, -(-N // chunk))
    pad = nchunks * chunk - N

    mprec = contraction_precision(fast)

    def build(ix, frac, grid):
        # (B, n, G) weight matrix: (1-frac) at ix, frac at ix+1
        eq0 = (ix[..., None] == grid).astype(jnp.float32)
        eq1 = (ix[..., None] + 1 == grid).astype(jnp.float32)
        return eq0 * (1.0 - frac)[..., None] + eq1 * frac[..., None]

    if pad:
        z = lambda a, fill: jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)
        x0i, y0i = z(x0i, -10), z(y0i, -10)
        wx1, wy1 = z(wx1, 0.0), z(wy1, 0.0)
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))

    def body(acc, args):
        x0c, y0c, wxc, wyc, vc = args
        WX = build(x0c, wxc, cols)           # (B, n, Wo)
        WY = build(y0c, wyc, rows)           # (B, n, Ho)
        right = WX[..., None] * vc[:, :, None, :]
        out = jnp.einsum(
            "bnr,bnwc->brwc", WY, right,
            precision=mprec,
            preferred_element_type=jnp.float32,
        )
        return acc + out, None

    if nchunks == 1:
        out, _ = body(jnp.zeros((B, Ho, Wo, C), jnp.float32),
                      (x0i, y0i, wx1, wy1, v))
    else:
        resh = lambda a: a.reshape((B, nchunks, chunk) + a.shape[2:]).swapaxes(0, 1)
        out, _ = jax.lax.scan(
            body,
            jnp.zeros((B, Ho, Wo, C), jnp.float32),
            (resh(x0i), resh(y0i), resh(wx1), resh(wy1), resh(v)),
        )
    return out


def _splat_fwd_impl(inp, flow, scale, offset_x, offset_y):
    orig_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = H // scale, W // scale

    fx, fy, finite = _target_coords(flow, H, W)
    tx = _fwd_transform(fx, W, scale, offset_x)
    ty = _fwd_transform(fy, H, scale, offset_y)

    backend = os.environ.get("OFD_SPLAT_BACKEND", "matmul")
    if backend == "matmul":
        out = _matmul_scatter(
            inp, tx, ty, finite, Ho, Wo,
            fast=orig_dtype == jnp.bfloat16,
        )
        return out.astype(orig_dtype)
    if backend == "window":
        out = _window_scatter(inp, tx, ty, finite, Ho, Wo)
        return out.astype(orig_dtype)

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

    if backend == "xla_scatter":
        def _scatter_one(v, i):
            out = jnp.zeros((Ho * Wo + 1, C), jnp.float32)
            return out.at[i].add(v)[:-1]

        out = jax.vmap(_scatter_one)(vals, idx)
    else:
        out = _sorted_segment_scatter(vals, idx, Ho * Wo)
    return out.reshape(B, Ho, Wo, C).astype(orig_dtype)


def _weight_matrices(t: Array, frac_grid: Array, signed: bool = False):
    """(B, N, G) bilinear weight (or sign-derivative) matrix for coords t."""
    t0 = jnp.floor(t)
    frac = t - t0
    t0i = t0.astype(jnp.int32)
    eq0 = (t0i[..., None] == frac_grid).astype(jnp.float32)
    eq1 = (t0i[..., None] + 1 == frac_grid).astype(jnp.float32)
    if signed:
        return eq1 - eq0
    return eq0 * (1.0 - frac)[..., None] + eq1 * frac[..., None]


def _splat_bwd_matmul(scale, res, g):
    """Backward via the same one-hot matmul factorization as the forward:
    both reference backward kernels are bilinear gathers, i.e. the transposed
    contraction out -> sources, mapped onto the MXU instead of point gathers.
    Reproduces the reference ingrad/flowgrad transforms and quirks exactly
    (same math as _splat_bwd, different schedule)."""
    inp, flow, offset_x, offset_y = res
    g = g.astype(jnp.float32)
    inp32 = inp.astype(jnp.float32)
    flow32 = flow.astype(jnp.float32)
    B, H, W, C = inp.shape
    Ho, Wo = g.shape[1], g.shape[2]
    N = H * W

    fx, fy, finite = _target_coords(flow32, H, W)
    fxf = jnp.where(finite, fx, -10.0).reshape(B, N)
    fyf = jnp.where(finite, fy, -10.0).reshape(B, N)

    cols = jnp.arange(Wo, dtype=jnp.int32)
    rows = jnp.arange(Ho, dtype=jnp.int32)
    # dtype-driven like the forward: bf16 callers (runtime.precision=bf16
    # train steps) get the single-pass MXU rate in the backward too
    hp = contraction_precision(inp.dtype == jnp.bfloat16)

    tx_i = _ingrad_transform_x(fxf, W, scale, offset_x)
    ty_i = _ingrad_transform_y(fyf, H, scale, offset_y)
    tx_f, dxx = _flowgrad_transform_x(fxf, W, scale, offset_x)
    ty_f, dyy = _flowgrad_transform_y(fyf, H, scale, offset_y)
    v = inp32.reshape(B, N, C)

    chunk = min(N, 4096)
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N

    def pad1(a, fill=0.0):
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill) if pad else a

    args = (
        pad1(tx_i, -10.0), pad1(ty_i, -10.0),
        pad1(tx_f, -10.0), pad1(ty_f, -10.0),
        (jnp.pad(v, ((0, 0), (0, pad), (0, 0))) if pad else v),
    )
    args = tuple(
        a.reshape((B, nchunks, chunk) + a.shape[2:]).swapaxes(0, 1) for a in args
    )

    def body(_, a):
        txi, tyi, txf, tyf, vc = a
        WXi = _weight_matrices(txi, cols)
        WYi = _weight_matrices(tyi, rows)
        ti = jnp.einsum("bnr,brwk->bnwk", WYi, g, precision=hp,
                        preferred_element_type=jnp.float32)
        din = jnp.einsum("bnw,bnwk->bnk", WXi, ti, precision=hp,
                         preferred_element_type=jnp.float32)

        WXf = _weight_matrices(txf, cols)
        WYf = _weight_matrices(tyf, rows)
        SXf = _weight_matrices(txf, cols, signed=True)
        SYf = _weight_matrices(tyf, rows, signed=True)
        tf = jnp.einsum("bnr,brwk->bnwk", WYf, g, precision=hp,
                        preferred_element_type=jnp.float32)
        gx = jnp.einsum("bnw,bnwk,bnk->bn", SXf, tf, vc, precision=hp)
        tf2 = jnp.einsum("bnr,brwk->bnwk", SYf, g, precision=hp,
                         preferred_element_type=jnp.float32)
        gy = jnp.einsum("bnw,bnwk,bnk->bn", WXf, tf2, vc, precision=hp)
        return None, (din, gx, gy)

    if nchunks == 1:
        _, (din, gx, gy) = body(None, tuple(a[0] for a in args))
        d_inp = din
    else:
        _, (din, gx, gy) = jax.lax.scan(body, None, args)
        din = din.swapaxes(0, 1).reshape(B, nchunks * chunk, C)[:, :N]
        gx = gx.swapaxes(0, 1).reshape(B, nchunks * chunk)[:, :N]
        gy = gy.swapaxes(0, 1).reshape(B, nchunks * chunk)[:, :N]
        d_inp = din

    d_inp = d_inp.reshape(B, H, W, C)
    d_inp = jnp.where(finite[..., None], d_inp, 0.0)
    # reference quirk #3: x channel scaled by the y freeze flag & vice versa
    gx = gx.reshape(B, N)[:, :N] if nchunks == 1 else gx
    d_flow = jnp.stack(
        [gx.reshape(B, N) * dyy, gy.reshape(B, N) * dxx], axis=-1
    ).reshape(B, H, W, 2)
    d_flow = jnp.where(finite[..., None], d_flow, 0.0)

    return (
        d_inp.astype(inp.dtype),
        d_flow.astype(flow.dtype),
        jnp.zeros_like(offset_x),
        jnp.zeros_like(offset_y),
    )


def _splat_fwd(inp, flow, scale, offset_x, offset_y):
    out = _splat_fwd_impl(inp, flow, scale, offset_x, offset_y)
    return out, (inp, flow, offset_x, offset_y)


def _splat_bwd(scale, res, g):
    if os.environ.get("OFD_SPLAT_BACKEND", "matmul") == "matmul":
        return _splat_bwd_matmul(scale, res, g)
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
