"""Pallas TPU conv kernels for the UNet's full-res stride-1 convs.

Why this exists (measured, debug/bench_native_convs.py, v5e b2 448x1024):
XLA's conv_general_dilated lowering at the UNet's native-res shapes runs
FAR below roofline — 3x3 64->64 at ~12% of peak (~25% of its cout-64
ceiling), the 7x7 stem (cin 9) at ~1.6%, and a 1x1 conv 9x slower than the
numerically-identical reshaped dot.  The trace shows XLA picking layouts
with the (tiny) batch dim in sublanes.  Native-res DDIM sampling is
conv-bound (~60% of step time), so this is the round-3 perf lever
(BASELINE.md "frames/sec (436x1024)" row).

Two kernel generations live here:

* v1 ``_conv_pallas`` (kept for A/B benching): row-slab window assembly +
  kh*kw small dots.  Measured 0.8-1.1x XLA — bound by strided gather
  copies, not the MXU (see the v2 comment block below).
* v2 ``_conv_fold`` (opt-in): width-folded, flat-slab, aligned taps.

ROUND-4 DISPATCH VERDICT (measured end-to-end on v5e, VERDICT.md r3): the
fold kernel wins its per-tap microbenches (stem 3.5x, 64->64 1.23x) but
LOSES in composition — 62.6 vs 131.7 denoise steps/s on the headline
sampler, and 0.257 vs 0.265 frames/s even at the native-res shape it was
built for.  Each pallas_call is an opaque custom call: it breaks XLA's
producer/consumer fusions on both sides, and the extra pad/slice/halo
assembly around every conv adds HBM passes that a memory-bound program
cannot afford.  The microbench measures the kernel alone; the program pays
the fusion barriers.  Therefore the DEFAULT lowering for spatial convs is
XLA's conv_general_dilated; the fold kernel stays available behind
``OFD_CONV_BACKEND=fold`` (and v1 behind ``=pallas``) for shapes where an
END-TO-END A/B shows a win (none known today; tests/test_conv_pallas.py
keeps both kernels correct).

Semantics: float conv, zero ("same") padding, stride 1, odd kernel.
Gradients: custom_vjp with the standard XLA transposed-conv backward.

Dispatch (:func:`conv2d_same`): XLA conv by default everywhere —
INCLUDING 1x1 convs (the reshaped-dot form wins its microbench 9x but
loses end-to-end at every bench shape; see the comment in conv2d_same).
``OFD_CONV_BACKEND=fold|pallas`` force the Pallas kernels (fall back to
XLA when shape-infeasible) and flip 1x1s to dot form, which the fold
plan assumes; ``OFD_1X1=dot|xla`` overrides independently.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
# Block-size budget.  v5e VMEM is 128 MiB; the per-step footprint counts the
# pipeline's DOUBLE-BUFFERED input/output blocks (Pallas prefetches grid
# step i+1 while i computes), both scratch buffers, and headroom for Mosaic
# stack temporaries (measured: the retiling copies around the reshape/cast
# cost ~2 extra block-sized f32 buffers).  The matching Mosaic cap is set
# via CompilerParams(vmem_limit_bytes=_VMEM_LIMIT) — without it the default
# 16 MiB scoped limit rejects any usefully-sized block at W=1024.
_VMEM_BYTES = 64 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(xp_ref, xc_ref, xn_ref, w_ref, out_ref, wbuf, acc, *,
            BH: int, W: int, kh: int, kw: int, cdt):
    i = pl.program_id(1)
    nH = pl.num_programs(1)
    ph, pw = kh // 2, kw // 2
    C = xc_ref.shape[-1]
    Cout = out_ref.shape[-1]

    wbuf[:] = jnp.zeros_like(wbuf)
    if ph:
        top = xp_ref[0, BH - ph:, :, :].astype(cdt)
        wbuf[0:ph, pw:pw + W, :] = jnp.where(i > 0, top, 0)
        bot = xn_ref[0, :ph, :, :].astype(cdt)
        wbuf[ph + BH:, pw:pw + W, :] = jnp.where(i < nH - 1, bot, 0)
    wbuf[ph:ph + BH, pw:pw + W, :] = xc_ref[0].astype(cdt)

    acc[:] = jnp.zeros_like(acc)
    for dy in range(kh):
        for dx in range(kw):
            xs = wbuf[dy:dy + BH, dx:dx + W, :].reshape(BH * W, C)
            acc[:] += jax.lax.dot_general(
                xs, w_ref[dy, dx].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc[:].reshape(BH, W, Cout).astype(out_ref.dtype)


def _block_h(H: int, W: int, C: int, Cout: int, kh: int, kw: int) -> int:
    """Largest power-of-two row-slab dividing H that fits the VMEM budget."""
    bh = 32
    while bh > 1:
        if H % bh == 0:
            ph, pw = kh // 2, kw // 2
            need = (
                6 * bh * W * C * 2                       # 3 inputs, 2-buffered
                + 2 * bh * W * Cout * 2                  # output, 2-buffered
                + (bh + 2 * ph) * (W + 2 * pw) * C * 2   # window scratch
                + bh * W * Cout * 4                      # f32 acc scratch
                + 2 * bh * W * max(C, Cout) * 4          # stack temporaries
            )
            if need <= _VMEM_BYTES:
                return bh
        bh //= 2
    return 1


def _conv_pallas(x: Array, kernel: Array, compute_dtype=jnp.bfloat16):
    B, H, W, C = x.shape
    kh, kw, _, Cout = kernel.shape
    ph, pw = kh // 2, kw // 2
    BH = _block_h(H, W, C, Cout, kh, kw)
    nH = H // BH
    blk = lambda off: pl.BlockSpec(
        (1, BH, W, C),
        lambda b, i, off=off: (b, jnp.clip(i + off, 0, nH - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, BH=BH, W=W, kh=kh, kw=kw, cdt=compute_dtype
        ),
        grid=(B, nH),
        in_specs=[
            blk(-1), blk(0), blk(+1),
            pl.BlockSpec(
                (kh, kw, C, Cout), lambda b, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BH, W, Cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BH + 2 * ph, W + 2 * pw, C), compute_dtype),
            pltpu.VMEM((BH * W, Cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, x, x, kernel)


# ---------------------------------------------------------------------------
# v2: width-folded, flat-slab kernel.
#
# Measured v1 verdict (debug/bench_conv_pallas_quick.py, v5e): 0.8-1.1x XLA,
# both stuck at 5-13% MXU *even at full 128x128 tiles* — so the bottleneck is
# not MXU tile waste but the window assembly: every (dy,dx) tap slices wbuf
# with a sublane-misaligned, stride-mismatched view whose reshape to a dot
# operand forces a strided gather copy (9 per slab).
#
# v2 removes both problems at once:
#   * Width-fold by F (chosen by a cost model): x (B,H,W,C) is viewed as
#     (B,H,W/F,F*C) — a free row-major reshape — so C=64 convs become
#     full-lane (K=N=128) contractions.  The folded kernel matrices are
#     block-sparse arrangements of the original taps (zero FLOP waste beyond
#     the block zeros; F is chosen to minimise ceil-tile cost per pixel).
#   * Flat slab layout: the (halo+slab) rows live in a 2D (rows, F*C) VMEM
#     buffer whose padded folded width W2p is a sublane-tile multiple, so a
#     (dy, t) tap is the *contiguous, tile-aligned* view
#     [8 + dy*W2p + t : ... + BH*W2p) — the only relayouts left are T-1
#     whole-buffer sublane rotations (one per folded width tap, typically 2),
#     instead of kh*kw strided gathers.
#   * Width halo + alignment padding are baked in by one XLA pad outside the
#     kernel; the pad columns produce garbage output rows that are sliced off
#     outside (they never contaminate valid outputs — valid output (r, jp)
#     reads flat rows (r+dy)*W2p + jp + t which stay inside the real
#     halo/pad for every valid jp).
# ---------------------------------------------------------------------------


def _fold_plan(C: int, Cout: int, W: int, kw: int) -> Tuple[int, int, int]:
    """Pick the width fold factor F minimising per-pixel MXU tile cost.

    Cost per original pixel ~ T * ceil(F*C/128) * ceil(F*Cout/128) / F where
    T is the folded tap count; kh is a constant factor and dropped.
    Returns (F, t0, t1) with folded taps t in [t0, t1].
    """
    pw = kw // 2
    best = None
    F = 1
    while F <= 8 and W % F == 0:
        t0 = -((pw + F - 1) // F)  # floor(-pw / F)
        t1 = (F - 1 + kw - 1 - pw) // F
        T = t1 - t0 + 1
        # primary: MXU passes per pixel; secondary: K underfill (measured:
        # F=2 K=128 beats F=1 K=64 at equal pass count, 1.27x at 64->128)
        cost = (
            T * (-(-C * F // LANES)) * (-(-Cout * F // LANES)) / F,
            max(0, LANES - min(C * F, LANES)),
        )
        if best is None or cost < best[0]:
            best = (cost, F, t0, t1)
        F *= 2
    return best[1], best[2], best[3]


def _fold_matrices(kernel: Array, F: int, t0: int, t1: int) -> Array:
    """(kh,kw,C,Cout) HWIO taps -> (kh, T, F*C, F*Cout) folded matrices.

    Folded input slot a and output slot b at folded tap t contribute the
    original tap dx = t*F + a - b + pw (zero block when out of range):
    out[j*F + b] += x[(j+t)*F + a] @ W[dy, dx].
    """
    kh, kw, C, Co = kernel.shape
    pw = kw // 2
    zero = jnp.zeros((C, Co), kernel.dtype)
    mats = []
    for dy in range(kh):
        per_t = []
        for t in range(t0, t1 + 1):
            rows = []
            for a in range(F):
                row = []
                for b in range(F):
                    dx = t * F + a - b + pw
                    row.append(kernel[dy, dx] if 0 <= dx < kw else zero)
                rows.append(jnp.concatenate(row, axis=1))
            per_t.append(jnp.concatenate(rows, axis=0))
        mats.append(jnp.stack(per_t))
    return jnp.stack(mats)


def _fold_block_rows(H, W2p, C2, C2o, kh, T, cbytes) -> int:
    """Largest power-of-two row slab dividing H within the VMEM budget."""
    bh = 32
    while bh > 1:
        if H % bh == 0:
            ph = kh // 2
            R = 16 + (bh + kh - 1) * W2p
            need = (
                2 * (bh + 2 * ph) * W2p * C2 * cbytes  # center+halo, 2-buf
                + 2 * bh * W2p * C2o * cbytes    # output, 2-buffered
                + R * C2 * cbytes * T            # flat slab + T-1 rotations
                + bh * W2p * C2o * 4             # f32 accumulator
                + 2 * bh * W2p * max(C2, C2o) * 4  # Mosaic stack temporaries
            )
            if need <= _VMEM_BYTES:
                return bh
        bh //= 2
    return 1


def _fold_kernel(xc_ref, hl_ref, w_ref, a_ref, b_ref, out_ref, *scratch,
                 BH, W2p, W2, kh, t0, T, cdt, affine, silu, norot=False):
    """One (batch, row-slab) grid step.

    Flat slab rows: [0,8) head pad | ph*W2p top halo | BH*W2p center |
    ph*W2p bottom halo | [?,R) tail pad.  Tap (dy, t) of output flat row q
    reads slab row 8 + q + dy*W2p + t: dy offsets are W2p-multiples
    (tile-aligned views); the T width shifts become whole-buffer sublane
    rotations with wrap rows masked to zero (they are exactly the 'same'
    conv's zero width boundary when W2p == W2, or land in pad columns
    otherwise).
    """
    wbuf = scratch[0]
    tbs = scratch[1:-1]
    acc = scratch[-1]
    i = pl.program_id(1)
    nH = pl.num_programs(1)
    ph = kh // 2
    S = BH * W2p
    OFF = 8
    C2o = out_ref.shape[-1]

    def put(rows, vals, keep=None):
        if affine:
            v32 = vals.astype(jnp.float32)
            v32 = v32 * a_ref[0, 0] + b_ref[0, 0]
            if silu:
                v32 = v32 * jax.nn.sigmoid(v32)
            vals = v32
            if keep is not None:
                # the transform maps the baked-zero image boundary to
                # silu(b) != 0; re-zero it (only the affine path needs this,
                # the halo tensor is already zero there)
                vals = jnp.where(keep, vals, 0)
        wbuf[OFF + rows[0]: OFF + rows[1]] = vals.astype(cdt)

    put((ph * W2p, (ph + BH) * W2p), xc_ref[0].reshape(S, -1))
    if ph:
        put((0, ph * W2p), hl_ref[0, 0, :ph].reshape(ph * W2p, -1),
            keep=i > 0)
        put(((ph + BH) * W2p, (2 * ph + BH) * W2p),
            hl_ref[0, 0, ph:].reshape(ph * W2p, -1), keep=i < nH - 1)

    # T-1 sublane rotations: tb_u[r] = wbuf[r + u], with wrap rows (intended
    # width column jp such that jp + u falls outside the row) zeroed — the
    # 'same' conv zero boundary.
    R = wbuf.shape[0]
    if T > 1:
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        col = (col - OFF) % W2p  # intended width column of each flat row
    srcs = {}
    ti = 0
    for t_rel in range(T):
        u = t_rel + t0
        if u == 0 or norot:  # norot: timing diagnostic (wrong math)
            srcs[t_rel] = wbuf
            continue
        tb = tbs[ti]
        ti += 1
        if u > 0:
            bad = col[: R - u] >= W2p - u
            tb[0: R - u] = jnp.where(bad, 0, wbuf[u: R])
        else:
            bad = col[-u:] < -u
            tb[-u: R] = jnp.where(bad, 0, wbuf[0: R + u])
        srcs[t_rel] = tb

    acc[:] = jnp.zeros_like(acc)
    for dy in range(kh):
        for t_rel in range(T):
            xs = srcs[t_rel][OFF + dy * W2p: OFF + dy * W2p + S, :]
            acc[:] += jax.lax.dot_general(
                xs, w_ref[dy, t_rel].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc[:].reshape(BH, W2p, C2o).astype(out_ref.dtype)


def _conv_fold(x: Array, kernel: Array, compute_dtype=jnp.bfloat16,
               in_scale=None, in_bias=None, silu=False,
               force_F=None, norot=False):
    # NOTE: deliberately not jax.jit-wrapped — this always runs inside the
    # caller's jit, and a nested module-level jit interacts badly with
    # jax.clear_caches() (KeyError in _lower_jaxpr_to_fun_cached for the
    # nested closed_call; hit by the bench's trace-time backend switching).
    B, H, W, C = x.shape
    kh, kw, _, Cout = kernel.shape
    F, t0, t1 = _fold_plan(C, Cout, W, kw)
    if force_F is not None:  # perf-diagnostic override
        pw = kw // 2
        F = force_F
        t0 = -((pw + F - 1) // F)
        t1 = (F - 1 + kw - 1 - pw) // F
    T = t1 - t0 + 1
    W2 = W // F
    C2, C2o = C * F, Cout * F
    nt_l = -t0
    # fast path: W2 already a sublane multiple -> no width pad, no output
    # slice; the rotation wrap masking supplies the zero boundary.
    nopad = W2 % 8 == 0
    W2p = W2 if nopad else -(-(W2 + T - 1) // 8) * 8
    cbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    BH = _fold_block_rows(H, W2p, C2, C2o, kh, T, cbytes)
    nH = H // BH
    ph = kh // 2

    affine = in_scale is not None
    if affine and not nopad:
        # the padded path's zero pad columns cannot host the in-kernel
        # transform (silu(b) != 0); apply it in XLA instead
        x32 = x.astype(jnp.float32)
        x32 = x32 * in_scale[:, None, None, :] + in_bias[:, None, None, :]
        if silu:
            x32 = jax.nn.silu(x32)
        x = x32.astype(x.dtype)
        affine = False

    xf = x.reshape(B, H, W2, C2)
    if not nopad:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (nt_l, W2p - W2 - nt_l), (0, 0)))
    M = _fold_matrices(kernel, F, t0, t1)

    # baked-zero halo rows: (B, nH, 2ph, W2p, C2)
    xr = xf.reshape(B, nH, BH, W2p, C2)
    zrow = jnp.zeros((B, 1, ph, W2p, C2), xf.dtype)
    halo = jnp.concatenate([
        jnp.concatenate([zrow, xr[:, :-1, BH - ph:]], axis=1),
        jnp.concatenate([xr[:, 1:, :ph], zrow], axis=1),
    ], axis=2)

    if affine:
        # per-(batch, channel) input transform, folded to C2 lanes
        av = jnp.tile(in_scale.astype(jnp.float32), (1, F))
        bv = jnp.tile(in_bias.astype(jnp.float32), (1, F))
    else:
        av = jnp.zeros((B, C2), jnp.float32)
        bv = av
    # (B, 1, C2) with a (1, 1, C2) block: both trailing block dims equal the
    # array dims — the only always-legal Mosaic block for a per-batch vector
    av, bv = av[:, None, :], bv[:, None, :]
    vec = pl.BlockSpec((1, 1, C2), lambda b, i: (b, 0, 0),
                       memory_space=pltpu.VMEM)

    R = 16 + (BH + kh - 1) * W2p
    out = pl.pallas_call(
        functools.partial(
            _fold_kernel, BH=BH, W2p=W2p, W2=W2, kh=kh, t0=t0, T=T,
            cdt=compute_dtype, affine=affine, silu=silu, norot=norot,
        ),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, BH, W2p, C2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * ph, W2p, C2),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, T, C2, C2o), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec,
        ],
        out_specs=pl.BlockSpec(
            (1, BH, W2p, C2o), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W2p, C2o), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((R, C2), compute_dtype)]
            + [pltpu.VMEM((R, C2), compute_dtype)] * (T - 1)
            + [pltpu.VMEM((BH * W2p, C2o), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(xf, halo, M, av, bv)
    if not nopad:
        out = jax.lax.slice_in_dim(out, nt_l, nt_l + W2, axis=2)
    return out.reshape(B, H, W, Cout)


def _use_fold(x, kernel) -> bool:
    B, H, W, C = x.shape
    kh, kw, _, Cout = kernel.shape
    if not (kh % 2 == 1 and kw % 2 == 1 and (kh > 1 or kw > 1)):
        return False
    F, t0, t1 = _fold_plan(C, Cout, W, kw)
    T = t1 - t0 + 1
    W2 = W // F
    W2p = W2 if W2 % 8 == 0 else -(-(W2 + T - 1) // 8) * 8
    BH = _fold_block_rows(H, W2p, C * F, Cout * F, kh, T, 2)
    return BH >= kh // 2 and H % BH == 0


def _conv_xla(x: Array, kernel: Array) -> Array:
    kh, kw = kernel.shape[:2]
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _use_pallas(x, kernel) -> bool:
    backend = os.environ.get("OFD_CONV_BACKEND", "auto")
    if backend == "xla":
        return False
    B, H, W, C = x.shape
    kh, kw, _, Cout = kernel.shape
    # Hard feasibility: odd kernel, halo confined to the adjacent row slab.
    feasible = (
        kh % 2 == 1 and kw % 2 == 1 and (kh > 1 or kw > 1)
        and kh // 2 <= _block_h(H, W, C, Cout, kh, kw)
    )
    if backend == "pallas":  # debug override: skip the profit heuristics
        return feasible
    return (
        feasible
        and jax.devices()[0].platform not in ("cpu",)
        and C <= LANES and Cout <= LANES
        and H % 2 == 0
        and H * W >= 64 * 64
        and W % 8 == 0
    )


def _dispatch(x: Array, kernel: Array) -> Array:
    backend = os.environ.get("OFD_CONV_BACKEND", "auto")
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if backend == "fold" and _use_fold(x, kernel):
        return _conv_fold(x, kernel, compute_dtype=cdt)
    if backend == "pallas" and _use_pallas(x, kernel):
        return _conv_pallas(x, kernel, compute_dtype=cdt)
    return _conv_xla(x, kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _conv_same(x: Array, kernel: Array) -> Array:
    return _dispatch(x, kernel)


def _conv_same_fwd(x, kernel):
    return _conv_same(x, kernel), (x, kernel)


def _conv_same_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    # dgrad: for a stride-1 'same' conv, dL/dx is itself a 'same' conv of g
    # with the spatially-flipped, io-swapped kernel — so it takes the same
    # fast TPU lowering as the forward.
    wf = jnp.flip(kernel, (0, 1)).transpose(0, 1, 3, 2).astype(x.dtype)
    dx = _dispatch(g, wf)
    # wgrad: conv is linear in the kernel; transpose-evaluate without the
    # wasted primal forward a jax.vjp would run.
    dk = jax.linear_transpose(lambda k: _conv_xla(x, k), kernel)(g)[0]
    return dx, dk.astype(kernel.dtype)


_conv_same.defvjp(_conv_same_fwd, _conv_same_bwd)


# --- fused input-transform variant: y = conv(silu(x*a + b), k) ------------
#
# The UNet Block chain is conv -> GroupNorm -> (time scale/shift) -> SiLU ->
# next conv (reference denoising_diffusion.py:172-214).  The normalize/
# scale-shift/SiLU between two convs is a pure per-(batch, channel) affine +
# SiLU once the GroupNorm statistics are reduced, so it can run inside the
# next conv's slab load (VMEM-local) instead of as its own full HBM pass —
# the dominant cost at native res, where the step is memory-bound.


def _silu_affine_xla(x, kernel, a, b):
    x32 = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    z = jax.nn.silu(x32).astype(x.dtype)
    return _conv_xla(z, kernel)


def _dispatch_gn(x, kernel, a, b):
    backend = os.environ.get("OFD_CONV_BACKEND", "auto")
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    if backend == "fold" and _use_fold(x, kernel):
        return _conv_fold(x, kernel, compute_dtype=cdt,
                          in_scale=a, in_bias=b, silu=True)
    return _silu_affine_xla(x, kernel, a, b)


@jax.custom_vjp
def _conv_same_gn(x: Array, kernel: Array, a: Array, b: Array) -> Array:
    return _dispatch_gn(x, kernel, a, b)


def _conv_same_gn_fwd(x, kernel, a, b):
    return _conv_same_gn(x, kernel, a, b), (x, kernel, a, b)


def _conv_same_gn_bwd(res, g):
    x, kernel, a, b = res
    g = g.astype(x.dtype)
    wf = jnp.flip(kernel, (0, 1)).transpose(0, 1, 3, 2).astype(x.dtype)
    dz = _dispatch(g, wf).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    u = x32 * a[:, None, None, :] + b[:, None, None, :]
    sig = jax.nn.sigmoid(u)
    du = dz * (sig * (1.0 + u * (1.0 - sig)))
    dx = (du * a[:, None, None, :]).astype(x.dtype)
    da = jnp.sum(du * x32, axis=(1, 2)).astype(a.dtype)
    db = jnp.sum(du, axis=(1, 2)).astype(b.dtype)
    z = (u * sig).astype(x.dtype)
    dk = jax.linear_transpose(lambda k: _conv_xla(z, k), kernel)(g)[0]
    return dx, dk.astype(kernel.dtype), da, db


_conv_same_gn.defvjp(_conv_same_gn_fwd, _conv_same_gn_bwd)


def conv2d_same(x: Array, kernel: Array, in_affine=None) -> Array:
    """Stride-1 'same' NHWC conv: Pallas fast path on TPU, XLA otherwise.

    kernel is HWIO.  1x1 kernels run as a reshaped dot (measured 9x faster
    than XLA's 1x1 conv lowering at native-res shapes).  ``in_affine=(a, b)``
    with per-(batch, channel) vectors computes conv(silu(x*a + b), kernel)
    with the transform fused into the conv's slab load on TPU.
    """
    kh, kw = kernel.shape[:2]
    # 1x1 routing: the reshaped dot wins its MICRObench 9x at native-res
    # shapes, but measured END-TO-END (debug/probe_ab.py, v5e) it loses at
    # every bench shape — 135.6 vs 138.7 steps/s headline, 0.265 vs 0.273
    # f/s native — because the rank-collapsing reshape around each dot
    # breaks XLA's elementwise fusion chains exactly like a custom call
    # would.  Default follows the conv backend: XLA 1x1 conv unless the
    # Pallas pipeline (whose fold plan assumes dot-form 1x1s) is forced on.
    fold_on = os.environ.get("OFD_CONV_BACKEND") in ("fold", "pallas")
    as_dot = os.environ.get("OFD_1X1", "dot" if fold_on else "xla") == "dot"
    if in_affine is not None:
        a, b = in_affine
        if kh == 1 and kw == 1 and as_dot:
            x32 = (x.astype(jnp.float32) * a[:, None, None, :]
                   + b[:, None, None, :])
            z = jax.nn.silu(x32).astype(x.dtype)
            return z @ kernel[0, 0].astype(z.dtype)
        return _conv_same_gn(x, kernel.astype(x.dtype),
                             a.astype(jnp.float32), b.astype(jnp.float32))
    if kh == 1 and kw == 1 and as_dot:
        return x @ kernel[0, 0].astype(x.dtype)
    return _conv_same(x, kernel.astype(x.dtype))


__all__ = ["conv2d_same"]
