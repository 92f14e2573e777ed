"""Fused linear-attention middle, Pallas TPU kernel.

The reference's LinearAttention (denoising_diffusion.py:216-244) computes

    q' = softmax_d(q) * d^-0.5      (per-position, per-head)
    k' = softmax_N(k)               (global over space, per head-channel)
    ctx = sum_n k'[n] (x) v[n]/N    (h, d, d)
    out[n] = ctx^T q'[n]

XLA materializes q/k/v slices, fp32 softmax intermediates and the einsum
operands — ~5x more HBM traffic than necessary and lane-axis reductions it
lowers poorly.  This kernel computes the whole middle in two passes over the
fused qkv tensor with flash-style online rescaling:

  pass A (k, v blocks): running max m, sumexp s per (h*d) channel and the
     unnormalized context accumulation ctx += exp(k - m)^T v, rescaled when
     m updates; normalized by s at the end of the pass.
  pass B (q blocks): per-head softmax over d (head-wise max via a
     roll-max cascade + head-broadcast matmuls), out = q' @ ctx.

Layout: qkv (B, N, 3*h*d) bf16, h*d == 128 (one lane tile).  Used by
models/unet.py under a custom_vjp whose backward recomputes through the XLA
reference formulation (identical gradients, reference semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128


def _head_selector(heads: int, dim: int) -> jnp.ndarray:
    """(h*d, h) one-hot head-membership matrix."""
    hd = heads * dim
    sel = jnp.zeros((hd, heads), jnp.float32)
    idx = jnp.arange(hd) // dim
    return sel.at[jnp.arange(hd), idx].set(1.0)


def _ctx_kernel(kv_ref, ctx_ref, m_scr, s_scr, acc_scr, *, dim: int):
    """Pass A: accumulate ctx over N blocks with online max rescaling.

    grid (B, NB); kv_ref block (1, BN, 2*hd) = [k | v]; ctx_ref (1, hd, hd).
    The finalized ctx is masked to per-head block-diagonal: attention is
    per-head (reference einsum bnhd,bnhe->bhde) and the flat (hd, hd) outer
    product contains cross-head terms that must not reach the q matmul.
    """
    nb = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    hd = ctx_ref.shape[-1]

    @pl.when(nb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    k = kv_ref[0, :, :hd].astype(jnp.float32)
    v = kv_ref[0, :, hd:].astype(jnp.float32)

    m_old = m_scr[:]                                   # (1, hd)
    m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                     # rescale factor
    ek = jnp.exp(k - m_new)                            # (BN, hd)

    s_scr[:] = s_scr[:] * alpha + jnp.sum(ek, axis=0, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha.reshape(hd, 1) + jax.lax.dot_general(
        ek, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(nb == n_blocks - 1)
    def _():
        hrow = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim
        hcol = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim
        ctx = acc_scr[:] / s_scr[:].reshape(hd, 1)
        ctx_ref[0] = jnp.where(hrow == hcol, ctx, 0.0)


def _out_kernel(q_ref, ctx_ref, sel_ref, lsel_ref, out_ref, *, dim: int,
                n_total: int):
    """Pass B: out = (softmax_d(q) * d^-0.5) @ (ctx / N).

    q_ref block (1, BN, hd); ctx (1, hd, hd) f32; sel/lsel (hd, h) head
    selector and leader-lane selector.
    """
    q = q_ref[0].astype(jnp.float32)

    # head-wise max over each aligned `dim`-lane group: a roll-max cascade
    # gives each lane the max of a dim-wide cyclic window; the group-leader
    # lane (first of each head) then holds the exact per-head max, which is
    # picked out and broadcast back with two selector matmuls (MXU).
    mwin = q
    shift = 1
    while shift < dim:
        mwin = jnp.maximum(mwin, pltpu.roll(mwin, LANES - shift, 1))
        shift *= 2
    sel = sel_ref[:]                                    # (hd, h)
    lsel = lsel_ref[:]                                  # (hd, h) leaders only
    mhead = jax.lax.dot_general(
        mwin, lsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (BN, h)
    mfull = jax.lax.dot_general(
        mhead, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # (BN, hd)

    eq = jnp.exp(q - mfull)
    ssum = jax.lax.dot_general(
        eq, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                   # (BN, h)
    sfull = jax.lax.dot_general(
        ssum, sel, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qprime = eq / sfull * (float(dim) ** -0.5)

    ctx = ctx_ref[0] / float(n_total)                   # fold v/N here
    out_ref[0] = jax.lax.dot_general(
        qprime, ctx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _linear_attention_middle_pallas(
    qkv: Array, heads: int, dim: int, block_n: int = 1024
) -> Array:
    B, N, three_hd = qkv.shape
    hd = heads * dim
    assert three_hd == 3 * hd and hd == LANES, (three_hd, hd)
    # pad N to a block multiple (zero k-rows get exp(k-m) weight but zero v —
    # they perturb the k softmax denominator, so mask with -inf k instead)
    nb = -(-N // block_n)
    pad = nb * block_n - N
    if pad:
        pad_block = jnp.concatenate(
            [
                jnp.zeros((B, pad, hd), qkv.dtype),
                jnp.full((B, pad, hd), -1e30, qkv.dtype),  # k = -inf
                jnp.zeros((B, pad, hd), qkv.dtype),
            ],
            axis=-1,
        )
        qkv = jnp.concatenate([qkv, pad_block], axis=1)
    Np = nb * block_n

    kv = qkv[..., hd:]  # (B, Np, 2hd)
    q = qkv[..., :hd]

    ctx = pl.pallas_call(
        functools.partial(_ctx_kernel, dim=dim),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, 2 * hd), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hd, hd), lambda b, n: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hd, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((1, hd), jnp.float32),
            pltpu.VMEM((hd, hd), jnp.float32),
        ],
    )(kv)

    sel = _head_selector(heads, dim)
    leaders = (jnp.arange(hd) % dim == 0)[:, None]
    lsel = jnp.where(leaders, sel, 0.0)
    out = pl.pallas_call(
        functools.partial(_out_kernel, dim=dim, n_total=N),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, hd), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, hd), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, heads), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, heads), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, hd), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, hd), qkv.dtype),
    )(q, ctx, sel, lsel)
    return out[:, :N]


def _linear_attention_middle_xla(qkv: Array, heads: int, dim: int) -> Array:
    """Reference XLA formulation (denoising_diffusion.py:229-243); also the
    recompute path for the custom VJP."""
    B, N, _ = qkv.shape
    hd = heads * dim
    qkv = qkv.reshape(B, N, 3, heads, dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(qkv.dtype)
    q = q * (dim ** -0.5)
    v = v / N
    ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", ctx, q)
    return out.reshape(B, N, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def linear_attention_middle(qkv: Array, heads: int = 4, dim: int = 32) -> Array:
    """softmax/context/out middle of LinearAttention; Pallas fast path on TPU
    (h*d == 128), XLA reference otherwise."""
    return _dispatch(qkv, heads, dim)


def _dispatch(qkv, heads, dim):
    # XLA default: on this hardware the fused XLA lowering matches the Pallas
    # kernel's HBM traffic and per-kernel launch overheads favor one fused
    # program; OFD_ATTN_BACKEND=pallas opts into the kernel.
    backend = os.environ.get("OFD_ATTN_BACKEND", "xla")
    on_tpu = jax.devices()[0].platform != "cpu"
    if backend == "pallas" and heads * dim == LANES and on_tpu:
        return _linear_attention_middle_pallas(qkv, heads, dim)
    return _linear_attention_middle_xla(qkv, heads, dim)


def _fwd(qkv, heads, dim):
    return _dispatch(qkv, heads, dim), qkv


def _bwd(heads, dim, qkv, g):
    _, vjp = jax.vjp(lambda t: _linear_attention_middle_xla(t, heads, dim), qkv)
    return vjp(g)


linear_attention_middle.defvjp(_fwd, _bwd)

__all__ = ["linear_attention_middle"]
