"""Whole linear-attention block as one fused Pallas TPU pipeline.

The reference UNet wraps LinearAttention in a pre-norm residual
(denoising_diffusion.py:216-244, 338-353):

    y = x + postLN( W_out @ middle( W_qkv @ preLN(x) ) + b_out )

Under XLA this is ~10 medium ops (two LayerNorms, two 1x1 convs, two
softmaxes, two einsums) whose intermediates round-trip HBM — by profile
~45% of UNet step time (PERF.md).  Here the whole block runs as TWO
pallas_call launches whose intermediates never leave VMEM:

  pass A (k/v): per N-block — preLN(x) -> [k|v] = ln @ W_kv -> online-max
     rescaled context accumulation ctx += exp(k-m)^T v, normalized by the
     k-softmax denominator at the end (flash-style, exact).
  pass B (q/out): per N-block — preLN(x) -> q = ln @ W_q -> per-head
     softmax over the head dim (roll-max cascade + selector matmuls) ->
     attn = q' @ ctx/N -> o = attn @ W_out + b -> postLN -> y = x + o.

preLN is recomputed in pass B (cheaper than materializing it to HBM).
Both passes are all matmuls (MXU) + lane-wise VPU ops.  Requires
heads*dim_head == 128 (one lane tile — the flagship config).  The backward
is a custom VJP recomputing through the XLA composition below (identical
gradients, reference semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention_pallas import _head_selector, _linear_attention_middle_xla

Array = jax.Array

LANES = 128
EPS = 1e-5


def _ln32(x: Array, g: Array) -> Array:
    """Bias-free channel LayerNorm in fp32 (models/unet.py ChanLayerNorm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + EPS) * g


def _block_xla(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim,
               compute_dtype=jnp.bfloat16):
    """XLA composition (the reference semantics; CPU fallback + VJP path)."""
    cdt = compute_dtype
    h = _ln32(x, g_pre).astype(cdt)
    qkv = (h @ w_qkv.astype(cdt)).astype(cdt)
    mid = _linear_attention_middle_xla(qkv, heads, dim)
    o = mid.astype(cdt) @ w_out.astype(cdt) + b_out.astype(cdt)
    o = _ln32(o, g_post)
    return x + o.astype(x.dtype)


# ---------------------------------------------------------------- kernels
def _ctx_kernel(x_ref, gpre_ref, wkv_ref, ctx_ref, m_scr, s_scr, acc_scr, *,
                n_total: int, block_n: int, dim: int, cdt=jnp.bfloat16):
    """Pass A: preLN + k/v projection + online ctx accumulation.

    grid (B, NB); x block (1, BN, C); ctx (1, hd, hd) fp32.
    """
    nb = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    hd = ctx_ref.shape[-1]

    @pl.when(nb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    ln = _ln32(x_ref[0], gpre_ref[0]).astype(cdt)
    kv = jax.lax.dot_general(
        ln, wkv_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, 2hd)
    k = kv[:, :hd]
    v = kv[:, hd:]
    # rows past the true N must not enter the k softmax: k -> -inf, v -> 0
    row = nb * block_n + jax.lax.broadcasted_iota(
        jnp.int32, (block_n, hd), dimension=0
    )
    valid = row < n_total
    k = jnp.where(valid, k, -1e30)
    v = jnp.where(valid, v, 0.0)

    m_old = m_scr[:]                                   # (1, hd)
    m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    ek = jnp.exp(k - m_new)                            # (BN, hd)

    s_scr[:] = s_scr[:] * alpha + jnp.sum(ek, axis=0, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha.reshape(hd, 1) + jax.lax.dot_general(
        ek, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(nb == n_blocks - 1)
    def _():
        # per-head block-diagonal mask: attention is per-head (reference
        # einsum bnhd,bnhe->bhde); the flat (hd, hd) outer product holds
        # cross-head terms that must not reach the q matmul in pass B.
        hrow = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0) // dim
        hcol = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1) // dim
        ctx = acc_scr[:] / s_scr[:].reshape(hd, 1)
        ctx_ref[0] = jnp.where(hrow == hcol, ctx, 0.0)


def _out_kernel(x_ref, gpre_ref, wq_ref, ctx_ref, sel_ref, lsel_ref,
                wout_ref, bout_ref, gpost_ref, y_ref, *, dim: int,
                n_total: int, cdt=jnp.bfloat16):
    """Pass B: preLN + q path + out proj + postLN + residual."""
    xb = x_ref[0]
    ln = _ln32(xb, gpre_ref[0]).astype(cdt)
    q = jax.lax.dot_general(
        ln, wq_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, hd)

    # per-head softmax over the aligned dim-lane groups (attention_pallas.py)
    mwin = q
    shift = 1
    while shift < dim:
        mwin = jnp.maximum(mwin, pltpu.roll(mwin, LANES - shift, 1))
        shift *= 2
    sel = sel_ref[:]
    lsel = lsel_ref[:]
    mhead = jax.lax.dot_general(
        mwin, lsel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mfull = jax.lax.dot_general(
        mhead, sel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    eq = jnp.exp(q - mfull)
    ssum = jax.lax.dot_general(
        eq, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sfull = jax.lax.dot_general(
        ssum, sel, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    qprime = (eq / sfull * (float(dim) ** -0.5)).astype(cdt)

    ctx = (ctx_ref[0] / float(n_total)).astype(cdt)
    attn = jax.lax.dot_general(
        qprime, ctx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BN, hd)

    o = jax.lax.dot_general(
        attn.astype(cdt), wout_ref[:].astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bout_ref[0]
    o = _ln32(o, gpost_ref[0])
    y_ref[0] = (xb.astype(jnp.float32) + o).astype(y_ref.dtype)


def _fused_block_pallas(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim,
                        block_n: int = 1024, compute_dtype=jnp.bfloat16):
    B, N, C = x.shape
    hd = heads * dim
    assert hd == LANES, (heads, dim)
    block_n = min(block_n, max(128, 1 << (N - 1).bit_length()))
    nb = -(-N // block_n)
    pad = nb * block_n - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Np = nb * block_n

    g_pre2 = g_pre.reshape(1, C).astype(jnp.float32)
    g_post2 = g_post.reshape(1, C).astype(jnp.float32)
    b_out2 = b_out.reshape(1, C).astype(jnp.float32)
    w_q = w_qkv[:, :hd].astype(jnp.float32)
    w_kv = w_qkv[:, hd:].astype(jnp.float32)
    w_out32 = w_out.astype(jnp.float32)

    ctx = pl.pallas_call(
        functools.partial(_ctx_kernel, n_total=N, block_n=block_n, dim=dim,
                          cdt=compute_dtype),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * hd), lambda b, n: (0, 0),
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
    )(x, g_pre2, w_kv)

    sel = _head_selector(heads, dim)
    leaders = (jnp.arange(hd) % dim == 0)[:, None]
    lsel = jnp.where(leaders, sel, 0.0)

    y = pl.pallas_call(
        functools.partial(_out_kernel, dim=dim, n_total=N,
                          cdt=compute_dtype),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hd), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, hd), lambda b, n: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, heads), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, heads), lambda b, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, C), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, C), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), x.dtype),
    )(x, g_pre2, w_q, ctx, sel, lsel, w_out32, b_out2, g_post2)
    return y[:, :N]


# ------------------------------------------------------------- public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_linear_attention_block(
    x: Array, g_pre: Array, w_qkv: Array, w_out: Array, b_out: Array,
    g_post: Array, heads: int = 4, dim: int = 32,
) -> Array:
    """y = x + postLN(W_out @ middle(W_qkv @ preLN(x)) + b) on (B, N, C)."""
    return _dispatch(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim)


def _dispatch(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim):
    backend = os.environ.get("OFD_ATTN_FUSED", "1")
    on_tpu = jax.devices()[0].platform != "cpu"
    if backend == "1" and heads * dim == LANES and on_tpu:
        return _fused_block_pallas(
            x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim
        )
    return _block_xla(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim,
                      compute_dtype=x.dtype)


def _fwd(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim):
    out = _dispatch(x, g_pre, w_qkv, w_out, b_out, g_post, heads, dim)
    return out, (x, g_pre, w_qkv, w_out, b_out, g_post)


def _bwd(heads, dim, res, g):
    x, g_pre, w_qkv, w_out, b_out, g_post = res
    _, vjp = jax.vjp(
        lambda *a: _block_xla(*a, heads, dim, compute_dtype=x.dtype),
        x, g_pre, w_qkv, w_out, b_out, g_post,
    )
    return vjp(g)


fused_linear_attention_block.defvjp(_fwd, _bwd)

__all__ = ["fused_linear_attention_block"]
