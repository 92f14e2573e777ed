"""Flash (online-softmax) quadratic attention for the UNet bottleneck.

The reference's bottleneck ``Attention`` (denoising_diffusion.py:246-268)
materializes the full similarity matrix: ``sim = q @ k^T`` over N = H/8 *
W/8 tokens, softmax, then ``attn @ v``.  Under XLA that is exact but
HBM-catastrophic at scale: at native-res Sintel (448x1024 input, N = 7168)
the f32 sim tensor is (B=2, h=4, 7168, 7168) = 1.6 GB, and the profiled
softmax fusion alone is ~135 ms — 46% of the whole denoise step
(PERF.md round-2 native-res profile).

This kernel computes the identical math blockwise with the standard
flash-attention recurrence — running row max ``m``, normalizer ``l`` and
rescaled accumulator ``acc`` carried in VMEM across k-blocks — so nothing
O(N^2) ever touches HBM:

    m'   = max(m, rowmax(s_blk))
    a    = exp(m - m')
    p    = exp(s_blk - m')
    l'   = l * a + rowsum(p)
    acc' = acc * a + p @ v_blk
    out  = acc / l            (after the last k-block)

Numerics match the XLA composition up to fp reassociation: s accumulates
in f32 on the MXU, the softmax runs in f32, and p is cast to the compute
dtype before the p @ v matmul exactly like the XLA path casts ``attn``
(the one rounding difference: XLA rounds exp/l, this rounds exp and
divides by l at the end — within bf16 tolerance, pinned by tests).

Dispatch: the Pallas kernel runs on TPU for N >= _FLASH_MIN_N; smaller N
(e.g. the 128^2 training config's N = 256, where sim is 256 KB and XLA's
fusion is already fine) and CPU use the XLA composition.  The backward is
the XLA composition's VJP via ``jax.custom_vjp`` — training shapes never
take the kernel path today, and gradients stay reference-exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# below this N the sim matrix is small enough that XLA's fused
# softmax beats a kernel launch (treat as tuning, not semantics)
_FLASH_MIN_N = 2048
_NEG_INF = -1e30


def _attention_middle_xla(q: Array, k: Array, v: Array) -> Array:
    """Reference composition (models/unet.py Attention): q pre-scaled,
    (B, N, h, d) operands, f32 sim/softmax, compute-dtype p @ v."""
    sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  block_k: int, n_total: int, cdt):
    """grid (B*h, nq, nk), k innermost; q/k/v blocks (1, block, d)."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = q_ref[0].astype(cdt)                     # (bq, d)
    kb_blk = k_ref[0].astype(cdt)                 # (bk, d)
    s = jax.lax.dot_general(
        qb, kb_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (bq, bk) f32
    # padded k rows must not enter the softmax
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_total, s, _NEG_INF)

    m_old = m_scr[:, :1]                           # (bq, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                 # (bq, 1)
    p = jnp.exp(s - m_new)                         # (bq, bk) f32
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(cdt), v_ref[0].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kb == nkb - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_middle_pallas(q: Array, k: Array, v: Array,
                         block_q: int = 1024, block_k: int = 1024) -> Array:
    # block sweep at N=7168 (native-res bottleneck): 1024/1024 = 2.73 ms,
    # 512/512 = 4.49, 512/1024 = 2.94; 2048/2048 exceeds VMEM (p is
    # (bq, bk) f32).  51x the XLA composition's 140 ms.
    """(B, N, h, d) -> (B, N, h, d); q pre-scaled by d^-0.5."""
    B, N, h, d = q.shape
    cdt = v.dtype

    def fold(a):  # (B, N, h, d) -> (B*h, N, d)
        return a.transpose(0, 2, 1, 3).reshape(B * h, N, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    bq = min(block_q, max(128, 1 << (N - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (N - 1).bit_length()))
    nq = -(-N // bq)
    nk = -(-N // bk)
    pad_q = nq * bq - N
    pad_k = nk * bk - N
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk, n_total=N, cdt=cdt),
        grid=(B * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * h, nq * bq, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(qf, kf, vf)

    out = out[:, :N]                               # (B*h, N, d)
    return out.reshape(B, h, N, d).transpose(0, 2, 1, 3)


def _use_flash(N: int) -> bool:
    if os.environ.get("OFD_FLASH_ATTN", "1") != "1":
        return False
    return N >= _FLASH_MIN_N and jax.devices()[0].platform != "cpu"


@jax.custom_vjp
def attention_middle(q: Array, k: Array, v: Array) -> Array:
    """softmax(q @ k^T) @ v over (B, N, heads, d); q pre-scaled by d^-0.5.

    Flash Pallas kernel on TPU for large N (the sim matrix never
    materializes); the exact XLA composition otherwise and for gradients.
    """
    if _use_flash(q.shape[1]):
        return _flash_middle_pallas(q, k, v)
    return _attention_middle_xla(q, k, v)


def _fwd(q, k, v):
    return attention_middle(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_attention_middle_xla, q, k, v)
    return vjp(g)


attention_middle.defvjp(_fwd, _bwd)

__all__ = ["attention_middle"]
