"""Denoising UNet backbone, flax.linen, NHWC.

TPU-native rebuild of the reference's lucidrains-style UNet
(reference: algorithms/diffusion_animation/denoising_diffusion.py:81-417):
weight-standardized 3x3 convs + GroupNorm blocks with time scale/shift,
linear attention at every resolution, quadratic attention at the bottleneck,
sinusoidal (or random/learned) time embedding, pixel-unshuffle downsample and
nearest-upsample, optional ``time_in=False`` for pure image-to-image use and
``external_cond`` channel concatenation.

Compute dtype is configurable (bf16 on TPU); params and normalization
statistics stay fp32.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class Conv(nn.Module):
    """Drop-in stride-1 'same' conv over ops/conv_pallas.conv2d_same.

    Same class name, param names (kernel/bias) and init as flax ``nn.Conv``
    so the auto-generated ``Conv_N`` checkpoint paths and the torch-import
    mapping (utils/import_torch_ckpt.py) are unchanged — only the lowering
    differs: the Pallas row-slab kernel on TPU at qualifying shapes, a
    reshaped dot for 1x1, XLA conv otherwise (measured rationale in
    ops/conv_pallas.py).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    padding: object = "SAME"  # accepted for signature-compat; always same
    use_bias: bool = True
    kernel_init: object = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.conv_pallas import conv2d_same

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        y = conv2d_same(x.astype(self.dtype), kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class WSConv(nn.Module):
    """Weight-standardized conv (reference denoising_diffusion.py:101-114)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, in_affine=None) -> Array:
        from ..ops.conv_pallas import conv2d_same

        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        eps = 1e-5
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)
        y = conv2d_same(x.astype(self.dtype), kernel.astype(self.dtype),
                        in_affine=in_affine)
        return y + bias.astype(self.dtype)


class ChanLayerNorm(nn.Module):
    """Bias-free channel LayerNorm (reference denoising_diffusion.py:116-125)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * g
        return out.astype(self.dtype)


class GroupNorm(nn.Module):
    """Drop-in fused GroupNorm (same params/math as flax nn.GroupNorm with
    fast variance, f32 reductions; class name keeps the ``GroupNorm_N``
    checkpoint path).  epsilon defaults to 1e-5 = torch nn.GroupNorm's
    default — the reference Block uses it (denoising_diffusion.py:174), and
    the weight-transplant equivalence test (tests/test_reference_equivalence)
    pins bit-level agreement against the torch module.

    Written so the f32 convert lives only inside the reduction fusions
    (stats accumulate in f32 straight from bf16) and the normalize is one
    x * a + b elementwise expression with per-channel a, b that XLA folds
    together with the Block's time scale/shift + SiLU.  Measured parity
    with the flax module on TPU (the flax path was already fusing its
    f32 convert; this form simply guarantees the one-pass affine shape
    and removes the module-boundary convert round-trip).
    """

    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, return_affine: bool = False):
        C = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        B = x.shape[0]
        xg = x.reshape(B, -1, g, C // g)
        x32 = xg.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(1, 3))                     # (B, g)
        mu2 = jnp.mean(jnp.square(x32), axis=(1, 3))
        var = mu2 - jnp.square(mu)                          # fast variance
        rstd = jax.lax.rsqrt(var + self.epsilon)            # (B, g)
        # per-(batch, channel) affine: out = x * a + b
        sc = scale.reshape(g, C // g)
        bi = bias.reshape(g, C // g)
        a = (rstd[..., None] * sc).reshape(B, C)
        b = (bi - (mu * rstd)[..., None] * sc).reshape(B, C)
        if return_affine:
            return a, b
        return x.astype(jnp.float32) * a[:, None, None] + b[:, None, None]


class Block(nn.Module):
    """WSConv -> GroupNorm -> (scale, shift) -> SiLU (reference :172-188).

    Two fusion hooks keep the norm/act between consecutive convs out of HBM
    (the step is memory-bound at native res): ``defer_norm=True`` returns
    the raw conv output plus the per-(batch, channel) affine that the
    GroupNorm + time scale/shift reduce to, and ``in_affine`` feeds such an
    affine (+SiLU) into THIS block's conv slab load (ops/conv_pallas).
    Param paths (WSConv_0/GroupNorm_0) and math are unchanged.
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array,
                 scale_shift: Optional[Tuple[Array, Array]] = None,
                 in_affine: Optional[Tuple[Array, Array]] = None,
                 defer_norm: bool = False):
        h = WSConv(self.dim_out, (3, 3), dtype=self.dtype)(
            x, in_affine=in_affine
        )
        gn = GroupNorm(num_groups=self.groups)
        if defer_norm:
            a, b = gn(h, return_affine=True)
            if scale_shift is not None:
                s, t = scale_shift
                s32 = s.reshape(s.shape[0], -1).astype(jnp.float32) + 1.0
                t32 = t.reshape(t.shape[0], -1).astype(jnp.float32)
                a, b = a * s32, b * s32 + t32
            return h, a, b
        h = gn(h).astype(self.dtype)
        if scale_shift is not None:
            s, b = scale_shift
            h = h * (s + 1.0) + b
        return nn.silu(h)


class ResnetBlock(nn.Module):
    """Two blocks + time scale/shift + 1x1 residual (reference :190-214).

    Block1's norm/scale-shift/SiLU rides inside Block2's conv (see Block);
    Block2's own norm+SiLU fuses with the residual add in XLA.
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, time_emb: Optional[Array] = None) -> Array:
        scale_shift = None
        if time_emb is not None:
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
            t = t[:, None, None, :]
            scale_shift = jnp.split(t, 2, axis=-1)
        # Defer-norm fusion (Block1's GN/scale-shift/SiLU folded into
        # Block2's conv input) exists for the Pallas fold pipeline, where it
        # rides the conv slab load.  Under the default XLA lowering it is a
        # measured LOSS (debug/probe_ab.py: 124.5-135.6 vs 138.7 steps/s
        # headline, 0.265 vs 0.273 f/s native) — the explicit f32 affine
        # materializes what XLA's own GN->SiLU->conv fusion kept fused — so
        # it defaults on only when the fold backend is forced.
        fold_on = os.environ.get("OFD_CONV_BACKEND") in ("fold", "pallas")
        fuse = os.environ.get("OFD_FUSE_GN", "1" if fold_on else "0") == "1"
        if not fuse:
            h = Block(self.dim_out, dtype=self.dtype)(x, scale_shift)
            h = Block(self.dim_out, dtype=self.dtype)(h)
        else:
            h, a, b = Block(self.dim_out, dtype=self.dtype)(
                x, scale_shift, defer_norm=True
            )
            h = Block(self.dim_out, dtype=self.dtype)(h, in_affine=(a, b))
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)
        return h + x


class LinearAttention(nn.Module):
    """O(N) kernel-feature attention (reference :216-244).

    The softmax/context/out middle dispatches through
    ops/attention_pallas.linear_attention_middle: the XLA formulation by
    default, or the fused two-pass Pallas kernel with
    ``OFD_ATTN_BACKEND=pallas`` (bit-matching to ~1e-6; see module docs).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.attention_pallas import linear_attention_middle

        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = linear_attention_middle(
            qkv.reshape(B, H * W, 3 * hidden), self.heads, self.dim_head
        )
        out = out.reshape(B, H, W, hidden).astype(self.dtype)
        out = Conv(C, (1, 1), dtype=self.dtype)(out)
        return ChanLayerNorm(dtype=self.dtype)(out)


class Attention(nn.Module):
    """Quadratic attention at the bottleneck (reference :246-268).

    The sim/softmax/out middle dispatches through
    ops/flash_attention.attention_middle: at large N a flash Pallas kernel
    (online softmax, the O(N^2) sim matrix never leaves VMEM); the exact
    XLA composition otherwise.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.flash_attention import attention_middle

        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q * (self.dim_head ** -0.5)
        out = attention_middle(q, k, v)
        out = out.reshape(B, H, W, hidden)
        return Conv(C, (1, 1), dtype=self.dtype)(out)


class PreNormResidual(nn.Module):
    inner: nn.Module
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return self.inner(ChanLayerNorm(dtype=self.dtype)(x)) + x


class LinearAttentionBlock(nn.Module):
    """PreNormResidual(LinearAttention) as ONE fused op.

    Owns the whole block's params (pre-LN gain, qkv/out 1x1 convs as
    matrices, post-LN gain) and dispatches to the 2-launch Pallas pipeline
    (ops/attention_fused.py) on TPU — intermediates never leave VMEM — or
    the identical XLA composition elsewhere.  Replaces the reference's
    Residual(PreNorm(LinearAttention)) stacking (denoising_diffusion.py:
    216-244, 338-353).
    """

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.attention_fused import fused_linear_attention_block

        B, H, W, C = x.shape
        hd = self.heads * self.dim_head
        g_pre = self.param("prenorm_g", nn.initializers.ones, (C,), jnp.float32)
        w_qkv = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * hd), jnp.float32
        )
        w_out = self.param(
            "out_kernel", nn.initializers.lecun_normal(), (hd, C), jnp.float32
        )
        b_out = self.param("out_bias", nn.initializers.zeros, (C,), jnp.float32)
        g_post = self.param("postnorm_g", nn.initializers.ones, (C,), jnp.float32)
        y = fused_linear_attention_block(
            x.reshape(B, H * W, C), g_pre, w_qkv, w_out, b_out, g_post,
            self.heads, self.dim_head,
        )
        return y.reshape(B, H, W, C).astype(self.dtype)


def sinusoidal_pos_emb(t: Array, dim: int) -> Array:
    """Reference denoising_diffusion.py:139-151."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Reference denoising_diffusion.py:153-168."""

    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,), jnp.float32)
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        freqs = t.astype(jnp.float32)[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate(
            [t.astype(jnp.float32)[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1
        )


class Downsample(nn.Module):
    """Pixel-unshuffle + 1x1 conv (reference :95-99)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        return Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest-upsample + 3x3 conv (reference :89-93)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        # nearest-neighbor 2x as ONE broadcast+reshape: the chained
        # jnp.repeat form materialized two full-res intermediates per
        # Upsample (measured in the native-res HLO byte map,
        # debug/hlo_bytes.py); this form is bit-identical and one pass
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (B, H, 2, W, 2, C)
        ).reshape(B, 2 * H, 2 * W, C)
        return Conv(self.dim_out, (3, 3), dtype=self.dtype)(x)


class Unet(nn.Module):
    """The reference Unet (denoising_diffusion.py:272-417), NHWC.

    Args mirror the reference constructor; ``channels`` counts the full input
    (x plus any concatenated external conditioning).
    """

    dim: int
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    time_in: bool = True
    zero_init_final: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        external_cond: Optional[Array] = None,
        time: Optional[Array] = None,
        x_self_cond: Optional[Array] = None,
    ) -> Array:
        if external_cond is not None:
            x = jnp.concatenate([x, external_cond], axis=-1)
        if self.self_condition:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = jnp.concatenate([x_self_cond, x], axis=-1)

        init_dim = self.init_dim or self.dim
        x = Conv(init_dim, (7, 7), padding=3, dtype=self.dtype)(
            x.astype(self.dtype)
        )
        r = x

        if self.time_in:
            if time is None:
                raise ValueError("when Unet takes time arg, time must be passed in")
            time_dim = self.dim * 4
            if self.learned_sinusoidal_cond or self.random_fourier_features:
                emb = RandomOrLearnedSinusoidalPosEmb(
                    self.learned_sinusoidal_dim, self.random_fourier_features
                )(time)
            else:
                emb = sinusoidal_pos_emb(time, self.dim)
            t = nn.Dense(time_dim, dtype=self.dtype)(emb.astype(self.dtype))
            # exact (erf) GELU: torch nn.GELU's default (reference :316); the
            # flax default is the tanh approximation, ~1e-3 off
            t = nn.Dense(time_dim, dtype=self.dtype)(nn.gelu(t, approximate=False))
        else:
            if time is not None:
                raise ValueError("this Unet does not take time arg")
            t = None

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_res - 1
            x = ResnetBlock(dim_in, self.resnet_block_groups, self.dtype)(x, t)
            hs.append(x)
            x = ResnetBlock(dim_in, self.resnet_block_groups, self.dtype)(x, t)
            x = LinearAttentionBlock(dtype=self.dtype)(x)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype)(x)
            else:
                x = Conv(dim_out, (3, 3), dtype=self.dtype)(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, self.resnet_block_groups, self.dtype)(x, t)
        x = PreNormResidual(Attention(dtype=self.dtype), dtype=self.dtype)(x)
        x = ResnetBlock(mid_dim, self.resnet_block_groups, self.dtype)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, self.resnet_block_groups, self.dtype)(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, self.resnet_block_groups, self.dtype)(x, t)
            x = LinearAttentionBlock(dtype=self.dtype)(x)
            if not is_last:
                x = Upsample(dim_in, dtype=self.dtype)(x)
            else:
                x = Conv(dim_in, (3, 3), dtype=self.dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, self.resnet_block_groups, self.dtype)(x, t)

        out_dim = self.out_dim or (self.channels * (2 if self.learned_variance else 1))
        kernel_init = (
            nn.initializers.zeros if self.zero_init_final else nn.initializers.lecun_normal()
        )
        x = Conv(out_dim, (1, 1), dtype=self.dtype, kernel_init=kernel_init)(x)
        return x.astype(jnp.float32)


__all__ = [
    "Unet", "WSConv", "Block", "ResnetBlock", "LinearAttention", "Attention",
    "ChanLayerNorm", "PreNormResidual", "LinearAttentionBlock",
    "Downsample", "Upsample",
    "sinusoidal_pos_emb", "RandomOrLearnedSinusoidalPosEmb",
]
