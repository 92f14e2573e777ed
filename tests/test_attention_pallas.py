"""Fused linear-attention kernel: XLA reference equivalence (interpret mode
on CPU) and the custom-VJP path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops import attention_pallas as ap
from jax.experimental.pallas import tpu as pltpu


def test_pallas_matches_xla_interpret(rng):
    # N=1000: non-multiple of block exercises padding.  atol must stay tiny
    # relative to the output scale (~1e-4 at this N): a 2e-4 atol once
    # masked a >100% relative error (cross-head ctx mixing).
    for B, N in ((2, 1000), (1, 200)):
        qkv = jnp.asarray(rng.standard_normal((B, N, 384)), jnp.float32)
        want = np.asarray(ap._linear_attention_middle_xla(qkv, 4, 32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                ap._linear_attention_middle_pallas(qkv, 4, 32, block_n=256)
            )
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3 * scale)


def _block_params(rng, C, hd=128):
    return (
        jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32),   # g_pre
        jnp.asarray(rng.standard_normal((C, 3 * hd)) / np.sqrt(C), jnp.float32),
        jnp.asarray(rng.standard_normal((hd, C)) / np.sqrt(hd), jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32),        # b_out
        jnp.asarray(rng.standard_normal(C) * 0.1 + 1.0, jnp.float32),   # g_post
    )


def test_fused_block_matches_xla_interpret(rng):
    """Whole pre-LN/qkv/middle/out/post-LN/residual block: Pallas pipeline
    == XLA composition (incl. N not a block multiple and C < 128)."""
    from opticalflowdiffusion_tpu.ops import attention_fused as af

    for B, N, C in ((2, 200, 64), (1, 256, 96)):
        x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        p = _block_params(rng, C)
        want = np.asarray(af._block_xla(x, *p, 4, 32, compute_dtype=jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            # f32 compute isolates kernel logic from bf16 operand rounding
            got = np.asarray(
                af._fused_block_pallas(
                    x, *p, 4, 32, block_n=128, compute_dtype=jnp.float32
                )[0]
            )
            got_bf16 = np.asarray(
                af._fused_block_pallas(x, *p, 4, 32, block_n=128)[0]
            )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
        # production bf16 operands: same result within bf16 rounding
        np.testing.assert_allclose(got_bf16, want, rtol=0.2, atol=0.15)


def test_fused_block_vjp_matches_xla_grad(rng):
    from opticalflowdiffusion_tpu.ops import attention_fused as af

    B, N, C = 1, 64, 32
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    p = _block_params(rng, C)

    def loss_custom(x, *p):
        return jnp.sum(jnp.square(af.fused_linear_attention_block(x, *p, 4, 32)))

    def loss_ref(x, *p):
        return jnp.sum(
            jnp.square(af._block_xla(x, *p, 4, 32, compute_dtype=x.dtype))
        )

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4, 5))(x, *p)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, *p)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_block_bwd_pallas_matches_xla_grad(rng):
    """The three-launch fused backward (interpret mode, f32 compute) ==
    jax.vjp of the XLA composition, for all six inputs.  N=200 exercises
    padded blocks in the backward; C=64 exercises C != lane width."""
    from opticalflowdiffusion_tpu.ops import attention_fused as af

    B, N, C = 2, 200, 64
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    p = _block_params(rng, C)
    dy = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: af._block_xla(*a, 4, 32, compute_dtype=jnp.float32), x, *p
    )
    want = vjp(dy)

    with pltpu.force_tpu_interpret_mode():
        _, (ctx, m, s) = af._fused_block_pallas(
            x, *p, 4, 32, block_n=128, compute_dtype=jnp.float32
        )
        got = af._fused_block_bwd_pallas(
            x, *p, ctx, m, s, dy, 4, 32, compute_dtype=jnp.float32
        )

    names = ("dx", "dg_pre", "dw_qkv", "dw_out", "db_out", "dg_post")
    for name, a, b in zip(names, got, want):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-4 * scale,
                                   err_msg=name)


def test_fused_block_bwd_wiring_cpu_fallback(rng):
    """On CPU the custom VJP must take the XLA-recompute path (extra=None)
    and still produce reference gradients through the public API."""
    from opticalflowdiffusion_tpu.ops import attention_fused as af

    B, N, C = 1, 48, 32
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    p = _block_params(rng, C)

    def loss(x, *p):
        return jnp.sum(jnp.square(af.fused_linear_attention_block(x, *p, 4, 32)))

    def loss_ref(x, *p):
        return jnp.sum(jnp.square(af._block_xla(x, *p, 4, 32,
                                                compute_dtype=x.dtype)))

    g1 = jax.grad(loss, argnums=tuple(range(6)))(x, *p)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(x, *p)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_custom_vjp_matches_xla_grad(rng):
    B, N = 1, 64
    qkv = jnp.asarray(rng.standard_normal((B, N, 384)), jnp.float32)

    def loss_custom(t):
        return jnp.sum(jnp.square(ap.linear_attention_middle(t, 4, 32)))

    def loss_ref(t):
        return jnp.sum(jnp.square(ap._linear_attention_middle_xla(t, 4, 32)))

    g1 = jax.grad(loss_custom)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-6)
