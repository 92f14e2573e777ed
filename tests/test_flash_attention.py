"""Flash bottleneck attention: Pallas kernel == XLA composition (interpret
mode on CPU), padding behavior, and the custom-VJP gradient path."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from opticalflowdiffusion_tpu.ops import flash_attention as fa


def _qkv(rng, B, N, h, d, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype) * (d ** -0.5)
    k = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, h, d)), dtype)
    return q, k, v


def test_flash_matches_xla_interpret(rng):
    # N=700: not a block multiple — exercises both q and k padding
    for B, N in ((2, 700), (1, 256)):
        q, k, v = _qkv(rng, B, N, 4, 32)
        want = np.asarray(fa._attention_middle_xla(q, k, v))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                fa._flash_middle_pallas(q, k, v, block_q=256, block_k=128)
            )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_flash_matches_xla_bf16(rng):
    """Production operand dtype: within bf16 rounding of the XLA path."""
    q, k, v = _qkv(rng, 1, 300, 4, 32, jnp.bfloat16)
    want = np.asarray(fa._attention_middle_xla(q, k, v), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fa._flash_middle_pallas(q, k, v, block_q=128, block_k=128),
            np.float32,
        )
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)


def test_attention_middle_grad_is_xla_vjp(rng):
    """custom_vjp backward == jax.vjp of the plain composition."""
    q, k, v = _qkv(rng, 1, 64, 2, 8)

    def loss_custom(q, k, v):
        return jnp.sum(fa.attention_middle(q, k, v) ** 2)

    def loss_plain(q, k, v):
        return jnp.sum(fa._attention_middle_xla(q, k, v) ** 2)

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2))(q, k, v)
    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for gc, gp in zip(g_custom, g_plain):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp),
                                   rtol=1e-5, atol=1e-6)


def test_dispatch_gate_cpu(rng, monkeypatch):
    """On CPU the dispatcher must stay on the XLA path regardless of N."""
    monkeypatch.setenv("OFD_FLASH_ATTN", "1")
    q, k, v = _qkv(rng, 1, 4096, 1, 8)
    want = np.asarray(fa._attention_middle_xla(q, k, v))
    got = np.asarray(fa.attention_middle(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
