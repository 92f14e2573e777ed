"""Fused linear-attention kernel: XLA reference equivalence (interpret mode
on CPU) and the custom-VJP path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops import attention_pallas as ap
from jax.experimental.pallas import tpu as pltpu


def test_pallas_matches_xla_interpret(rng):
    B, N = 2, 1000  # non-multiple of block to exercise padding
    qkv = jnp.asarray(rng.standard_normal((B, N, 384)), jnp.float32)
    want = np.asarray(ap._linear_attention_middle_xla(qkv, 4, 32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ap._linear_attention_middle_pallas(qkv, 4, 32, block_n=256))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


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
