"""On-chip numerics pin for the Pallas conv kernels (VERDICT r3 #8).

tests/test_conv_pallas.py proves the kernels in interpret mode on CPU;
this module pins the REAL Mosaic lowering against XLA's conv at the
shape family the UNet actually runs at native Sintel resolution —
including odd channel counts like C=72 (the class of bug behind the
C2=72 Mosaic crash fixed in 781f6bb) and the fused affine+SiLU input
transform.  Method modeled on the reference's randomized kernel
equivalence test (reference warp_test.py:9-102).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflowdiffusion_tpu.ops import conv_pallas as cp


def _rand(rng, shape, dtype):
    return jnp.asarray(rng.standard_normal(shape), dtype)


# (B, H, W, Cin, Cout): the native-res family (448x1024 /2 /4 /8 stages)
# plus the headline 128^2 stage and odd-C regression shapes.
SHAPES = [
    (1, 448, 1024, 8, 64),     # native stem
    (2, 224, 512, 64, 64),     # native /2
    (2, 112, 256, 128, 128),   # native /4
    (2, 56, 128, 128, 128),    # native /8 (bottleneck-adjacent)
    (8, 128, 128, 64, 64),     # headline stage
    (2, 128, 128, 72, 72),     # odd-C: the C2=72 Mosaic crash family
    (2, 96, 160, 40, 72),      # odd-C in and out, non-square
]


def _tols(dtype):
    # bf16 MXU accumulation differences between two correct lowerings
    return dict(atol=5e-2, rtol=5e-2) if dtype == jnp.bfloat16 else dict(
        atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("shape", SHAPES, ids=lambda s: "x".join(map(str, s)))
def test_fold_matches_xla_on_chip(shape, dtype):
    B, H, W, Cin, Cout = shape
    rng = np.random.default_rng(42)
    x = _rand(rng, (B, H, W, Cin), dtype)
    k = _rand(rng, (3, 3, Cin, Cout), dtype) * 0.1

    if not cp._use_fold(x, k):
        pytest.skip("shape not fold-feasible (gate is allowed to refuse)")

    y_fold = jax.jit(
        lambda x, k: cp._conv_fold(
            x, k, compute_dtype=jnp.bfloat16 if dtype == jnp.bfloat16
            else jnp.float32)
    )(x, k)
    y_xla = jax.jit(cp._conv_xla)(x, k)
    np.testing.assert_allclose(
        np.asarray(y_fold, np.float32), np.asarray(y_xla, np.float32),
        **_tols(dtype))


@pytest.mark.parametrize("shape", [(2, 224, 512, 64, 64),
                                   (2, 128, 128, 72, 72)],
                         ids=lambda s: "x".join(map(str, s)))
def test_fold_gn_affine_matches_xla_on_chip(shape):
    """The fused in_affine(+SiLU) fold path — the Mosaic block-rule fix in
    781f6bb was exactly this path's affine vectors."""
    B, H, W, Cin, Cout = shape
    dtype = jnp.bfloat16
    rng = np.random.default_rng(7)
    x = _rand(rng, (B, H, W, Cin), dtype)
    k = _rand(rng, (3, 3, Cin, Cout), dtype) * 0.1
    a = jnp.asarray(rng.standard_normal((B, Cin)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, Cin)), jnp.float32)

    if not cp._use_fold(x, k):
        pytest.skip("shape not fold-feasible (gate is allowed to refuse)")

    y_fold = jax.jit(
        lambda x, k, a, b: cp._conv_fold(
            x, k, compute_dtype=jnp.bfloat16, in_scale=a, in_bias=b,
            silu=True)
    )(x, k, a, b)
    y_xla = jax.jit(cp._silu_affine_xla)(x, k, a, b)
    np.testing.assert_allclose(
        np.asarray(y_fold, np.float32), np.asarray(y_xla, np.float32),
        atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("shape", [(8, 128, 128, 64, 64),
                                   (2, 96, 160, 40, 72)],
                         ids=lambda s: "x".join(map(str, s)))
def test_v1_pallas_matches_xla_on_chip(shape):
    B, H, W, Cin, Cout = shape
    dtype = jnp.float32
    rng = np.random.default_rng(3)
    x = _rand(rng, (B, H, W, Cin), dtype)
    k = _rand(rng, (3, 3, Cin, Cout), dtype) * 0.1
    y_pl = jax.jit(lambda x, k: cp._conv_pallas(
        x, k, compute_dtype=jnp.float32))(x, k)
    y_xla = jax.jit(cp._conv_xla)(x, k)
    np.testing.assert_allclose(
        np.asarray(y_pl, np.float32), np.asarray(y_xla, np.float32),
        atol=1e-4, rtol=1e-4)


def test_default_dispatch_is_xla_on_chip(monkeypatch):
    """Round-4 dispatch contract: with no env override the conv lowering is
    XLA's (the measured end-to-end winner, VERDICT r3 #1) — pin it so a
    future kernel can only become default together with this test."""
    monkeypatch.delenv("OFD_CONV_BACKEND", raising=False)
    x = jnp.ones((2, 128, 128, 64), jnp.bfloat16)
    k = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
    hlo = jax.jit(cp.conv2d_same).lower(x, k).compile().as_text()
    assert "custom_call" not in hlo or "Mosaic" not in hlo, (
        "default conv dispatch lowered to a Pallas custom call; "
        "the round-4 default must be XLA conv")
