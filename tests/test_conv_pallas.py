"""Pallas stride-1 conv kernel == lax.conv (interpret mode on CPU), and the
Conv/WSConv drop-ins preserve param paths + numerics + gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from opticalflowdiffusion_tpu.ops import conv_pallas as cp


def _xla(x, k):
    return cp._conv_xla(x, k)


@pytest.mark.parametrize(
    "B,H,W,C,Cout,kh,kw",
    [
        (2, 16, 32, 64, 64, 3, 3),
        (1, 8, 16, 9, 64, 7, 7),
        (2, 8, 16, 128, 128, 3, 3),
        (1, 32, 16, 3, 8, 5, 5),
    ],
)
def test_pallas_conv_matches_xla_interpret(rng, B, H, W, C, Cout, kh, kw):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, C, Cout)) * 0.1, jnp.float32)
    want = np.asarray(_xla(x, k))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cp._conv_pallas(x, k, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_conv_bf16_interpret(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    want = np.asarray(
        _xla(x, k.astype(jnp.bfloat16)).astype(jnp.float32)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            cp._conv_pallas(x, k.astype(jnp.bfloat16)).astype(jnp.float32)
        )
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)


@pytest.mark.parametrize(
    "B,H,W,C,Cout,kh,kw",
    [
        (2, 16, 32, 64, 64, 3, 3),    # F=2 fold
        (1, 8, 16, 9, 64, 7, 7),      # stem: F=4 fold, 7x7
        (2, 8, 16, 128, 128, 3, 3),   # F=1 (direct, full tiles)
        (1, 32, 16, 3, 8, 5, 5),
        (1, 8, 24, 64, 128, 3, 3),    # W2p alignment padding path
        (1, 6, 32, 16, 16, 3, 3),     # H with BH=2 slabs
    ],
)
def test_fold_conv_matches_xla_interpret(rng, B, H, W, C, Cout, kh, kw):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, C, Cout)) * 0.1, jnp.float32)
    want = np.asarray(_xla(x, k))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cp._conv_fold(x, k, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "B,H,W,C,Cout",
    [
        (2, 16, 32, 64, 64),   # F=2 -> W2=16, nopad fast path
        (1, 8, 24, 16, 32),    # W2 not a sublane multiple -> padded path
        (2, 6, 16, 128, 64),   # F=1 nopad
    ],
)
def test_fold_conv_affine_matches_reference_interpret(rng, B, H, W, C, Cout):
    """In-kernel silu(x*a+b) + conv == XLA silu-affine + lax.conv."""
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.standard_normal((B, C)) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, C)) * 0.3, jnp.float32)
    want = np.asarray(cp._silu_affine_xla(x, k, a, b))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(cp._conv_fold(
            x, k, compute_dtype=jnp.float32, in_scale=a, in_bias=b,
            silu=True,
        ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_gn_gradients_match_composition(rng):
    """_conv_same_gn custom VJP == jax.grad of the unfused composition."""
    B, H, W, C, Cout = 1, 8, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.standard_normal((B, C)) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, C)) * 0.3, jnp.float32)

    def loss_ours(x, k, a, b):
        return jnp.sum(jnp.square(cp._conv_same_gn(x, k, a, b)))

    def loss_ref(x, k, a, b):
        return jnp.sum(jnp.square(cp._silu_affine_xla(x, k, a, b)))

    g1 = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(x, k, a, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k, a, b)
    for got, want in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_fold_matrices_reconstruct_taps(rng):
    """Every original tap appears exactly once in the folded matrices and
    all other blocks are zero (FLOP accounting of the fold)."""
    kh, kw, C, Co = 3, 3, 4, 5
    k = jnp.asarray(rng.standard_normal((kh, kw, C, Co)), jnp.float32)
    F, t0, t1 = 2, -1, 1
    M = np.asarray(cp._fold_matrices(k, F, t0, t1))
    kn = np.asarray(k)
    seen = np.zeros((kh, kw), int)
    for dy in range(kh):
        for ti, t in enumerate(range(t0, t1 + 1)):
            for a in range(F):
                for b in range(F):
                    blk = M[dy, ti, a * C:(a + 1) * C, b * Co:(b + 1) * Co]
                    dx = t * F + a - b + kw // 2
                    if 0 <= dx < kw:
                        np.testing.assert_array_equal(blk, kn[dy, dx])
                        seen[dy, dx] += 1
                    else:
                        assert not blk.any()
    # each (dy, dx) tap covered once per output slot b
    assert (seen == F).all()


@pytest.mark.parametrize("route", ["dot", "xla"])
def test_conv2d_same_1x1_routes_match_xla(rng, route, monkeypatch):
    """Both 1x1 routings (default XLA conv; opt-in reshaped dot) agree with
    the lax reference, including the fused in_affine (SiLU(x*a+b)) variant.
    Round-4 default is the XLA conv (see conv2d_same's routing comment);
    OFD_1X1=dot keeps the fold-pipeline form correct."""
    monkeypatch.setenv("OFD_1X1", route)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 16, 32)) * 0.1, jnp.float32)
    got = np.asarray(cp.conv2d_same(x, k))
    want = np.asarray(_xla(x, k))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    a = jnp.asarray(rng.standard_normal((2, 16)) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 16)) * 0.1, jnp.float32)
    got_aff = np.asarray(cp.conv2d_same(x, k, in_affine=(a, b)))
    z = jax.nn.silu(x * a[:, None, None, :] + b[:, None, None, :])
    want_aff = np.asarray(_xla(z, k))
    np.testing.assert_allclose(got_aff, want_aff, rtol=1e-5, atol=1e-5)


def test_conv2d_same_gradients_match_xla(rng):
    """custom_vjp backward (XLA transposed conv) == jax.grad of lax conv."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)

    def loss_ours(x, k):
        return jnp.sum(jnp.square(cp.conv2d_same(x, k)))

    def loss_ref(x, k):
        return jnp.sum(jnp.square(_xla(x, k)))

    gx1, gk1 = jax.grad(loss_ours, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-5, atol=1e-5)


def test_unet_conv_module_param_paths(rng):
    """models/unet.Conv keeps the flax nn.Conv param contract: names
    kernel/bias, HWIO shapes, identical forward on the XLA path."""
    from flax import linen as fnn

    from opticalflowdiffusion_tpu.models.unet import Conv

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)
    mine = Conv(12, (3, 3))
    p = mine.init(jax.random.PRNGKey(0), x)["params"]
    assert set(p) == {"kernel", "bias"}
    assert p["kernel"].shape == (3, 3, 6, 12)
    ref = fnn.Conv(12, (3, 3))
    want = np.asarray(ref.apply({"params": p}, x))
    got = np.asarray(mine.apply({"params": p}, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
