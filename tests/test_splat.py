"""Splat kernel tests: oracle equivalence (values + both VJPs) and the
reference's randomized fused-downsample consistency test (warp_test.py:9-102).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops.splat import splat_raw, softsplat
from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow, box_downsample

import oracle_splat


def _rand_flow(rng, B, H, W, frac_int=0.5, mag=2.0):
    """warp_test.py:38-43 mixed integer/fractional flow distribution."""
    sel = rng.random((B, H, W, 2))
    f_int = np.round(rng.random((B, H, W, 2)) * 2 * mag - mag)
    f_frac = rng.random((B, H, W, 2)) * 2 * mag - mag
    return np.where(sel < frac_int, f_int, f_frac).astype(np.float32)


@pytest.mark.parametrize("scale,offset", [(1, (0, 0)), (2, (0, 1)), (4, (3, 2))])
def test_forward_matches_oracle(rng, scale, offset):
    B, H, W, C = 2, 8, 8, 3
    inp = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = _rand_flow(rng, B, H, W)
    got = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow), scale, *offset))
    want = oracle_splat.splat_forward(inp, flow, scale, *offset)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale,offset", [(1, (0, 0)), (2, (1, 0))])
def test_vjp_matches_oracle(rng, scale, offset):
    B, H, W, C = 1, 6, 6, 2
    inp = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = _rand_flow(rng, B, H, W)
    g = rng.standard_normal((B, H // scale, W // scale, C)).astype(np.float32)

    def f(i, fl):
        return splat_raw(i, fl, scale, *offset)

    _, vjp = jax.vjp(f, jnp.asarray(inp), jnp.asarray(flow))
    d_inp, d_flow = vjp(jnp.asarray(g))

    np.testing.assert_allclose(
        np.asarray(d_inp),
        oracle_splat.splat_ingrad(inp, flow, g, scale, *offset),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(d_flow),
        oracle_splat.splat_flowgrad(inp, flow, g, scale, *offset),
        rtol=1e-4, atol=1e-5,
    )


def test_nan_flow_is_dropped(rng):
    B, H, W, C = 1, 4, 4, 1
    inp = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = np.zeros((B, H, W, 2), np.float32)
    flow[0, 1, 1] = np.nan
    out = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow)))
    assert np.isfinite(out).all()
    # pixel (1,1) contributes nothing
    expect = inp.copy()
    expect[0, 1, 1] = 0.0
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_identity_splat(rng):
    inp = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    flow = np.zeros((2, 8, 8, 2), np.float32)
    out = np.asarray(splat_raw(jnp.asarray(inp), jnp.asarray(flow)))
    np.testing.assert_allclose(out, inp, atol=1e-6)


@pytest.mark.parametrize("level", [2, 4])
def test_fused_downsample_consistency(rng, level):
    """Port of warp_test.py:50-101: fused scale/offset splat equals
    splat-then-box-downsample via a zero-flow scaled splat, in values."""
    B, H, W, C = 1, 16, 16, 1
    for trial in range(20):
        src = rng.random((B, H, W, C)).astype(np.float32)
        flow = _rand_flow(rng, B, H, W)
        a = int(rng.integers(level))
        b = int(rng.integers(level))

        method_a = warp_forward_flow(
            jnp.asarray(src), jnp.asarray(flow),
            scale=level, set_nans=False, offset=[a, b],
        ) / (level ** 2)

        high = warp_forward_flow(
            jnp.asarray(src), jnp.asarray(flow), scale=1, set_nans=True
        )
        method_b = warp_forward_flow(
            high, jnp.zeros_like(jnp.asarray(flow)),
            scale=level, set_nans=False, offset=[a, b],
        ) / (level ** 2)

        ga = np.asarray(method_a)
        gb = np.asarray(method_b)
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)


def test_softsplat_modes(rng):
    B, H, W, C = 1, 8, 8, 3
    inp = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = jnp.zeros((B, H, W, 2))
    metric = jnp.ones((B, H, W, 1))

    out_sum = softsplat(inp, flow, None, "sum")
    np.testing.assert_allclose(np.asarray(out_sum), np.asarray(inp), atol=1e-6)

    out_avg = softsplat(inp, flow, None, "avg")
    assert out_avg.shape == (B, H, W, C + 1)
    np.testing.assert_allclose(
        np.asarray(out_avg[..., :-1]), np.asarray(inp), rtol=1e-4, atol=1e-4
    )

    out_soft = softsplat(inp, flow, metric, "soft")
    np.testing.assert_allclose(
        np.asarray(out_soft[..., :-1]), np.asarray(inp), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_soft[..., -1]), np.full((B, H, W), np.e), rtol=1e-4
    )

    out_lu = softsplat(inp, flow, metric, "linear_unn")
    np.testing.assert_allclose(
        np.asarray(out_lu[..., :-1]), np.asarray(inp), atol=1e-6
    )


def test_splat_grad_flows_through_training_path(rng):
    """End-to-end: gradient w.r.t. flow through a photometric loss is finite
    and nonzero (the FlowLearner training path)."""
    B, H, W, C = 1, 8, 8, 3
    src = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    tgt = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow0 = jnp.asarray(rng.random((B, H, W, 2)) * 0.5, jnp.float32)

    def loss(flow):
        warped = warp_forward_flow(src, flow, set_nans=False)
        return jnp.mean(jnp.square(warped - tgt))

    g = jax.grad(loss)(flow0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
