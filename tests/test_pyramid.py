"""Phase-interleaved multi-offset splat == per-offset lax.map composition.

The fast path (ops/pyramid.py phase decomposition) must reproduce the
reference's per-offset fused splats exactly — values AND the quirky
frozen-gradient custom VJP — including levels that don't divide the image
size (partial edge bands exercise the edge/neg transform branches).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops import pyramid as pyr


def _mixed_flow(rng, B, H, W):
    """warp_test.py:38-43 flow distribution: half integer, half fractional."""
    sel = rng.random((B, H, W, 2)) < 0.5
    f_int = np.round(4 * rng.random((B, H, W, 2)) - 2.0)
    f_frac = 4 * rng.random((B, H, W, 2)) - 2.0
    flow = np.where(sel, f_int, f_frac).astype(np.float32)
    flow[0, 0, 0] = np.nan  # NaN guard must drop, both paths
    return flow


@pytest.mark.parametrize("level", [2, 4, 5])
def test_phase_splat_matches_map(rng, level):
    B, H, W, C = 2, 16, 16, 3
    inp = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    metric = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    flow = jnp.asarray(_mixed_flow(rng, B, H, W))

    fast = np.asarray(pyr.multi_offset_soft_splat(inp, flow, metric, level))
    os.environ["OFD_PYRAMID"] = "map"
    try:
        ref = np.asarray(pyr.multi_offset_soft_splat(inp, flow, metric, level))
    finally:
        del os.environ["OFD_PYRAMID"]
    assert fast.shape == ref.shape == (level * level, B, H // level,
                                       W // level, C + 1)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("level", [2, 5])
def test_phase_splat_grads_match_map(rng, level):
    """The custom VJP (reference ingrad/flowgrad incl. quirks, summed over
    offsets) must equal the per-offset path's gradients for inp, flow AND
    metric on a nan_charbonnier-style probe."""
    B, H, W, C = 1, 16, 16, 2
    inp = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    metric = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    flow = jnp.asarray(_mixed_flow(rng, B, H, W))
    probe = jnp.asarray(
        rng.standard_normal((level * level, B, H // level, W // level, C + 1)),
        jnp.float32,
    )

    def loss(inp, flow, metric):
        out = pyr.multi_offset_soft_splat(inp, flow, metric, level)
        return jnp.sum(jnp.where(jnp.isfinite(out), out * probe, 0.0))

    g_fast = jax.grad(loss, argnums=(0, 1, 2))(inp, flow, metric)
    os.environ["OFD_PYRAMID"] = "map"
    try:
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(inp, flow, metric)
    finally:
        del os.environ["OFD_PYRAMID"]
    for name, a, b in zip(("d_inp", "d_flow", "d_metric"), g_fast, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * scale,
                                   err_msg=name)


@pytest.mark.slow
def test_pyramid_loss_matches_map_path(rng):
    """End-to-end photometric_pyramid_loss value + grads, fast vs map."""
    B, H, W = 1, 16, 16
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    flow = jnp.asarray(_mixed_flow(rng, B, H, W))
    w = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    levels = (1, 2, 4, 5)

    def loss(flow, w):
        return pyr.photometric_pyramid_loss(img, tgt, flow, w, levels)

    v_fast = float(loss(flow, w))
    g_fast = jax.grad(loss, argnums=(0, 1))(flow, w)
    os.environ["OFD_PYRAMID"] = "map"
    try:
        v_ref = float(loss(flow, w))
        g_ref = jax.grad(loss, argnums=(0, 1))(flow, w)
    finally:
        del os.environ["OFD_PYRAMID"]
    np.testing.assert_allclose(v_fast, v_ref, rtol=1e-5)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
