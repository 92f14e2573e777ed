"""Backward warp, scaling, NaN losses, and filter-op tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops import warp as W
from opticalflowdiffusion_tpu.ops import filters as F


def test_backward_warp_identity(rng):
    img = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    flow = jnp.zeros((2, 8, 8, 2))
    out, mask = W.warp_backward_flow(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mask), 1.0)


def test_backward_warp_integer_shift(rng):
    img = jnp.asarray(rng.random((1, 6, 6, 1)), jnp.float32)
    flow = jnp.full((1, 6, 6, 2), 0.0).at[..., 0].set(1.0)  # sample from x+1
    out, mask = W.warp_backward_flow(img, flow)
    np.testing.assert_allclose(
        np.asarray(out[0, :, :-1, 0]), np.asarray(img[0, :, 1:, 0]), atol=1e-6
    )
    assert np.asarray(mask)[0, :, -1].max() == 0  # right column invalid


def test_box_downsample(rng):
    img = jnp.asarray(rng.random((1, 4, 4, 2)), jnp.float32)
    got = W.box_downsample(img, 2)
    want = np.asarray(img).reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_nan_mse():
    a = jnp.asarray([[1.0, 2.0, jnp.nan, 4.0]])
    b = jnp.asarray([[1.5, jnp.nan, 3.0, 5.0]])
    got = float(W.nan_mse(a, b))
    assert got == pytest.approx((0.25 + 1.0) / 2)


def test_nan_charbonnier_matches_formula():
    a = jnp.asarray([[1.0, jnp.nan]])
    b = jnp.asarray([[2.0, 1.0]])
    got = float(W.nan_charbonnier(a, b))
    want = float(np.power(1.0 + 1e-6, 0.5))
    assert got == pytest.approx(want, rel=1e-6)


def test_fill_holes_nan():
    img = jnp.ones((1, 2, 2, 3))
    wts = jnp.asarray([[[[1.0], [0.0]], [[0.5], [0.0]]]])
    out = np.asarray(W.fill_holes_nan(img, wts))
    assert np.isnan(out[0, 0, 1]).all() and np.isnan(out[0, 1, 1]).all()
    assert np.isfinite(out[0, 0, 0]).all()


# ---------------------------------------------------------------------------
# filter ops
# ---------------------------------------------------------------------------

def test_unfold_matches_manual(rng):
    img = jnp.asarray(rng.random((1, 5, 5, 2)), jnp.float32)
    R = 3
    patches = np.asarray(F.unfold(img, R))
    padded = np.pad(np.asarray(img), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for y in range(5):
        for x in range(5):
            for i in range(R):
                for j in range(R):
                    np.testing.assert_allclose(
                        patches[0, y, x, i, j], padded[0, y + i, x + j],
                        rtol=1e-6,
                    )


def _identity_packed_filter(B, H, W, R, C=3):
    fil = np.zeros((B, H, W, R, R), np.float32)
    fil[:, :, :, R // 2, R // 2] = 1.0
    col = np.zeros((B, H, W, C), np.float32)
    colw = np.zeros((B, H, W, 1), np.float32)
    return jnp.asarray(np.concatenate(
        [fil.reshape(B, H, W, R * R), col, colw], axis=-1))


def test_filter_identity_warp(rng):
    img = jnp.asarray(rng.random((1, 6, 6, 3)), jnp.float32)
    packed = _identity_packed_filter(1, 6, 6, 3)
    out = F.warp_backward_filter(img, packed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_filter_shift_and_invert(rng):
    """A uniform one-tap shift filter: gather from the right neighbour.

    Its inverse must gather from the left neighbour (interior pixels)."""
    B, H, W, R = 1, 6, 6, 3
    img = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    fil = np.zeros((B, H, W, R, R), np.float32)
    fil[:, :, :, R // 2, R // 2 + 1] = 1.0  # tap at dx=+1
    packed = jnp.asarray(np.concatenate(
        [fil.reshape(B, H, W, R * R),
         np.zeros((B, H, W, 3), np.float32),
         np.zeros((B, H, W, 1), np.float32)], axis=-1))

    out = np.asarray(F.warp_backward_filter(img, packed))
    np.testing.assert_allclose(out[0, :, :-1], np.asarray(img)[0, :, 1:], atol=1e-6)

    inv = F.invert_filter(packed)
    out_inv = np.asarray(F.warp_backward_filter(img, inv))
    # interior: inverse gathers from the left neighbour
    np.testing.assert_allclose(
        out_inv[0, :, 2:-1], np.asarray(img)[0, :, 1:-2], atol=1e-6
    )


def test_filter_to_flow(rng):
    B, H, W, R = 1, 4, 4, 3
    fil = np.zeros((B, H, W, R, R), np.float32)
    fil[:, :, :, R // 2 + 1, R // 2] = 1.0  # tap at dy=+1, dx=0
    packed = jnp.asarray(np.concatenate(
        [fil.reshape(B, H, W, R * R),
         np.zeros((B, H, W, 3), np.float32),
         np.zeros((B, H, W, 1), np.float32)], axis=-1))
    flow = np.asarray(F.filter_to_flow(packed))
    np.testing.assert_allclose(flow[..., 0], 0.0, atol=1e-6)  # dx
    np.testing.assert_allclose(flow[..., 1], 1.0, atol=1e-6)  # dy


def test_bound_mask():
    m = np.asarray(F.bound_mask(3, 4, 4))
    assert m[0, 0, 0, 0] == 0  # top-left tap out of bounds
    assert m[0, 0, 1, 1] == 1
    assert m[2, 2].min() == 1  # interior all valid
