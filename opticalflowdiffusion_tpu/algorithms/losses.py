"""PWC unsupervised loss library (reference losses.py:3-66), NHWC."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.warp import charbonnier

Array = jnp.ndarray


def photometric_loss(ref, past_warped, future_warped, occ) -> Array:
    future = jnp.sum(occ[..., 0:1] * charbonnier(ref - future_warped))
    past = jnp.sum(occ[..., 1:2] * charbonnier(ref - past_warped))
    return future + past


def constant_velocity_loss(p_flow, f_flow) -> Array:
    return jnp.mean(charbonnier(p_flow + f_flow))


def edgeaware_smoothness1(image, flow, edge_weight: float = 20.0) -> Array:
    """Sum-reduced variant (losses.py:11-25; note the warp.py twin is
    mean-reduced)."""
    img_gy = image[:, 1:, :, :] - image[:, :-1, :, :]
    img_gx = image[:, :, 1:, :] - image[:, :, :-1, :]
    flo_gy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    flo_gx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    wy = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gy), axis=-1, keepdims=True))
    wx = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gx), axis=-1, keepdims=True))
    return jnp.sum(wx * charbonnier(flo_gx)) + jnp.sum(wy * charbonnier(flo_gy))


def occlusion_smoothness(image, occ, edge_weight: float = 20.0) -> Array:
    img_gy = image[:, 1:, :, :] - image[:, :-1, :, :]
    img_gx = image[:, :, 1:, :] - image[:, :, :-1, :]
    occ_gy = occ[:, 1:, :, :] - occ[:, :-1, :, :]
    occ_gx = occ[:, :, 1:, :] - occ[:, :, :-1, :]
    wy = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gy), axis=-1, keepdims=True))
    wx = jnp.exp(-edge_weight * jnp.mean(jnp.square(img_gx), axis=-1, keepdims=True))
    return jnp.sum(wx * jnp.square(occ_gx)) + jnp.sum(wy * jnp.square(occ_gy))


def occlusion_prior(occ) -> Array:
    return -1.0 * jnp.sum(occ[..., 0] * occ[..., 1])


def min_per_pixel_loss(ref, past_warped, future_warped) -> Array:
    return jnp.mean(
        jnp.minimum(charbonnier(ref - future_warped), charbonnier(ref - past_warped))
    )


def total_loss(ref, past_warped, future_warped, p_flow, f_flow, occ,
               smoothness_weight: float = 1.0,
               occ_weight: float = 1.0) -> Array:
    """losses.py:56-65.  Defaults are reference-exact; the weight knobs are
    a rebuild extension (PARITY.md) for the operating-point hunt — the
    reference's sum-reduced smoothness terms dominate the loss at full
    image size, which is the working hypothesis for PWCLearner's unusable
    full-image EPE (VERDICT r3/r4 weak: 1.337 vs 0.059 zero-flow)."""
    return (
        photometric_loss(ref, past_warped, future_warped, occ)
        + smoothness_weight * edgeaware_smoothness1(ref, p_flow)
        + smoothness_weight * edgeaware_smoothness1(ref, f_flow)
        + occ_weight * occlusion_smoothness(ref, occ)
        + occ_weight * 0.05 * occlusion_prior(occ)
    )


__all__ = [
    "photometric_loss", "constant_velocity_loss", "edgeaware_smoothness1",
    "occlusion_smoothness", "occlusion_prior", "min_per_pixel_loss", "total_loss",
]
