"""Fused multi-scale / multi-offset splat pyramid.

The reference FlowLearner's photometric loss launches one CUDA splat per
(level, offset_x, offset_y) — ~832 kernel launches per training step
(flow_learner.py:168-193, SURVEY.md §3.3).  Here each level's level^2 offset
phases are computed inside one XLA program with ``lax.map`` over a traced
offset array (same math, same frozen-gradient VJP, zero launch overhead),
and all levels share one jitted graph.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .splat import softsplat
from .warp import fill_holes_nan, nan_charbonnier

Array = jax.Array

# reference flow_learner.py:162
DEFAULT_LEVELS: Tuple[int, ...] = (1, 2, 4, 5, 7, 8, 10, 11, 14, 16)


def multi_offset_soft_splat(
    inp: Array, flow: Array, metric: Array, level: int
) -> Array:
    """All level^2 offset phases of the fused 'soft' splat at ``level``.

    Returns (level^2, B, H//level, W//level, C+1) — values normalized by the
    accumulated exp-metric with the raw weight channel appended (the
    reference's per-offset softsplat_new calls, flow_learner.py:184).
    """
    n = level * level
    ar = jnp.arange(n, dtype=jnp.float32)
    offs = jnp.stack([ar % level, ar // level], axis=1)
    # (n, 2) = (a, b) pairs: a = x offset, b = y offset

    def one(off):
        return softsplat(inp, flow, metric, "soft", level, (off[0], off[1]))

    if n == 1:
        return one(offs[0])[None]
    return jax.lax.map(one, offs)


def photometric_pyramid_loss(
    img: Array,
    tgt: Array,
    flow_pred: Array,
    warp_weights: Array,
    levels: Sequence[int] = DEFAULT_LEVELS,
) -> Array:
    """Multi-scale offset-averaged NaN-charbonnier photometric loss
    (reference flow_learner.py:159-206).

    For each level and each of its level^2 offsets: forward-splat ``img`` by
    ``flow_pred`` (soft mode, NaN holes where no mass lands), box-splat the
    target with zero flow, charbonnier over finite pairs; average over
    offsets then over levels.
    """
    zeros_flow = jnp.zeros_like(flow_pred)
    ones_w = jnp.ones_like(warp_weights)

    per_level = []
    for level in levels:
        warped_all = multi_offset_soft_splat(img, flow_pred, warp_weights, level)
        filled = fill_holes_nan(warped_all[..., :-1], warped_all[..., -1:])
        tgt_all = multi_offset_soft_splat(tgt, zeros_flow, ones_w, level)[..., :-1]
        # per-offset masked charbonnier means, then offset average
        losses = jax.vmap(nan_charbonnier)(tgt_all, filled)
        per_level.append(jnp.mean(losses))
    return jnp.mean(jnp.stack(per_level))


__all__ = ["multi_offset_soft_splat", "photometric_pyramid_loss", "DEFAULT_LEVELS"]
