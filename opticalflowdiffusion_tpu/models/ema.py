"""Exponential moving average of parameters (ema_pytorch equivalent used by
the reference's standalone Trainer, denoising_diffusion.py:1068-1070)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class EmaState(struct.PyTreeNode):
    params: Any
    step: jax.Array

    @classmethod
    def create(cls, params):
        return cls(params=params, step=jnp.zeros((), jnp.int32))


def ema_update(
    ema: EmaState,
    params,
    decay: float = 0.995,
    update_every: int = 10,
    update_after_step: int = 100,
) -> EmaState:
    """ema_pytorch semantics: copy params before ``update_after_step``,
    decayed average every ``update_every`` steps after."""
    step = ema.step + 1
    do_update = (step % update_every) == 0
    warm = step <= update_after_step

    def blend(e, p):
        upd = jnp.where(warm, p, e * decay + p * (1.0 - decay))
        return jnp.where(do_update, upd, e)

    new_params = jax.tree_util.tree_map(blend, ema.params, params)
    return ema.replace(params=new_params, step=step)


__all__ = ["EmaState", "ema_update"]
