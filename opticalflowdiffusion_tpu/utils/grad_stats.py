"""Shared gradient diagnostics.

The reference duplicates ``log_grad_norm_stat`` in four modules
(flow_diffuser.py:367-388, flow_learner.py:380-401, matrix_flow.py:649-672,
diffusion_animation.py:103-124); here it is one jit-safe function over the
gradient pytree, emitting the same metric keys.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def grad_norm_stats(grads, params) -> Dict[str, jnp.ndarray]:
    g_leaves = jax.tree_util.tree_leaves(grads)
    p_leaves = jax.tree_util.tree_leaves(params)
    norms = jnp.stack([jnp.linalg.norm(g.reshape(-1)) for g in g_leaves])
    pnorms = jnp.stack([jnp.linalg.norm(p.reshape(-1)) for p in p_leaves])
    gpr = norms / jnp.maximum(pnorms, 1e-12)
    return {
        "train/grad_norm/min": norms.min(),
        "train/grad_norm/max": norms.max(),
        "train/grad_norm/std": norms.std(),
        "train/grad_norm/mean": norms.mean(),
        "train/grad_norm/median": jnp.median(norms),
        "train/gpr/min": gpr.min(),
        "train/gpr/max": gpr.max(),
        "train/gpr/std": gpr.std(),
        "train/gpr/mean": gpr.mean(),
        "train/gpr/median": jnp.median(gpr),
    }


def tensor_stats(prefix: str, x) -> Dict[str, jnp.ndarray]:
    """The reference's per-tensor min/max/mean/std metric block
    (flow_diffuser.py:223-233)."""
    return {
        f"{prefix}_min": jnp.min(x),
        f"{prefix}_max": jnp.max(x),
        f"{prefix}_mean": jnp.mean(x),
        f"{prefix}_std": jnp.mean(jnp.std(x, axis=0)),
    }


__all__ = ["grad_norm_stats", "tensor_stats"]
