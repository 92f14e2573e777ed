"""pjit training-step builders: DP over the mesh, XLA-inserted collectives.

The reference's training runtime is Lightning's fit loop with DDP gradient
all-reduce (exp_base.py:193-214).  Here a single jitted step carries
params (replicated), batch (sharded over the ``data`` axis) and optimizer
state; XLA lowers the implied gradient reduction to ICI all-reduces.
Gradient accumulation (experiment/base.yaml:10) is a ``lax.scan`` microbatch
loop inside the same XLA program; clipping matches Lightning's
``gradient_clip_val`` (global-norm algorithm).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from ..utils import xla_opts
from ..utils.grad_stats import grad_norm_stats


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_optimizer(
    lr: float, weight_decay: float = 0.0, clip: Optional[float] = None
) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=..) + Lightning global-norm clipping.

    torch Adam folds L2 into the gradient *before* the moment updates, so the
    decay transform precedes adam (not AdamW semantics).
    """
    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(float(clip)))
    if weight_decay:
        chain.append(optax.add_decayed_weights(float(weight_decay)))
    chain.append(optax.adam(float(lr)))
    return optax.chain(*chain)


LossFn = Callable[[Any, Any, jax.Array], Tuple[jax.Array, Dict[str, jax.Array]]]


def make_train_step(
    loss_fn: LossFn,
    mesh,
    accumulate: int = 1,
    donate_state: bool = True,
    with_grad_stats: bool = False,
    spatial: bool = False,
):
    """Build the jitted DP train step.

    ``loss_fn(params, batch, rng) -> (loss, metrics)`` must be pure.  The
    returned callable has signature ``(state, batch, rng) -> (state, metrics)``
    where batch is globally-shaped (sharded over ``data``).

    ``spatial=True`` runs DP x SP: image batches additionally sharded on
    dim 1 (NHWC height) over the ``model`` mesh axis — the full-res scaling
    mode (see mesh.spatial_sharding).  Batch shardings are then inferred
    from the arrays ``shard_batch(..., spatial=True)`` placed (a single
    pinned spec can't cover mixed image/label leaf ranks).
    """
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = None if spatial else data_sh  # None = infer from arrays

    def grads_of(params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        return loss, metrics, grads

    def step(state: TrainState, batch, rng):
        if accumulate <= 1:
            loss, metrics, grads = grads_of(state.params, batch, rng)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accumulate, x.shape[0] // accumulate) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, accumulate)

            def body(carry, xs):
                mb, r = xs
                loss, metrics, grads = grads_of(state.params, mb, r)
                acc_loss, acc_metrics, acc_grads = carry
                return (
                    acc_loss + loss / accumulate,
                    jax.tree_util.tree_map(
                        lambda a, m: a + m / accumulate, acc_metrics, metrics
                    ),
                    jax.tree_util.tree_map(
                        lambda a, g: a + g / accumulate, acc_grads, grads
                    ),
                ), None

            loss0, metrics0, grads0 = grads_of(
                state.params,
                jax.tree_util.tree_map(lambda x: x[0], micro),
                rngs[0],
            )
            init = (
                loss0 / accumulate,
                jax.tree_util.tree_map(lambda m: m / accumulate, metrics0),
                jax.tree_util.tree_map(lambda g: g / accumulate, grads0),
            )
            (loss, metrics, grads), _ = jax.lax.scan(
                body,
                init,
                (
                    jax.tree_util.tree_map(lambda x: x[1:], micro),
                    rngs[1:],
                ),
            )

        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        # loss_fn may surface updated mutable collections (e.g. BatchNorm
        # running stats) under the reserved '__mutable__' key; fold them back
        # into params instead of logging them.
        mutable = metrics.pop("__mutable__", None)
        if mutable is not None:
            new_params = dict(new_state.params)
            new_params.update(mutable)
            new_state = new_state.replace(params=new_params)
        metrics["train/loss"] = loss
        if with_grad_stats:
            metrics.update(grad_norm_stats(grads, state.params))
        return new_state, metrics

    # State must enter with the SAME mesh-annotated aval type every call:
    # a fresh init state (single-device, no mesh axes in its aval) and a
    # step-output state (avals tagged {Auto: mesh axes} by sharding-in-types)
    # produce different tracing-cache keys, so call #2 silently RECOMPILES
    # the whole step (~85s for the flagship).  device_put onto the mesh
    # before the first call canonicalizes the types; in_shardings pins them.
    jitted = jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl),
        donate_argnums=(0,) if donate_state else (),
        compiler_options=xla_opts.compiler_options(),
    )

    def call(state: TrainState, batch, rng):
        leaf = jax.tree_util.tree_leaves(state)[0]
        sh = getattr(leaf, "sharding", None)
        if not (isinstance(sh, NamedSharding) and sh.mesh == mesh):
            state = jax.device_put(state, repl)
        return jitted(state, batch, rng)

    return call


def make_eval_step(fn: Callable, mesh, static_argnums=(), spatial: bool = False):
    """jit an eval function with batch sharded over the data axis.

    Params pinned replicated for the same single-compilation reason as
    make_train_step (the sampling program here is the most expensive
    compile in the codebase).

    ``spatial=True`` leaves the batch sharding to be inferred from the
    arrays placed by ``shard_batch(..., spatial=True)`` — DP x SP sampling:
    batch over ``data``, NHWC height over ``model``, with XLA SPMD inserting
    the conv/splat halo exchanges through the whole scanned reverse loop.
    """
    repl = NamedSharding(mesh, P())
    data_sh = None if spatial else NamedSharding(mesh, P(DATA_AXIS))
    jitted = jax.jit(
        fn, in_shardings=(repl, data_sh, None), static_argnums=static_argnums,
        compiler_options=xla_opts.compiler_options(),
    )

    def call(params, batch, rng):
        leaf = jax.tree_util.tree_leaves(params)[0]
        sh = getattr(leaf, "sharding", None)
        if not (isinstance(sh, NamedSharding) and sh.mesh == mesh):
            params = jax.device_put(params, repl)
        return jitted(params, batch, rng)

    return call


__all__ = ["TrainState", "make_optimizer", "make_train_step", "make_eval_step"]
