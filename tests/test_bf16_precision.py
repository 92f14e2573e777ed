"""bf16 production-precision paths: reductions stay f32, losses stay sane.

bf16 VALUES are the accepted production tradeoff (runtime.precision=bf16,
matching the flagship's in-model splat); bf16 REDUCTIONS are not — a bf16
sum over H*W terms loses ~half the mantissa to accumulation error.  The
NaN-aware losses (ops/warp.py) therefore accumulate in f32 regardless of
input dtype, and the FlowLearner pyramid (cast to the compute dtype in
algorithms/flow_learner.py) must land within bf16 tolerance of the f32
pipeline.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opticalflowdiffusion_tpu.config import Config
from opticalflowdiffusion_tpu.ops import warp as W


def test_nan_mse_bf16_inputs_accumulate_in_f32(rng):
    # 64K near-equal terms: a bf16 accumulator plateaus (1 + eps == 1 at
    # bf16's 8-bit mantissa) and would undershoot badly; the f32 reduction
    # must match the f64 oracle to ~bf16 *value* error only.
    a = (1.0 + rng.random((1, 256, 256, 1)) * 0.01).astype(np.float32)
    b = np.zeros_like(a)
    oracle = float(np.mean((a.astype(np.float64)) ** 2))
    got = float(W.nan_mse(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)))
    s, n = W.nan_mse_stats(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))
    assert s.dtype == jnp.float32
    assert abs(got - oracle) / oracle < 2e-2, (got, oracle)


def test_nan_charbonnier_bf16_close_to_f32(rng):
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = rng.random((2, 64, 64, 3)).astype(np.float32)
    f32 = float(W.nan_charbonnier(jnp.asarray(a), jnp.asarray(b)))
    bf16 = float(W.nan_charbonnier(jnp.asarray(a, jnp.bfloat16),
                                   jnp.asarray(b, jnp.bfloat16)))
    assert abs(bf16 - f32) / f32 < 2e-2, (bf16, f32)


@pytest.mark.slow
def test_flow_learner_bf16_loss_and_grads_match_f32(rng):
    """The full bf16 FlowLearner pipeline (bf16 UNet + bf16 single-pass
    pyramid splat) produces a loss within bf16 tolerance of f32 and healthy
    gradients — the precondition for the bf16 train-throughput path."""
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner

    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    tgt = rng.random((2, 16, 16, 3)).astype(np.float32)
    flow = (rng.random((2, 16, 16, 2)) * 2 - 1).astype(np.float32)
    batch = (img, tgt, flow)

    base = dict(name="flow_learner", flow_max=4, lr=1e-4, weight_decay=1e-6,
                zero_init=True, train_aug=False, levels=[1, 2, 4])
    losses, grads = {}, {}
    for prec in ("float32", "bf16"):
        algo = FlowLearner(Config(dict(base, _precision=prec)))
        key = jax.random.PRNGKey(0)
        state = algo.init(key, batch, clip=100)
        (loss, _), g = jax.value_and_grad(algo.loss_fn, has_aux=True)(
            state.params, batch, key
        )
        losses[prec] = float(loss)
        grads[prec] = g

    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["float32"]) / losses["float32"] < 0.05, losses

    gn = {
        p: float(
            jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(g)))
        )
        for p, g in grads.items()
    }
    assert np.isfinite(gn["bf16"]) and gn["bf16"] > 0
    # same order of magnitude: the bf16 path optimizes the same objective
    assert 0.5 < gn["bf16"] / gn["float32"] < 2.0, gn
