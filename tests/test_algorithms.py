"""Per-algorithm smoke tests at tiny shapes: init + one grad step + val."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.config import Config


def _flow_batch(rng, B=2, S=16):
    img = rng.random((B, S, S, 3)).astype(np.float32)
    tgt = rng.random((B, S, S, 3)).astype(np.float32)
    flow = (rng.random((B, S, S, 2)) * 2 - 1).astype(np.float32)
    return img, tgt, flow


def _one_grad_step(algo, batch, clip=100):
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng, batch, clip=clip)
    (loss, metrics), grads = jax.value_and_grad(algo.loss_fn, has_aux=True)(
        state.params, batch, rng
    )
    assert np.isfinite(float(loss)), loss
    gnorm = sum(
        float(jnp.sum(jnp.square(g)))
        for g in jax.tree_util.tree_leaves(grads)
        if g.dtype != jnp.int32
    )
    assert np.isfinite(gnorm) and gnorm > 0
    state = state.apply_gradients(grads)
    return state, loss


@pytest.mark.slow
def test_flow_learner_flow_rep(rng):
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner

    cfg = Config(dict(name="flow_learner", flow_max=4, lr=1e-4,
                      weight_decay=1e-6, zero_init=True, train_aug=False,
                      levels=[1, 2]))
    algo = FlowLearner(cfg)
    batch = _flow_batch(rng)
    state, loss = _one_grad_step(algo, batch)
    metrics, artifacts = algo.val_step(state.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["val/loss"]))
    assert np.isfinite(float(metrics["val/epe"]))
    imgs = algo.visualize(batch, jax.device_get(artifacts))
    assert "grad_flow" in imgs and np.isfinite(imgs["grad_flow"]).all()


def test_flow_learner_flow_rep_smoke(rng):
    """Fast FlowLearner coverage (forward loss only — the value_and_grad +
    val_step + visualize chain compiles for minutes on the 1-core host and
    lives in the slow-marked test above; pyramid grads are pinned fast in
    tests/test_pyramid.py)."""
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner

    cfg = Config(dict(name="flow_learner", flow_max=4, lr=1e-4,
                      weight_decay=1e-6, zero_init=True, train_aug=False,
                      levels=[1]))
    algo = FlowLearner(cfg)
    batch = _flow_batch(rng)
    rngk = jax.random.PRNGKey(0)
    state = algo.init(rngk, batch, clip=100)
    loss, metrics = jax.jit(algo.loss_fn)(state.params, batch, rngk)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_flow_learner_filter_rep(rng):
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner

    cfg = Config(dict(name="flow_learner", radius=3, lr=1e-4, c2f=False,
                      weight_decay=0.0, occlusion_mask=True,
                      sparsity_weight=0.1, train_aug=False, levels=[1]))
    algo = FlowLearner(cfg)
    assert algo.rep == "filter"
    batch = _flow_batch(rng)
    _one_grad_step(algo, batch)


@pytest.mark.slow
def test_matrix_flow_goals(rng):
    from opticalflowdiffusion_tpu.algorithms.matrix_flow import MatrixFlow

    batch = _flow_batch(rng, B=1, S=16)
    for goal in ("gt_flow_pred", "gt_filter_pred", "filter_pred"):
        cfg = Config(dict(
            name="matrix_flow", image_size="16,16", architecture="unet",
            goal=goal, lr=1e-4, weight_decay=0.0, radius=3,
            smoothness_weight=0.1, smoothness_lmbd=2.0, identity_weight=0.1,
            copout_weight=0.1, divergence_weight=0.1, inversion_weight=0.1,
            small_eps=0.5, eps=1e-15,
        ))
        algo = MatrixFlow(cfg)
        state, loss = _one_grad_step(algo, batch)
        metrics, artifacts = algo.val_step(state.params, batch, jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (goal, k)


def test_matrix_flow_filter_roundtrip(rng):
    """invert(invert(fil)) == fil for interior pixels; filter_from_vector /
    vector_from_filter inverse relationship on integer flows."""
    from opticalflowdiffusion_tpu.algorithms.matrix_flow import MatrixFlow

    cfg = Config(dict(name="matrix_flow", image_size="8,8", architecture="unet",
                      goal="gt_filter_pred", lr=1e-4, weight_decay=0.0, radius=3,
                      smoothness_weight=0.0, smoothness_lmbd=2.0,
                      identity_weight=0.0, copout_weight=0.0,
                      divergence_weight=0.0, inversion_weight=0.0,
                      small_eps=0.5, eps=1e-15))
    algo = MatrixFlow(cfg)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # dx = 1
    fil = algo.filter_from_vector(jnp.asarray(flow))
    vec = np.asarray(algo.vector_from_filter(algo.invert_filter(fil)))
    # invert(filter_from_vector(flow)) should recover the flow on interior
    np.testing.assert_allclose(vec[0, 2:-2, 2:-2], flow[0, 2:-2, 2:-2], atol=1e-5)


@pytest.mark.slow
def test_pwc_learner(rng):
    from opticalflowdiffusion_tpu.algorithms.pwc_learner import PWCLearner

    cfg = Config(dict(name="pwc_learner", lr=1e-4, weight_decay=1e-6))
    algo = PWCLearner(cfg)
    B, S = 1, 64
    f1 = rng.random((B, S, S, 3)).astype(np.float32)
    f2 = rng.random((B, S, S, 3)).astype(np.float32)
    f3 = rng.random((B, S, S, 3)).astype(np.float32)
    gt = rng.random((B, S, S, 2)).astype(np.float32)
    batch = (f1, f2, f3, gt)
    state, loss = _one_grad_step(algo, batch)
    metrics, artifacts = algo.val_step(state.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["val/epe"]))
    imgs = algo.visualize(batch, jax.device_get(artifacts))
    assert "fwd_flow" in imgs


def test_frame_generator(rng):
    from opticalflowdiffusion_tpu.algorithms.animation import FrameGenerator

    cfg = Config(dict(name="frame_generator", image_size=16, lr=7e-5,
                      weight_decay=2e-4))
    algo = FrameGenerator(cfg)
    algo.sched = algo.sched.__class__(**{
        **{f.name: getattr(algo.sched, f.name) for f in algo.sched.__dataclass_fields__.values()},
    })
    x = rng.random((2, 16, 16, 8)).astype(np.float32)
    batch = (x,)
    _one_grad_step(algo, batch)


@pytest.mark.slow  # same grad machinery fast-covered by test_flow_completer_zero_motion_sample_finite
def test_flow_completer(rng):
    from opticalflowdiffusion_tpu.algorithms.animation import FlowCompleter

    cfg = Config(dict(name="flow_completer", image_size=16, lr=4.5e-6,
                      weight_decay=2e-4))
    algo = FlowCompleter(cfg)
    x = rng.random((2, 16, 16, 8)).astype(np.float32)
    batch = (x,)
    state, loss = _one_grad_step(algo, batch)
    metrics, artifacts = algo.val_step(state.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["val/loss"]))
    # null embedding is learnable
    assert "null_embedding" in state.params


def test_flow_completer_zero_motion_sample_finite(rng):
    """A static (all-zero flow) sample must not NaN the loss/grads: the
    magnitude-weighted loss divides by the per-sample flow peak (found as a
    0/0 -> permanent param poisoning in the r03 trained-parity run)."""
    from opticalflowdiffusion_tpu.algorithms.animation import FlowCompleter

    cfg = Config(dict(name="flow_completer", image_size=16, lr=4.5e-6,
                      weight_decay=2e-4))
    algo = FlowCompleter(cfg)
    x = rng.random((2, 16, 16, 8)).astype(np.float32)
    x[0, ..., -2:] = 0.0  # one static sample in the batch
    state, loss = _one_grad_step(algo, (x,))
    assert np.isfinite(loss)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_classifier(rng):
    from opticalflowdiffusion_tpu.algorithms.classifier import Classifier
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    cfg = Config(dict(name="classifier", arch="resnet18", num_class=10,
                      in_channels=3, lr=1e-3))
    algo = Classifier(cfg)
    images = rng.random((8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,)).astype(np.int32)
    batch = (images, labels)
    state = algo.init(jax.random.PRNGKey(0), batch)

    mesh = meshlib.make_mesh()
    step = make_train_step(algo.loss_fn, mesh, donate_state=False)
    gbatch = meshlib.shard_batch(mesh, batch)
    old_stats = jax.device_get(state.params["batch_stats"])
    state2, metrics = step(state, gbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/loss"]))
    assert "training/accuracy" in metrics
    # batch stats must have been updated through the __mutable__ channel
    new_stats = jax.device_get(state2.params["batch_stats"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), old_stats, new_stats
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    vmetrics, _ = jax.jit(algo.val_step)(state2.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(vmetrics["validation/loss"]))


@pytest.mark.slow
def test_flow_pred(rng):
    from opticalflowdiffusion_tpu.algorithms.flow_pred import FlowPred

    cfg = Config(dict(name="flow_pred", image_size="16,16", lr=4e-5,
                      weight_decay=1e-6, latent_dim=4, ae_frac=0.5))
    algo = FlowPred(cfg)
    batch = _flow_batch(rng, B=2, S=16)
    state, loss = _one_grad_step(algo, batch)
    metrics, artifacts = algo.val_step(state.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["val/loss"]))


def test_raft_forward(rng):
    from opticalflowdiffusion_tpu.models.raft import RAFT

    model = RAFT(iters=2)
    img1 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    img2 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img1, img2)["params"]
    flows = model.apply({"params": params}, img1, img2)
    assert len(flows) == 2
    assert flows[-1].shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(flows[-1])).all()
