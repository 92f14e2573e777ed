"""End-to-end smoke tests: tiny FlowDiffuser train on ArtificialDataset over
the 8-virtual-device CPU mesh (BASELINE.json config 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.config import compose
from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset
from opticalflowdiffusion_tpu.data.loader import DataLoader
from opticalflowdiffusion_tpu.parallel import mesh as meshlib
from opticalflowdiffusion_tpu.parallel.train import make_train_step


@pytest.fixture(scope="module")
def tiny_cfg():
    return compose(
        [
            "experiment=matrix_flow",
            "dataset=artificial",
            "algorithm=flow_diffuser",
            "dataset.image_size=16",
            "dataset.size=64",
            "+dataset.seed=0",
            "algorithm.image_size=16",
            "algorithm.timesteps=8",
            "algorithm.flow_max=2",
            "experiment.training.data.batch_size=8",
            "experiment.validation.data.batch_size=8",
        ]
    )


def test_artificial_dataset_flow_consistency(tiny_cfg):
    """GT flow must forward-warp frame1 into frame2 (interior pixels)."""
    from opticalflowdiffusion_tpu.ops.warp import warp_forward_flow

    ds = ArtificialDataset(tiny_cfg.dataset)
    first, second, flow = ds[3]
    warped = warp_forward_flow(
        jnp.asarray(first[None]), jnp.asarray(flow[None])
    )[0]
    w = np.asarray(warped)
    mask = np.isfinite(w)
    # warped frame1 should closely match frame2 where defined
    err = np.abs(w[mask] - second[mask]).mean()
    assert err < 0.15, err


@pytest.mark.slow
def test_flow_diffuser_train_loss_decreases(tiny_cfg):
    """The flagship diffusion loss actually optimizes: a deterministic
    fixed-(batch, rng) eval loss must drop after a few epochs of training
    (the per-step training loss is too noisy — random t and noise — so we
    compare the same eval program before/after instead)."""
    ds = ArtificialDataset(tiny_cfg.dataset)
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    mesh = meshlib.make_mesh()
    assert mesh.devices.size == 8  # virtual CPU mesh

    algo = FlowDiffuser(tiny_cfg.algorithm)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng, batch, clip=100)

    step_fn = make_train_step(algo.loss_fn, mesh, accumulate=1)

    # average the eval probe over several rng draws (a single draw fixes one
    # (t, noise) sample per item — too noisy a proxy for the objective), and
    # track it per epoch: short-budget Adam trajectories on this objective
    # are chaotic enough that the ENDPOINT differs across backends/CPU ISAs
    # (f32 rounding alone flips it — phase-vs-map pyramid grads match to
    # 8e-7 yet 96-step endpoints diverge), while a decisive descent
    # *somewhere* along the trajectory is machine-independent.
    eval_batch = next(iter(loader))
    eval_rngs = [jax.random.PRNGKey(42 + i) for i in range(4)]

    @jax.jit
    def eval_loss(p):
        return sum(algo.loss_fn(p, eval_batch, r)[0] for r in eval_rngs) / 4

    before = float(eval_loss(state.params))

    losses, evals = [], []
    for epoch in range(3):
        for batch in loader:
            rng, sub = jax.random.split(rng)
            gbatch = meshlib.shard_batch(mesh, batch)
            state, metrics = step_fn(state, gbatch, sub)
            losses.append(float(metrics["train/loss"]))
        evals.append(float(eval_loss(state.params)))

    assert np.isfinite(losses).all()
    assert np.isfinite(evals).all()
    assert min(evals) < before * 0.8, (before, evals)


@pytest.mark.slow
def test_flow_diffuser_val_step(tiny_cfg):
    ds = ArtificialDataset(tiny_cfg.dataset)
    loader = DataLoader(ds, batch_size=8, shuffle=False, seed=0)
    algo = FlowDiffuser(tiny_cfg.algorithm)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng, batch)

    metrics, artifacts = jax.jit(algo.val_step)(state.params, batch, rng)
    for k in ("val/loss", "val/mse", "val/ideal_loss", "val/last_step"):
        assert k in metrics, k
        assert np.isfinite(float(metrics[k])), k

    images = algo.visualize(batch, jax.device_get(artifacts))
    for k in ("original", "target", "gt_flow", "target_p", "samples", "grad_flow"):
        assert k in images, k
        img = np.asarray(images[k])
        assert np.isfinite(img).all(), k


@pytest.mark.parametrize("target", ["joint", "target", "flow"])
def test_val_step_traces_for_all_targets(tiny_cfg, target):
    """All three target modes trace through val_step with consistent shapes
    (regression: target='flow' returned a non-trajectory sample that the
    trajectory slicing in val_step mangled to (B, W, C))."""
    cfg = compose(
        [
            "experiment=matrix_flow", "dataset=artificial",
            "algorithm=flow_diffuser",
            "dataset.image_size=16", "dataset.size=16", "+dataset.seed=0",
            "algorithm.image_size=16", "algorithm.timesteps=4",
            "algorithm.flow_max=2", f"algorithm.target={target}",
        ]
    )
    ds = ArtificialDataset(cfg.dataset)
    loader = DataLoader(ds, batch_size=4, shuffle=False, seed=0)
    algo = FlowDiffuser(cfg.algorithm)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng, batch)

    # abstract trace only — exercises every shape in the program at ~0 cost
    metrics, artifacts = jax.eval_shape(
        algo.val_step, state.params, batch, rng
    )
    B, S = 4, 16
    assert artifacts["samples"].shape == (B, S, S, 3)
    assert artifacts["p_flows"].shape == (B, S, S, 2)
    for k in ("val/loss", "val/mse", "val/epe"):
        assert metrics[k].shape == ()


@pytest.mark.slow
def test_grad_accumulation_matches_large_batch(tiny_cfg):
    ds = ArtificialDataset(tiny_cfg.dataset)
    loader = DataLoader(ds, batch_size=8, shuffle=False, seed=0)
    mesh = meshlib.make_mesh()
    algo = FlowDiffuser(tiny_cfg.algorithm)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(1)
    state = algo.init(rng, batch)

    step1 = make_train_step(algo.loss_fn, mesh, accumulate=1, donate_state=False)
    step2 = make_train_step(algo.loss_fn, mesh, accumulate=2, donate_state=False)
    gbatch = meshlib.shard_batch(mesh, batch)
    _, m1 = step1(state, gbatch, rng)
    _, m2 = step2(state, gbatch, rng)
    assert np.isfinite(float(m1["train/loss"]))
    assert np.isfinite(float(m2["train/loss"]))
