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

    # lr 2e-4 (production 1e-5 descends only ~1.4%/epoch at this budget —
    # too slow to distinguish from noise in a smoke window)
    tiny_cfg.algorithm["lr"] = 2e-4
    algo = FlowDiffuser(tiny_cfg.algorithm)
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng, batch, clip=100)

    step_fn = make_train_step(algo.loss_fn, mesh, accumulate=1)

    # The probe: total diffusion loss averaged over 4 fixed rng draws — a
    # fully DETERMINISTIC program of the params (same batch, same rngs), so
    # any measured decrease is a true decrease.  Its reducible fraction is
    # small at smoke budgets: most of the mass is the irreducible high-t
    # region (x0 unrecoverable from near-pure noise) plus the
    # photometric-only flow signal of the joint objective (the reference
    # disables the direct flow loss), and even a width-16 UNet's low-t
    # denoising probe moves <10% in 48 steps at any stable lr (measured).
    # Steady measured descent: 1017 -> 976 @lr 1e-5, -> 935 (-8%) @lr 2e-4
    # in 3 epochs, monotone per epoch on both machines tried.  Assert a
    # strict 3% decrease at the best epoch — beyond any rounding wobble,
    # within half the measured slope.  Full convergence at production
    # budget is evidenced by parity/PARITY_r02.md (16k steps on-chip).
    eval_batch = next(iter(loader))
    eval_rngs = [jax.random.PRNGKey(42 + i) for i in range(4)]

    @jax.jit
    def eval_loss(p):
        return sum(algo.loss_fn(p, eval_batch, r)[0] for r in eval_rngs) / 4

    before = float(eval_loss(state.params))

    losses, evals = [], []
    for epoch in range(4):
        for batch in loader:
            rng, sub = jax.random.split(rng)
            gbatch = meshlib.shard_batch(mesh, batch)
            state, metrics = step_fn(state, gbatch, sub)
            losses.append(float(metrics["train/loss"]))
        evals.append(float(eval_loss(state.params)))

    assert np.isfinite(losses).all()
    assert np.isfinite(evals).all()
    assert min(evals) < before * 0.97, (before, evals)


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


@pytest.mark.parametrize("target", [
    "joint",
    pytest.param("target", marks=pytest.mark.slow),
    pytest.param("flow", marks=pytest.mark.slow),
])
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
