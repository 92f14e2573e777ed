"""Training actually learns: loss decreases substantially over real steps.

The e2e tests check finiteness; this checks optimization. MatrixFlow with
goal=gt_flow_pred (supervised flow regression) on the artificial dataset is
the fastest-converging configuration.  Also covers the DDIM few-step
sampling path on the flagship.
"""

import numpy as np
import jax
import pytest

from opticalflowdiffusion_tpu.config import Config
from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset
from opticalflowdiffusion_tpu.data.loader import DataLoader
from opticalflowdiffusion_tpu.parallel import mesh as meshlib
from opticalflowdiffusion_tpu.parallel.train import make_train_step


@pytest.mark.slow
def test_matrix_flow_supervised_loss_decreases(rng):
    from opticalflowdiffusion_tpu.algorithms.matrix_flow import MatrixFlow

    ds_cfg = Config(dict(image_size=16, size=128, shape="boxes", bg="checkers",
                         seed=1))
    ds = ArtificialDataset(ds_cfg)
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)

    cfg = Config(dict(
        name="matrix_flow", image_size="16,16", architecture="unet",
        goal="gt_flow_pred", lr=2e-4, weight_decay=0.0, radius=3,
        smoothness_weight=0.0, smoothness_lmbd=2.0, identity_weight=0.0,
        copout_weight=0.0, divergence_weight=0.0, inversion_weight=0.0,
        small_eps=0.5, eps=1e-15,
    ))
    algo = MatrixFlow(cfg)
    mesh = meshlib.make_mesh()
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    state = algo.init(key, batch, clip=100)
    step = make_train_step(algo.loss_fn, mesh)

    losses = []
    for epoch in range(6):
        for batch in loader:
            key, sub = jax.random.split(key)
            state, metrics = step(state, meshlib.shard_batch(mesh, batch), sub)
            losses.append(float(metrics["train/loss"]))

    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert np.isfinite(losses).all()
    assert last < first * 0.5, (first, last, losses[::8])


@pytest.mark.slow
def test_flow_learner_unsupervised_loss_decreases():
    """The unsupervised photometric objective actually optimizes: fixed-
    (batch, rng) eval loss drops decisively after a few epochs (reference
    behavior: flow_learner.py:133-222 trains flow purely from photometric
    loss).  Flow QUALITY is evidenced by the production-config parity run
    (see the NOTE at the end)."""
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner

    ds = ArtificialDataset(
        Config(dict(image_size=16, size=128, shape="boxes", bg="checkers",
                    seed=2))
    )
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    # zero_init=False: zero-init starts AT the zero-flow solution, leaving
    # a small-step budget only a noise-level signal (observed flaky: loss
    # 0.0300 -> 0.0310); from random flows the photometric descent is an
    # unambiguous optimization signal.  flow_max=2: the x4 output gain of
    # flow_max=4 makes Adam unstable at test budgets (swept on TPU:
    # fmax=4 ratio 0.91, fmax=2 ratio 0.067 after 12 epochs).  The
    # 8000-step parity run (parity/PARITY_r02.md) carries the full-
    # convergence claim.
    cfg = Config(dict(name="flow_learner", flow_max=2, lr=1e-4,
                      weight_decay=1e-6, zero_init=False, train_aug=False,
                      levels=[1, 2]))
    algo = FlowLearner(cfg)
    # 1-device mesh: halves the per-epoch cost on a 1-core host (multi-device
    # DP == single-device numerics is pinned separately in test_parallel.py),
    # buying the longer window the chaotic basin-entry needs (below).
    mesh = meshlib.make_mesh(devices=jax.devices()[:1])
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    state = algo.init(jax.random.PRNGKey(0), batch, clip=100)
    step = make_train_step(algo.loss_fn, mesh)

    eval_batch = next(iter(loader))
    eval_rng = jax.random.PRNGKey(7)
    eval_loss = jax.jit(lambda p: algo.loss_fn(p, eval_batch, eval_rng)[0])
    before = float(eval_loss(state.params))

    # per-epoch tracking asserted on the best point, over a 24-epoch window:
    # this objective's trajectories wander/ascend for a chaotic number of
    # epochs and then DROP sharply into the photometric basin (measured on
    # an avx512-only 1-core host: 0.42 -> wander 0.44-0.84 -> 0.07 at epoch
    # 5 (map path, 8-device mesh) vs epoch 13 (phase path, 1-device mesh) —
    # f32 rounding differences alone reshuffle the drop epoch, since
    # phase-vs-map grads agree to 8e-7 and the first step is bit-identical).
    # The drop itself is machine-independent; its timing is not, so the
    # window must be generous.  TPU sweep endpoint ratio: 0.067.
    evals = []
    for epoch in range(24):
        for batch in loader:
            key, sub = jax.random.split(key)
            state, _ = step(state, meshlib.shard_batch(mesh, batch), sub)
        evals.append(float(eval_loss(state.params)))
    assert np.isfinite(evals).all()
    assert min(evals) < before * 0.5, (before, evals)

    metrics, _ = jax.jit(algo.val_step)(
        state.params, eval_batch, jax.random.PRNGKey(1)
    )
    epe = float(metrics["val/epe"])
    assert np.isfinite(epe)
    # NOTE: no EPE-quality bound here — the 2-level pyramid shrink admits
    # the reference objective's out-of-frame degenerate optimum (push
    # pixels out of bounds -> NaN holes -> masked out of nan_charbonnier,
    # reference warp.py:273-287), which the production 10-level pyramid
    # penalizes.  Flow QUALITY under the production config is evidenced by
    # the 8000-step run in parity/PARITY_r02.md (moving EPE 1.08 vs 1.20
    # zero-flow; photometric loss far below the gt-flow oracle).


@pytest.mark.slow
def test_flow_diffuser_ddim_fewstep(rng):
    """sampling_timesteps < timesteps routes through the DDIM scan."""
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser

    cfg = Config(dict(
        name="flow_diffuser", image_size=16, latent_dim=16, flow_max=2,
        latent_max=2, lr=1e-5, flow_weight=0.0, weight_decay=1e-6,
        is_diffusion=True, latent=False, timesteps=32, sampling_timesteps=4,
        target="joint", ae=None, noiser="image", zero_init=True,
    ))
    algo = FlowDiffuser(cfg)
    assert algo.sched.is_ddim_sampling

    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    tgt = rng.random((2, 16, 16, 3)).astype(np.float32)
    flow = rng.random((2, 16, 16, 2)).astype(np.float32)
    batch = (img, tgt, flow)
    state = algo.init(jax.random.PRNGKey(0), batch)
    metrics, artifacts = jax.jit(algo.val_step)(
        state.params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["val/mse"]))
    # the returned sample must be the DENOISED final state, not the initial
    # noise (regression: over-strided DDIM trajectory subsampling)
    mid = np.asarray(artifacts["mid_samples"])
    assert mid.shape[1] >= 2
    assert np.abs(mid[:, -1] - mid[:, 0]).max() > 1e-3
