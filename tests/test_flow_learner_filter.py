"""Behavioral tests for the FlowLearner filter branch (VERDICT r1 weak #9):
the occlusion mask actually masks vacated pixels, the filter warp moves
content correctly, and the filter flow estimate drives the photometric loss
the right way (reference flow_learner.py:133-222, rebuilt per the parity
note in algorithms/flow_learner.py:10-17)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.ops import filters as fops

R = 3
K = R * R + 4  # packed: fil(9) + col(3) + colw(1)


def _uniform_shift_filter(b, h, w, dy, dx):
    """Packed filter whose every pixel has a unit tap at forward offset
    (dy, dx): filter_to_flow == (dx, dy) and warp_forward_filter shifts
    content by (+dy, +dx)."""
    fil = np.zeros((b, h, w, R, R), np.float32)
    fil[..., R // 2 + dy, R // 2 + dx] = 1.0
    packed = np.zeros((b, h, w, K), np.float32)
    packed[..., : R * R] = fil.reshape(b, h, w, R * R)
    return jnp.asarray(packed)


def test_filter_to_flow_delta_taps():
    for dy, dx in ((0, 0), (1, 0), (0, -1), (-1, 1)):
        packed = _uniform_shift_filter(1, 6, 6, dy, dx)
        flow = np.asarray(fops.filter_to_flow(packed))
        np.testing.assert_allclose(flow[..., 0], dx)
        np.testing.assert_allclose(flow[..., 1], dy)


def test_forward_filter_warp_moves_content(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    packed = _uniform_shift_filter(1, 8, 8, 1, 0)  # move content down 1
    out = np.asarray(fops.warp_forward_filter(img, packed))
    np.testing.assert_allclose(
        out[:, 1:], np.asarray(img)[:, :-1], atol=1e-6
    )


def test_occlusion_mask_marks_vacated_rows():
    packed = _uniform_shift_filter(1, 8, 8, 1, 0)  # content moves down
    mask = np.asarray(fops.occlusion_mask(packed))[0, ..., 0]
    np.testing.assert_allclose(mask[0], 0.0)   # vacated top row: occluded
    np.testing.assert_allclose(mask[1:], 1.0)  # everything else supported


def test_occlusion_mask_gates_photometric_loss():
    """Garbage in masked (vacated) pixels must not change the masked
    photometric term — exactly the loss structure of
    algorithms/flow_learner.py:146-158."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    packed = _uniform_shift_filter(1, 8, 8, 1, 0)
    warped = fops.warp_forward_filter(img, packed)
    mask = fops.occlusion_mask(packed)

    tgt_clean = np.asarray(jnp.roll(img, 1, axis=1))
    tgt_garbage = tgt_clean.copy()
    tgt_garbage[:, 0] = 123.0  # garbage only in the vacated row

    def masked_photo(tgt):
        diff = jnp.square(warped - jnp.asarray(tgt)) * mask
        return float(jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * 3, 1.0))

    assert masked_photo(tgt_clean) == pytest.approx(
        masked_photo(tgt_garbage), abs=1e-7
    )
    # sanity: without the mask the garbage dominates
    unmasked = float(jnp.mean(jnp.square(warped - jnp.asarray(tgt_garbage))))
    assert unmasked > 100 * masked_photo(tgt_garbage)


def test_correct_shift_filter_beats_identity_photometrically(rng):
    """The loss landscape rewards the right filter: on a pair where content
    moves down one pixel, the matching shift filter reconstructs the target
    (masked) far better than the identity filter."""
    img = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    tgt = jnp.roll(img, 1, axis=1)

    def masked_err(packed):
        warped = fops.warp_forward_filter(img, packed)
        mask = fops.occlusion_mask(packed)
        diff = jnp.square(warped - tgt) * mask
        return float(jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * 3, 1.0))

    err_correct = masked_err(_uniform_shift_filter(1, 8, 8, 1, 0))
    err_identity = masked_err(_uniform_shift_filter(1, 8, 8, 0, 0))
    assert err_correct < 1e-10
    assert err_identity > 0.05


@pytest.mark.slow
def test_filter_flow_learner_loss_optimizes(rng):
    """End-to-end: the filter-branch FlowLearner's full loss (photometric
    pyramid + occlusion-masked no-color term + sparsity) decreases under
    training on ArtificialDataset (deterministic fixed-rng eval)."""
    from opticalflowdiffusion_tpu.algorithms.flow_learner import FlowLearner
    from opticalflowdiffusion_tpu.config import compose
    from opticalflowdiffusion_tpu.data.artificial import ArtificialDataset
    from opticalflowdiffusion_tpu.data.loader import DataLoader
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib
    from opticalflowdiffusion_tpu.parallel.train import make_train_step

    cfg = compose([
        "experiment=matrix_flow", "dataset=artificial",
        "algorithm=flow_learner",
        "dataset.image_size=16", "dataset.size=32", "+dataset.seed=1",
        "algorithm.image_size=16", "~algorithm.flow_max",
        "+algorithm.radius=3", "algorithm.train_aug=false",
    ])
    ds = ArtificialDataset(cfg.dataset)
    loader = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    mesh = meshlib.make_mesh()
    algo = FlowLearner(cfg.algorithm)
    assert algo.rep == "filter"

    batch = next(iter(loader))
    rng_j = jax.random.PRNGKey(0)
    state = algo.init(rng_j, batch, clip=100)
    step_fn = make_train_step(algo.loss_fn, mesh, accumulate=1)

    eval_batch = next(iter(loader))
    eval_rng = jax.random.PRNGKey(42)
    eval_loss = jax.jit(lambda p: algo.loss_fn(p, eval_batch, eval_rng)[0])
    before = float(eval_loss(state.params))

    for epoch in range(3):
        for b in loader:
            rng_j, sub = jax.random.split(rng_j)
            state, metrics = step_fn(state, meshlib.shard_batch(mesh, b), sub)
            assert np.isfinite(float(metrics["train/loss"]))
    after = float(eval_loss(state.params))
    assert after < before * 0.9, (before, after)
