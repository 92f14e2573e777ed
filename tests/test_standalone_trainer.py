"""Standalone diffusion Trainer (C16b rebuild): tiny end-to-end run with EMA,
milestone checkpoints, sampling, and surrogate FID."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_ema_semantics():
    from opticalflowdiffusion_tpu.models.ema import EmaState, ema_update

    params = {"w": jnp.ones((2,))}
    ema = EmaState.create(params)
    # before update_after_step: copies params when update fires
    ema = ema_update(ema, {"w": jnp.full((2,), 3.0)}, decay=0.5,
                     update_every=1, update_after_step=2)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 3.0)
    # after warmup: decayed blend
    ema = ema_update(ema, {"w": jnp.full((2,), 5.0)}, decay=0.5,
                     update_every=1, update_after_step=2)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 5.0)  # step 2 <= 2
    ema = ema_update(ema, {"w": jnp.full((2,), 7.0)}, decay=0.5,
                     update_every=1, update_after_step=2)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 6.0)  # 0.5*5+0.5*7


def test_frechet_distance_zero_for_identical(rng):
    from opticalflowdiffusion_tpu.utils.fid import feature_stats, frechet_distance

    f = rng.standard_normal((200, 8))
    mu, sig = feature_stats(f)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    f2 = f + 5.0
    mu2, sig2 = feature_stats(f2)
    assert frechet_distance(mu, sig, mu2, sig2) == pytest.approx(8 * 25.0, rel=1e-3)


@pytest.mark.slow
def test_standalone_trainer_tiny(tmp_path, rng):
    from PIL import Image

    from opticalflowdiffusion_tpu.models import diffusion as dm
    from opticalflowdiffusion_tpu.models.unet import Unet
    from opticalflowdiffusion_tpu.training.standalone import Trainer

    folder = tmp_path / "images"
    folder.mkdir()
    for i in range(8):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(folder / f"{i}.png")

    sched = dm.make_schedule(4, objective="pred_noise")
    model = Unet(16, channels=3, out_dim=3, dim_mults=(1, 2))
    tr = Trainer(
        sched, model, folder,
        train_batch_size=8, gradient_accumulate_every=1, train_lr=1e-4,
        train_num_steps=2, save_and_sample_every=2, num_samples=4,
        results_folder=str(tmp_path / "results"), image_size=16,
        calculate_fid=True,
    )
    state, ema = tr.train()
    assert int(state.step) == 2
    assert (tmp_path / "results" / "sample-1.png").exists()
    assert (tmp_path / "results" / "checkpoints").exists()
