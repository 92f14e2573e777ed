"""Cross-model dependency path: FlowPred trains the AE, publishes it to the
local artifact store, and the latent FlowDiffuser loads it frozen
(reference flow_diffuser.py:82-96 / main.py:66-76 equivalents)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opticalflowdiffusion_tpu.config import Config


@pytest.mark.slow
def test_latent_flow_diffuser_with_ae_artifact(tmp_path, rng, monkeypatch):
    from opticalflowdiffusion_tpu.utils import ckpt as ckpt_mod
    from opticalflowdiffusion_tpu.utils.ckpt import CheckpointManager, publish_artifact
    from opticalflowdiffusion_tpu.algorithms.flow_pred import FlowPred
    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser

    monkeypatch.setattr(ckpt_mod, "ARTIFACT_ROOT", tmp_path / "artifacts")

    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    tgt = rng.random((2, 16, 16, 3)).astype(np.float32)
    flow = rng.random((2, 16, 16, 2)).astype(np.float32)
    batch = (img, tgt, flow)

    # 1. "train" the AE (one init) and checkpoint it under the 'ae.' prefix
    # the way the FlowPred run would (params tree key 'ae').
    fp_cfg = Config(dict(name="flow_pred", image_size="16,16", lr=4e-5,
                         weight_decay=1e-6, latent_dim=4, ae_frac=0.1))
    fp = FlowPred(fp_cfg)
    state = fp.init(jax.random.PRNGKey(0), batch)

    ckpt_dir = tmp_path / "ae_run" / "checkpoints"
    mgr = CheckpointManager(ckpt_dir, every_n_train_steps=1)
    mgr.maybe_save(1, {"params": {"ae": jax.device_get(state.params)}}, force=True)
    mgr.wait()
    mgr.close()
    publish_artifact("px8q8g0m", ckpt_dir)

    # 2. latent FlowDiffuser loads the frozen AE by run id
    fd_cfg = Config(dict(
        name="flow_diffuser", image_size=16, latent_dim=4, flow_max=2,
        latent_max=2, lr=1e-5, flow_weight=0.0, weight_decay=1e-6,
        is_diffusion=True, latent=True, timesteps=4, target="joint",
        ae="px8q8g0m", noiser="image", zero_init=True,
    ))
    algo = FlowDiffuser(fd_cfg)
    fd_state = algo.init(jax.random.PRNGKey(1), batch)

    # loaded AE params equal the published ones
    want = jax.device_get(state.params)
    got = jax.device_get(algo.ae_params)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(a, b)

    # latent training step produces finite loss and AE gets no gradient
    (loss, _), grads = jax.value_and_grad(algo.loss_fn, has_aux=True)(
        fd_state.params, batch, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))

    # latent+joint SAMPLING: the reference's channels=latent_dim formula
    # (flow_diffuser.py:120) drops the flow channels here and crashes —
    # the rebuilt uniform channel count must sample fine (PARITY.md #9)
    metrics, arts = jax.jit(algo.val_step)(
        fd_state.params, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(metrics["val/mse"]))
    assert arts["p_flows"].shape == flow.shape
    # AE params are not part of the trainable tree at all
    flat = jax.tree_util.tree_flatten_with_path(fd_state.params)[0]
    assert not any("ae" == str(k[0]) for k, _ in flat)
