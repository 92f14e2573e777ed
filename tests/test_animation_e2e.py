"""Animation experiment end-to-end through main.py on a synthetic TaiChi
tree (FrameGenerator: conditional next-frame diffusion + rollout val), and
sharded sampling over the mesh."""

import json
from pathlib import Path

import numpy as np
import pytest


def _fake_taichi(root: Path, rng, size=12, n=10):
    from PIL import Image

    base = root / "taichi" / "taichi"
    for split in ("training", "test"):
        vid = base / split / "vid0"
        vid.mkdir(parents=True)
        flows = base / f"{split}-flows2" / "vid0"
        flows.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(vid / f"{i:04d}.png")
            np.save(
                flows / f"{i:04d}.png.npy",
                rng.standard_normal((size, size, 2)).astype(np.float32),
            )


@pytest.mark.slow
def test_main_animation(tmp_path, monkeypatch, rng):
    _fake_taichi(tmp_path / "data", rng)
    monkeypatch.chdir(tmp_path)

    import main as main_mod

    main_mod.run(
        [
            "experiment=animation",
            "dataset=taichi",
            "algorithm=frame_generator",
            f"dataset.root={tmp_path / 'data'}",
            "dataset.image_size=16",
            "dataset.frame_distance=2",
            "dataset.val_length=2",
            "algorithm.image_size=16",
            "experiment.training.data.batch_size=8",
            "experiment.validation.data.batch_size=8",
            "experiment.training.max_steps=2",
            "experiment.validation.check_interval=50",  # skip heavy val
            "runtime.log_every=1",
        ]
    )
    run_dir = Path("outputs/latest-run").resolve()
    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    train = [r for r in records if "train/loss" in r]
    assert train and np.isfinite(train[0]["train/loss"])


@pytest.mark.slow  # DP+SP sampling also fast-pinned by test_parallel.py::test_dp_sp_sampling_matches_single_device
def test_sharded_sampling(rng):
    """The full reverse-diffusion scan jits with the batch sharded over the
    data axis (multi-chip serving shape)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opticalflowdiffusion_tpu.algorithms.flow_diffuser import FlowDiffuser
    from opticalflowdiffusion_tpu.config import Config
    from opticalflowdiffusion_tpu.parallel import mesh as meshlib

    cfg = Config(dict(
        name="flow_diffuser", image_size=16, latent_dim=16, flow_max=2,
        latent_max=2, lr=1e-5, flow_weight=0.0, weight_decay=1e-6,
        is_diffusion=True, latent=False, timesteps=4, target="joint",
        ae=None, noiser="image", zero_init=True,
    ))
    algo = FlowDiffuser(cfg)
    mesh = meshlib.make_mesh()
    B = 8
    img = rng.random((B, 16, 16, 3)).astype(np.float32)
    tgt = rng.random((B, 16, 16, 3)).astype(np.float32)
    flow = rng.random((B, 16, 16, 2)).astype(np.float32)
    state = algo.init(jax.random.PRNGKey(0), (img, tgt, flow))

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def sample(params, cond, rng):
        traj, flows = algo.sample(params, cond, rng)
        return traj[:, -1]

    cond = jax.device_put(jnp.asarray(2 * img - 1), data_sh)
    params = jax.device_put(state.params, repl)
    out = sample(params, cond, jax.random.PRNGKey(1))
    assert out.shape == (B, 16, 16, algo.dim)  # image part of the joint sample
    assert np.isfinite(np.asarray(out)).all()
    # output stays sharded over the data axis
    assert len(out.sharding.device_set) == 8
