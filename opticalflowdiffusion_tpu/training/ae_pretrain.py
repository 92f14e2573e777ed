"""Train the flow-equivariant Autoencoder artifact for the latent
FlowDiffuser.

The reference's latent mode loads a FROZEN pretrained Autoencoder by wandb
run id (reference flow_diffuser.py:82-94, ``cfg.ae: px8q8g0m``) that a
prior FlowPred run produced (reference flow_pred.py:60-124).  This script
is that prior run: it trains FlowPred (algorithms/flow_pred.py) on
ArtificialDataset with the production train step and publishes the
checkpoint to the local artifact store under ``ae-artificial`` with the
``ae.`` params prefix the diffuser's loader expects.

Usage:
    python -m opticalflowdiffusion_tpu.training.ae_pretrain \
        --steps 3000 --image-size 32 --batch 16
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def train_ae(
    steps: int = 3000,
    image_size: int = 32,
    batch: int = 16,
    lr: float = 4e-4,
    latent_dim: int = 16,
    ae_frac: float = 0.1,
    seed: int = 0,
    out_dir: str = "outputs/ae_pretrain",
    artifact: str = "ae-artificial",
    dataset_size: int = 4096,
    log_every: int = 100,
) -> dict:
    """Returns {'recon_mse': trained val recon MSE, 'recon_mse_init': ...}."""
    import jax
    import jax.numpy as jnp

    from ..algorithms.flow_pred import FlowPred
    from ..config import Config
    from ..data.artificial import ArtificialDataset
    from ..data.loader import DataLoader
    from ..parallel import mesh as meshlib
    from ..parallel.train import make_train_step
    from ..utils.ckpt import CheckpointManager, publish_artifact

    ds = ArtificialDataset(
        Config(dict(image_size=image_size, size=dataset_size, seed=seed))
    )
    loader = DataLoader(ds, batch_size=batch, shuffle=True, seed=seed)
    val_ds = ArtificialDataset(
        Config(dict(image_size=image_size, size=256, seed=seed + 1))
    )
    val_loader = DataLoader(val_ds, batch_size=batch, shuffle=False, seed=seed)

    algo = FlowPred(Config(dict(
        name="flow_pred", image_size=f"{image_size},{image_size}", lr=lr,
        weight_decay=1e-6, latent_dim=latent_dim, ae_frac=ae_frac,
    )))
    mesh = meshlib.make_mesh()
    rng = jax.random.PRNGKey(seed)
    state = algo.init(rng, next(iter(loader)), clip=100)
    step_fn = make_train_step(algo.loss_fn, mesh, accumulate=1)

    @jax.jit
    def recon_mse(params, batch):
        img, tgt, flow = batch
        out = algo.ae.apply({"params": params}, img, flow)
        return jnp.mean(jnp.square(out - tgt))

    val_batch = next(iter(val_loader))
    mse_init = float(recon_mse(state.params, val_batch))

    t0 = time.time()
    done = 0
    while done < steps:
        for b in loader:
            rng, sub = jax.random.split(rng)
            gbatch = meshlib.shard_batch(mesh, b)
            state, metrics = step_fn(state, gbatch, sub)
            done += 1
            if done % log_every == 0:
                print(
                    f"[ae_pretrain] step {done}/{steps} "
                    f"loss={float(metrics['train/loss']):.5f} "
                    f"({time.time()-t0:.0f}s)"
                )
            if done >= steps:
                break

    mse_final = float(recon_mse(state.params, val_batch))
    # identity baseline: decoder that ignores flow and echoes the input
    img_v, tgt_v, _ = val_batch
    mse_identity = float(np.mean(np.square(np.asarray(img_v) - np.asarray(tgt_v))))

    # publish with the 'ae.' prefix the latent FlowDiffuser loader expects
    # (flow_diffuser.py init: load_params_from_run(cfg.ae, tmpl, prefix='ae'))
    ckpt_dir = Path(out_dir) / "checkpoints"
    mgr = CheckpointManager(ckpt_dir, every_n_train_steps=steps)
    mgr.maybe_save(
        done, {"params": {"ae": jax.device_get(state.params)}}, force=True
    )
    mgr.wait()
    mgr.close()
    publish_artifact(artifact, ckpt_dir)
    result = dict(
        recon_mse=mse_final, recon_mse_init=mse_init,
        identity_mse=mse_identity, steps=done, artifact=artifact,
        ckpt_dir=str(ckpt_dir), latent_dim=latent_dim,
    )
    print(f"[ae_pretrain] {result}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--latent-dim", type=int, default=16)
    ap.add_argument("--out-dir", default="outputs/ae_pretrain")
    ap.add_argument("--artifact", default="ae-artificial")
    args = ap.parse_args()
    train_ae(
        steps=args.steps, image_size=args.image_size, batch=args.batch,
        lr=args.lr, latent_dim=args.latent_dim, out_dir=args.out_dir,
        artifact=args.artifact,
    )


if __name__ == "__main__":
    main()


__all__ = ["train_ae"]
