"""Train a flow-model artifact for the TaiChi GT-flow precompute.

The reference supervises TaiChi video prediction with flows from
torchvision's *pretrained* raft_large (reference taichi.py:97-123); those
weights are not redistributable here, so this script trains this
framework's own RAFT (models/raft.py) with supervised sequence loss on
ArtificialDataset's exact ground-truth flow and publishes the checkpoint to
the local artifact store under ``raft-artificial`` — the default
``dataset.flow_checkpoint`` of the TaiChi precompute (data/taichi.py).

Loss: the RAFT paper's exponentially weighted sequence L1,
sum_i gamma^(N-i-1) * |f_i - f_gt|_1.

Usage:
    python -m opticalflowdiffusion_tpu.training.flow_pretrain \
        --steps 1000 --image-size 64 --batch 16
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def train_flow_model(
    steps: int = 1000,
    image_size: int = 64,
    batch: int = 16,
    lr: float = 2e-4,
    iters: int = 6,
    corr_levels: int = 4,
    max_motion: int = 1,
    gamma: float = 0.8,
    seed: int = 0,
    out_dir: str = "outputs/flow_pretrain",
    artifact: str = "raft-artificial",
    dataset_size: int = 512,
    log_every: int = 50,
) -> dict:
    """Returns {'epe': trained EPE, 'epe_init': untrained EPE, ...}."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..config import Config
    from ..data.artificial import ArtificialDataset
    from ..data.loader import DataLoader
    from ..models.raft import RAFT
    from ..parallel.train import TrainState
    from ..utils.ckpt import CheckpointManager, publish_artifact

    ds = ArtificialDataset(
        Config(dict(image_size=image_size, size=dataset_size, shape="boxes",
                    bg="checkers", seed=seed, max_motion=max_motion))
    )
    loader = DataLoader(ds, batch_size=batch, shuffle=True, seed=seed)

    model = RAFT(iters=iters, corr_levels=corr_levels)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, image_size, image_size, 3))
    params = jax.jit(model.init)(key, dummy, dummy)["params"]

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    state = TrainState.create(params, tx)

    def loss_fn(params, first, second, flow_gt):
        preds = model.apply({"params": params}, first, second)
        n = len(preds)
        loss = 0.0
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * jnp.mean(jnp.abs(p - flow_gt))
        epe = jnp.mean(
            jnp.linalg.norm(preds[-1] - flow_gt, axis=-1)
        )
        return loss, epe

    @jax.jit
    def step_fn(state, first, second, flow_gt):
        (loss, epe), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, first, second, flow_gt
        )
        return state.apply_gradients(grads), loss, epe

    @jax.jit
    def eval_epe(params, first, second, flow_gt):
        preds = model.apply({"params": params}, first, second)
        return jnp.mean(jnp.linalg.norm(preds[-1] - flow_gt, axis=-1))

    eval_batch = next(iter(loader))
    ef, es, eflow = (jnp.asarray(x) for x in eval_batch)
    epe_init = float(eval_epe(state.params, ef, es, eflow))

    t0 = time.time()
    done = 0
    while done < steps:
        for b in loader:
            first, second, flow_gt = (jnp.asarray(x) for x in b)
            state, loss, epe = step_fn(state, first, second, flow_gt)
            done += 1
            if done % log_every == 0:
                print(
                    f"[flow_pretrain] step {done}/{steps} "
                    f"loss={float(loss):.4f} epe={float(epe):.4f} "
                    f"({time.time()-t0:.0f}s)"
                )
            if done >= steps:
                break

    epe_final = float(eval_epe(state.params, ef, es, eflow))
    zero_epe = float(jnp.mean(jnp.linalg.norm(eflow, axis=-1)))
    # moving-pixel split: the global mean is dominated by the static
    # background (zero-flow EPE ~0.1 px), so the load-bearing quality
    # number is EPE restricted to pixels that actually move
    pred = model.apply({"params": state.params}, ef, es)[-1]
    err = np.asarray(jnp.linalg.norm(pred - eflow, axis=-1))
    gmag = np.asarray(jnp.linalg.norm(eflow, axis=-1))
    moving = gmag > 0.5
    epe_moving = float(err[moving].mean()) if moving.any() else float("nan")
    zero_epe_moving = (
        float(gmag[moving].mean()) if moving.any() else float("nan")
    )

    ckpt_dir = Path(out_dir) / "checkpoints"
    mgr = CheckpointManager(ckpt_dir, every_n_train_steps=steps)
    mgr.maybe_save(done, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()
    publish_artifact(artifact, ckpt_dir)
    result = dict(
        epe=epe_final, epe_init=epe_init, zero_flow_epe=zero_epe,
        epe_moving=epe_moving, zero_flow_epe_moving=zero_epe_moving,
        steps=done, artifact=artifact, ckpt_dir=str(ckpt_dir),
    )
    print(f"[flow_pretrain] {result}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--corr-levels", type=int, default=4)
    ap.add_argument("--max-motion", type=int, default=1)
    ap.add_argument("--out-dir", default="outputs/flow_pretrain")
    ap.add_argument("--artifact", default="raft-artificial")
    args = ap.parse_args()
    train_flow_model(
        steps=args.steps, image_size=args.image_size, batch=args.batch,
        lr=args.lr, iters=args.iters, corr_levels=args.corr_levels,
        max_motion=args.max_motion, out_dir=args.out_dir,
        artifact=args.artifact,
    )


if __name__ == "__main__":
    main()


__all__ = ["train_flow_model"]
