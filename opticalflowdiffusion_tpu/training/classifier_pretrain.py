"""Train a classifier artifact whose penultimate features back the Frechet
metric (utils/fid.py::classifier_feature_fn).

The reference computes FID with pretrained InceptionV3
(reference denoising_diffusion.py:1072-1184).  Pretrained Inception weights
are not available here, so this script trains this framework's ResNet18
(models/resnet.py) and publishes the checkpoint to the local artifact store
under ``classifier-feat``.  Trains on CIFAR-10 when the data is present
(data/cifar10.py), otherwise on a deterministic synthetic
shape-x-color classification task so a trained (non-random) feature
extractor always exists.

Usage:
    python -m opticalflowdiffusion_tpu.training.classifier_pretrain \
        --steps 1000 --batch 128
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def synthetic_class_batch(rng: np.random.Generator, n: int, size: int = 32):
    """Labeled images: class = shape (box/cross) x color (5) = 10 classes.

    Shapes at random positions/scales over noise backgrounds — enough
    variation that the classifier must learn real shape/color features.
    """
    colors = np.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1]], np.float32
    )
    imgs = rng.normal(0.5, 0.08, size=(n, size, size, 3)).astype(np.float32)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    for i in range(n):
        shape, color = labels[i] // 5, colors[labels[i] % 5]
        s = int(rng.integers(6, 13))
        y, x = rng.integers(2, size - s - 2, size=2)
        if shape == 0:  # filled box
            imgs[i, y : y + s, x : x + s] = color
        else:  # cross
            c = s // 2
            imgs[i, y + c - 1 : y + c + 2, x : x + s] = color
            imgs[i, y : y + s, x + c - 1 : x + c + 2] = color
    return np.clip(imgs, 0, 1), labels


def train_classifier(
    steps: int = 1000,
    batch: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    out_dir: str = "outputs/classifier_pretrain",
    artifact: str = "classifier-feat",
    log_every: int = 100,
) -> dict:
    """Returns {'accuracy': eval acc, 'source': 'cifar10'|'synthetic', ...}."""
    import jax
    import jax.numpy as jnp

    from ..algorithms.classifier import Classifier
    from ..config import Config
    from ..utils.ckpt import CheckpointManager, publish_artifact

    cfg = Config(dict(arch="resnet18", num_class=10, in_channels=3, lr=lr))
    algo = Classifier(cfg)
    rng = np.random.default_rng(seed)

    cifar = None
    try:
        from ..data.cifar10 import CIFAR10Dataset

        cifar = CIFAR10Dataset(Config(dict()), "training")
        source = "cifar10"
    except FileNotFoundError:
        source = "synthetic"

    def next_batch():
        if cifar is not None:
            idx = rng.integers(0, len(cifar), size=batch)
            pairs = [cifar[int(i)] for i in idx]
            return (
                np.stack([p[0] for p in pairs]),
                np.asarray([p[1] for p in pairs], np.int32),
            )
        return synthetic_class_batch(rng, batch)

    key = jax.random.PRNGKey(seed)
    state = algo.init(key, next_batch())

    @jax.jit
    def step_fn(state, images, labels, key):
        (loss, aux), grads = jax.value_and_grad(algo.loss_fn, has_aux=True)(
            state.params, (images, labels), key
        )
        state = state.apply_gradients(grads)
        state = state.replace(
            params={**state.params, **aux["__mutable__"]}
        )
        return state, loss, aux["training/accuracy"]

    t0 = time.time()
    for done in range(1, steps + 1):
        images, labels = next_batch()
        key, sub = jax.random.split(key)
        state, loss, acc = step_fn(
            state, jnp.asarray(images), jnp.asarray(labels), sub
        )
        if done % log_every == 0:
            print(
                f"[classifier_pretrain] step {done}/{steps} "
                f"loss={float(loss):.4f} acc={float(acc):.3f} "
                f"({time.time()-t0:.0f}s)"
            )

    eval_images, eval_labels = next_batch()
    metrics, _ = jax.jit(algo.val_step)(
        state.params, (jnp.asarray(eval_images), jnp.asarray(eval_labels)), key
    )
    accuracy = float(metrics["validation/accuracy"])

    ckpt_dir = Path(out_dir) / "checkpoints"
    mgr = CheckpointManager(ckpt_dir, every_n_train_steps=steps)
    mgr.maybe_save(steps, jax.device_get(state), force=True)
    mgr.wait()
    mgr.close()
    publish_artifact(artifact, ckpt_dir)
    result = dict(
        accuracy=accuracy, source=source, steps=steps,
        artifact=artifact, ckpt_dir=str(ckpt_dir),
    )
    print(f"[classifier_pretrain] {result}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out-dir", default="outputs/classifier_pretrain")
    ap.add_argument("--artifact", default="classifier-feat")
    args = ap.parse_args()
    train_classifier(
        steps=args.steps, batch=args.batch, lr=args.lr,
        out_dir=args.out_dir, artifact=args.artifact,
    )


if __name__ == "__main__":
    main()


__all__ = ["train_classifier", "synthetic_class_batch"]
