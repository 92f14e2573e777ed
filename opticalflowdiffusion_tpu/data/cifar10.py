"""CIFAR-10 classification dataset (reference classification/cifar10.py).

Direct reader for the standard ``cifar-10-batches-py`` pickle layout (the
reference wraps torchvision with download=True; this environment has no
egress, so the data must be present under the root).  Training applies the
reference's augmentation (random crop with 4px pad + horizontal flip) and
per-channel normalization; emits (image NHWC float32, label int32).
"""

from __future__ import annotations

import pickle

import numpy as np

from .sintel import _data_root
from ..config import Config

MEAN = np.asarray([0.4914, 0.4822, 0.4465], np.float32)
STD = np.asarray([0.2023, 0.1994, 0.2010], np.float32)

classes = (
    "plane", "car", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
)


class CIFAR10Dataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        self.cfg = cfg
        self.train = split == "training"
        if split not in ("training", "test", "validation"):
            raise ValueError(f"split {split} not available for cifar10")
        base = _data_root(cfg, "cifar-10-batches-py")
        files = (
            [f"data_batch_{i}" for i in range(1, 6)] if self.train else ["test_batch"]
        )
        images, labels = [], []
        for f in files:
            p = base / f
            if not p.exists():
                raise FileNotFoundError(
                    f"CIFAR-10 batch {p} not found; set dataset.root or OFD_DATA_ROOT"
                )
            with open(p, "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            images.append(d[b"data"])
            labels += list(d[b"labels"])
        data = np.concatenate(images).reshape(-1, 3, 32, 32)
        self.images = data.transpose(0, 2, 3, 1).astype(np.float32) / 255.0
        self.labels = np.asarray(labels, np.int32)
        self._rng = np.random.default_rng(0)

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int):
        img = self.images[idx]
        if self.train:
            # RandomCrop(32, padding=4) + RandomHorizontalFlip
            padded = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="constant")
            y, x = self._rng.integers(0, 9, size=2)
            img = padded[y : y + 32, x : x + 32]
            if self._rng.random() < 0.5:
                img = img[:, ::-1]
        img = (img - MEAN) / STD
        return img.astype(np.float32), self.labels[idx]


__all__ = ["CIFAR10Dataset", "classes"]
