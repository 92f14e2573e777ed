"""MNIST dataset (the reference's datasets/classification/mnist.py is an
empty stub — this is a working IDX reader upgrade)."""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

from .sintel import _data_root
from ..config import Config


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


class MNISTDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        base = _data_root(cfg, "MNIST")
        prefix = "train" if split == "training" else "t10k"
        img_path = None
        for suffix in ("-images-idx3-ubyte", "-images.idx3-ubyte"):
            for ext in ("", ".gz"):
                p = base / f"{prefix}{suffix}{ext}"
                if p.exists():
                    img_path = p
                    lbl_path = base / f"{prefix}{suffix.replace('images', 'labels').replace('idx3', 'idx1')}{ext}"
                    break
            if img_path:
                break
        if img_path is None:
            raise FileNotFoundError(f"No MNIST idx files under {base}")
        self.images = _read_idx(img_path).astype(np.float32)[..., None] / 255.0
        self.labels = _read_idx(lbl_path).astype(np.int32)

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int):
        return self.images[idx], self.labels[idx]


__all__ = ["MNISTDataset"]
