"""FlyingChairs frame-pair + .flo dataset (reference flying_chairs.py:14-51).

Direct reader for the FlyingChairs_release layout (the reference wraps
torchvision's loader): ``data/NNNNN_img{1,2}.ppm`` + ``NNNNN_flow.flo`` with
the official train/val split file when present.  Frames resized to
image_size; flow rescaled to resized pixel units (flying_chairs.py:46).
Emits (img1, img2, flow) float32 NHWC, flow (dx, dy).
"""

from __future__ import annotations

import numpy as np

from .flow_io import read_flo
from .sintel import _data_root
from ..config import Config


class FlyingChairsDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        self.cfg = cfg
        self.imsz = [int(x) for x in str(cfg.image_size).split(",")]
        split = "train" if split == "training" else "val"
        base = _data_root(cfg, "FlyingChairs_release")
        data = base / "data"
        if not data.exists():
            raise FileNotFoundError(
                f"No FlyingChairs data under {base}; set dataset.root or OFD_DATA_ROOT"
            )
        ids = sorted(p.stem.split("_")[0] for p in data.glob("*_flow.flo"))
        split_file = base.parent / "FlyingChairs_train_val.txt"
        if not split_file.exists():
            split_file = base / "FlyingChairs_train_val.txt"
        if split_file.exists():
            labels = [int(l.strip()) for l in open(split_file) if l.strip()]
            want = 1 if split == "train" else 2
            ids = [i for i, lab in zip(ids, labels) if lab == want]
        self.records = [
            (data / f"{i}_img1.ppm", data / f"{i}_img2.ppm", data / f"{i}_flow.flo")
            for i in ids
        ]

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int):
        import cv2

        p1, p2, pf = self.records[idx]
        img1 = cv2.cvtColor(cv2.imread(str(p1)), cv2.COLOR_BGR2RGB)
        img2 = cv2.cvtColor(cv2.imread(str(p2)), cv2.COLOR_BGR2RGB)
        flow = read_flo(pf)
        h0, w0 = img1.shape[:2]
        W, H = self.imsz[0], self.imsz[-1]
        img1 = cv2.resize(img1, (W, H)).astype(np.float32) / 255.0
        img2 = cv2.resize(img2, (W, H)).astype(np.float32) / 255.0
        flow = cv2.resize(flow, (W, H), interpolation=cv2.INTER_NEAREST)
        flow = flow * np.asarray([W / w0, H / h0], np.float32)
        return img1, img2, flow.astype(np.float32)


__all__ = ["FlyingChairsDataset"]
