"""MPI-Sintel 3-frame + GT .flo dataset (reference sintel.py:10-98).

Index construction follows the reference's Sintel.dat/Sintel_split.dat
protocol when those files exist, and otherwise scans the standard
``training/clean/<scene>/frame_%04d.png`` + ``training/flow/<scene>`` layout
(the intended behavior; the reference's __getitem__ ships hardcoded to one
debug path, sintel.py:73 — fixed here as SURVEY.md §7 directs).

Emits (frame1, frame2, frame3, flow) — frames ImageNet-normalized float32
NHWC like the reference transform (sintel.py:56-59), flow (dx, dy) resized
to image_size WITHOUT magnitude rescaling, matching the reference
(sintel.py:80-82 resizes the field only; note this differs from
flying_chairs.py:46 which does rescale — a reference inconsistency kept
as-is for parity).  Set ``cfg.normalize=false`` / ``cfg.scale_flow=true``
to opt out.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .flow_io import read_flo
from ..config import Config

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _data_root(cfg, default_subdir: str) -> Path:
    root = cfg.get("root") or os.environ.get("OFD_DATA_ROOT", "datasets")
    p = Path(root)
    return p if p.name == default_subdir else p / default_subdir


class SintelDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        self.cfg = cfg
        self.imsz = [int(x) for x in str(cfg.image_size).split(",")]
        self.split = split
        assert split in ("training", "validation"), "Split must be training or validation"
        self.normalize = bool(cfg.get("normalize", True))
        self.scale_flow = bool(cfg.get("scale_flow", False))

        base = _data_root(cfg, "MPI_Sintel")
        path_file = base / "Sintel.dat"
        split_file = base / "Sintel_split.dat"
        self.split_paths = []

        if path_file.exists() and split_file.exists():
            path_content = [l.strip().split() for l in open(path_file)]
            split_content = [l.strip().split() for l in open(split_file)]
            want = "1" if split == "training" else "2"
            for i, row in enumerate(path_content):
                if split_content[i][0] != want:
                    continue
                frame_num = int(row[2])
                flow_path = str(base) + "/" + (row[1][7:] % frame_num)
                png = row[0][7:]
                self.split_paths.append(
                    [
                        str(base) + "/" + (png % (frame_num - 1)),
                        str(base) + "/" + (png % frame_num),
                        str(base) + "/" + (png % (frame_num + 1)),
                        flow_path,
                    ]
                )
        else:
            # directory scan fallback: deterministic 90/10 scene-frame split
            clean = base / "training" / "clean"
            flow_dir = base / "training" / "flow"
            if clean.exists():
                for scene in sorted(os.listdir(clean)):
                    frames = sorted((clean / scene).glob("frame_*.png"))
                    for i in range(1, len(frames) - 1):
                        num = int(frames[i].stem.split("_")[1])
                        flo = flow_dir / scene / f"frame_{num:04d}.flo"
                        if not flo.exists():
                            continue
                        rec = [
                            str(frames[i - 1]), str(frames[i]),
                            str(frames[i + 1]), str(flo),
                        ]
                        is_val = (i % 10) == 0
                        if (split == "training") != is_val:
                            self.split_paths.append(rec)
        if not self.split_paths:
            raise FileNotFoundError(
                f"No Sintel data found under {base}; set dataset.root or OFD_DATA_ROOT"
            )

    def __len__(self) -> int:
        return len(self.split_paths)

    def _load_image(self, path) -> np.ndarray:
        import cv2

        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.imsz[0], self.imsz[1]))
        img = img.astype(np.float32) / 255.0
        if self.normalize:
            img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return img

    def __getitem__(self, idx: int):
        import cv2

        p1, p2, p3, pf = self.split_paths[idx]
        flow = read_flo(pf)
        h0, w0 = flow.shape[:2]
        flow = cv2.resize(flow, (self.imsz[0], self.imsz[1]))
        if self.scale_flow:
            flow = flow * np.asarray(
                [self.imsz[0] / w0, self.imsz[1] / h0], np.float32
            )
        return (
            self._load_image(p1),
            self._load_image(p2),
            self._load_image(p3),
            flow.astype(np.float32),
        )


__all__ = ["SintelDataset"]
