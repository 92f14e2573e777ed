"""Big Buck Bunny video triplet dataset (reference buck_bunny_video.py:10-83).

Reads three fixed frames from an mp4 (frames 10, 10+skip, 10+2*skip — the
reference's degenerate debug behavior: every item identical) with ImageNet
normalization.  Emits (f1, f2, f3) float32 NHWC.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .sintel import IMAGENET_MEAN, IMAGENET_STD, _data_root
from ..config import Config


class BuckBunnyVideoDataset:
    def __init__(self, cfg: Config, split: str = "training", device=None):
        import cv2

        self.cfg = cfg
        self.imsz = [int(x) for x in str(cfg.image_size).split(",")]
        video_file = cfg.get("video_file")
        if not video_file:
            video_file = str(
                _data_root(cfg, "BigBuckBunnyVideo")
                / "big_buck_bunny_720p_5mb.mp4"
            )
        if not Path(video_file).exists():
            raise FileNotFoundError(
                f"video not found: {video_file}; set dataset.video_file"
            )
        self.frameskip = 1
        cap = cv2.VideoCapture(video_file)
        self.count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        frames = []
        for k in range(3):
            cap.set(cv2.CAP_PROP_POS_FRAMES, 10 + k * self.frameskip)
            ok, img = cap.read()
            if not ok:
                raise IOError(f"could not read frame {10 + k} from {video_file}")
            frames.append(img)
        cap.release()
        self.frames = [self._prep(f) for f in frames]

    def _prep(self, img) -> np.ndarray:
        import cv2

        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.imsz[0], self.imsz[1]))
        img = img.astype(np.float32) / 255.0
        return (img - IMAGENET_MEAN) / IMAGENET_STD

    def __len__(self) -> int:
        return self.count - 2 * self.frameskip

    def __getitem__(self, idx: int):
        return tuple(self.frames)


__all__ = ["BuckBunnyVideoDataset"]
